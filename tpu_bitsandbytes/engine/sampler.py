"""Token samplers for the decode engine: greedy, temperature, top-k, top-p."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

# Eager ops are expensive on remote/tunneled backends — keep sampling jitted.
greedy = jax.jit(lambda logits: jnp.argmax(logits, axis=-1).astype(jnp.int32))


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0      # 0 -> greedy
    top_k: int = 0                # 0 -> disabled
    top_p: float = 1.0            # 1 -> disabled
    max_new_tokens: int = 128
    eos_token_id: Optional[int] = None


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SamplingArrays:
    """Per-slot sampling parameters as device arrays [B].

    Lets one jitted sampling op serve a batch of requests with different
    temperature/top-k/top-p/eos — no host round-trip per slot (the reference
    has no sampler at all; demo/chat.py leans on HF generate).
    """

    temperature: jnp.ndarray   # f32 [B]; <=0 -> greedy
    top_k: jnp.ndarray         # i32 [B]; 0 -> disabled
    top_p: jnp.ndarray         # f32 [B]; 1 -> disabled
    eos_id: jnp.ndarray        # i32 [B]; -1 -> none

    def tree_flatten(self):
        return ((self.temperature, self.top_k, self.top_p, self.eos_id), None)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @classmethod
    def build(cls, per_slot, max_batch: int) -> "SamplingArrays":
        """per_slot: dict slot -> SamplingParams (missing slots get greedy)."""
        import numpy as np
        t = np.zeros((max_batch,), np.float32)
        k = np.zeros((max_batch,), np.int32)
        p = np.ones((max_batch,), np.float32)
        e = np.full((max_batch,), -1, np.int32)
        for slot, sp in per_slot.items():
            t[slot] = sp.temperature
            k[slot] = sp.top_k
            p[slot] = sp.top_p
            e[slot] = -1 if sp.eos_token_id is None else sp.eos_token_id
        return cls(jnp.asarray(t), jnp.asarray(k), jnp.asarray(p),
                   jnp.asarray(e))


def sample_batched(logits: jnp.ndarray, key: jax.Array,
                   s: SamplingArrays) -> jnp.ndarray:
    """logits [B, V] -> tokens [B], per-row params. Traced (no jit wrapper):
    called from inside the engine's jitted decode chunk."""
    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    greedy_toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(s.temperature, 1e-6)[:, None]
    # top-k (per-row k; 0 disables)
    sorted_l = jnp.sort(scaled, axis=-1)[:, ::-1]
    k = jnp.where(s.top_k > 0, s.top_k, v)[:, None]
    kth = jnp.take_along_axis(sorted_l, jnp.clip(k - 1, 0, v - 1), axis=-1)
    masked = jnp.where(scaled < kth, -jnp.inf, scaled)
    # top-p over the top-k-masked distribution
    sorted_m = jnp.sort(masked, axis=-1)[:, ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_m, axis=-1), axis=-1)
    cutoff_idx = jnp.sum(cum < s.top_p[:, None], axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_m, jnp.clip(cutoff_idx, 0, v - 1),
                                 axis=-1)
    masked = jnp.where(masked < cutoff, -jnp.inf, masked)
    sampled = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    return jnp.where(s.temperature <= 0.0, greedy_toks, sampled)


@partial(jax.jit, static_argnames=("params",))
def sample(logits: jnp.ndarray, key: jax.Array,
           params: SamplingParams) -> jnp.ndarray:
    """logits [B, V] -> token ids [B]."""
    if params.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / params.temperature
    if params.top_k > 0:
        top = jax.lax.top_k(logits, params.top_k)[0][:, -1:]
        logits = jnp.where(logits < top, -jnp.inf, logits)
    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < params.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
