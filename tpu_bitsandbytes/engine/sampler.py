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
    # HF-style repetition penalty over prompt+generated history: positive
    # seen-token logits divided by the penalty, negative multiplied. 1.0
    # disables. Applies to greedy decoding too (it reshapes the argmax).
    repetition_penalty: float = 1.0
    # stop sequences as tuples of token ids; generation stops (host-side,
    # at chunk-collection granularity) once the output ends with any of
    # them. The stop tokens remain in the output.
    stop: tuple = ()
    # collect per-token model logprobs (log-softmax of the raw logits at
    # the emitted token) into Request.logprobs
    logprobs: bool = False


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
    # f32 [B]; applied only when the caller supplies a seen-token mask
    rep_pen: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return ((self.temperature, self.top_k, self.top_p, self.eos_id,
                 self.rep_pen), None)

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
        r = np.ones((max_batch,), np.float32)
        for slot, sp in per_slot.items():
            t[slot] = sp.temperature
            k[slot] = sp.top_k
            p[slot] = sp.top_p
            e[slot] = -1 if sp.eos_token_id is None else sp.eos_token_id
            r[slot] = sp.repetition_penalty
        return cls(jnp.asarray(t), jnp.asarray(k), jnp.asarray(p),
                   jnp.asarray(e), jnp.asarray(r))


def apply_repetition_penalty(logits, seen_mask, rep_pen):
    """HF semantics: seen positive logits / pen, seen negative * pen.
    logits [B, V] f32, seen_mask [B, V] bool, rep_pen [B] f32."""
    pen = rep_pen[:, None]
    adj = jnp.where(logits > 0, logits / pen, logits * pen)
    return jnp.where(seen_mask, adj, logits)


def filter_logits(logits: jnp.ndarray, temperature, top_k,
                  top_p) -> jnp.ndarray:
    """Per-row temperature/top-k/top-p processing of logits [N, V] ->
    processed logits (scaled; filtered entries -inf). temperature is
    clamped at 1e-6 — greedy rows should bypass via argmax instead."""
    v = logits.shape[-1]
    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    # top-k (per-row k; 0 disables)
    sorted_l = jnp.sort(scaled, axis=-1)[:, ::-1]
    k = jnp.where(top_k > 0, top_k, v)[:, None]
    kth = jnp.take_along_axis(sorted_l, jnp.clip(k - 1, 0, v - 1), axis=-1)
    masked = jnp.where(scaled < kth, -jnp.inf, scaled)
    # top-p over the top-k-masked distribution
    sorted_m = jnp.sort(masked, axis=-1)[:, ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_m, axis=-1), axis=-1)
    cutoff_idx = jnp.sum(cum < top_p[:, None], axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_m, jnp.clip(cutoff_idx, 0, v - 1),
                                 axis=-1)
    return jnp.where(masked < cutoff, -jnp.inf, masked)


def sample_batched(logits: jnp.ndarray, key: jax.Array,
                   s: SamplingArrays, seen_mask=None) -> jnp.ndarray:
    """logits [B, V] -> tokens [B], per-row params. Traced (no jit wrapper):
    called from inside the engine's jitted decode chunk. ``seen_mask``
    [B, V] enables the repetition penalty (affects greedy rows too)."""
    logits = logits.astype(jnp.float32)
    if seen_mask is not None and s.rep_pen is not None:
        logits = apply_repetition_penalty(logits, seen_mask, s.rep_pen)
    greedy_toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    masked = filter_logits(logits, s.temperature, s.top_k, s.top_p)
    sampled = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    return jnp.where(s.temperature <= 0.0, greedy_toks, sampled)


@partial(jax.jit, static_argnames=("params",))
def sample(logits: jnp.ndarray, key: jax.Array,
           params: SamplingParams, seen_mask=None) -> jnp.ndarray:
    """logits [B, V] -> token ids [B]. ``seen_mask`` [B, V] applies the
    repetition penalty (history tokens) before everything else."""
    logits = logits.astype(jnp.float32)
    if seen_mask is not None and params.repetition_penalty != 1.0:
        pen = jnp.full((logits.shape[0],), params.repetition_penalty,
                       jnp.float32)
        logits = apply_repetition_penalty(logits, seen_mask, pen)
    if params.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / params.temperature
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
