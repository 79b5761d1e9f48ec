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
