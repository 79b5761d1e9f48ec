"""8-bit optimizer-state codecs.

TPU rebuild of the reference codecs (mps_bitsandbytes/optim/adam8bit.py:17-132):

* signed int8 blockwise (block 256) for momentum-like states;
* unsigned uint8 with **sqrt dynamic-range compression** for ``exp_avg_sq``
  (sqrt at :104-107, square-undo at :128-130) — preserves the small values
  that matter in Adam's denominator.

Pure jnp, jit-friendly; these are also the oracles for the fused Pallas
optimizer kernels.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_state", "dequantize_state",
    "quantize_state_unsigned", "dequantize_state_unsigned",
]


def _pad_blocks(flat: jnp.ndarray, block_size: int) -> jnp.ndarray:
    numel = flat.size
    padded = ((numel + block_size - 1) // block_size) * block_size
    if padded > numel:
        flat = jnp.pad(flat, (0, padded - numel))
    return flat.reshape(-1, block_size)


@partial(jax.jit, static_argnames=("block_size",))
def quantize_state(state: jnp.ndarray, block_size: int = 256
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Signed int8 blockwise quantization (reference :17-38)."""
    orig_shape = state.shape
    blocks = _pad_blocks(state.reshape(-1).astype(jnp.float32), block_size)
    absmax = jnp.clip(jnp.max(jnp.abs(blocks), axis=1), min=1e-8)
    q = jnp.clip(jnp.round(blocks / absmax[:, None] * 127.0), -127, 127
                 ).astype(jnp.int8)
    return q.reshape(-1)[: state.size].reshape(orig_shape), absmax


@partial(jax.jit, static_argnames=("block_size", "dtype"))
def dequantize_state(state_int8: jnp.ndarray, absmax: jnp.ndarray,
                     block_size: int = 256, dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of :func:`quantize_state` (reference :41-57)."""
    orig_shape = state_int8.shape
    blocks = _pad_blocks(state_int8.reshape(-1).astype(jnp.float32), block_size)
    deq = (blocks / 127.0) * absmax[:, None]
    return deq.reshape(-1)[: state_int8.size].reshape(orig_shape).astype(dtype)


def quantize_state_unsigned(state: jnp.ndarray, block_size: int = 256,
                            warn_on_negative: bool = False
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unsigned uint8 + sqrt compression for non-negative states (:60-117).

    ``warn_on_negative`` mirrors the reference diagnostic (:77-88): negative
    inputs are clamped to 0 either way.
    """
    if warn_on_negative:
        import warnings
        neg = int(jnp.sum(jnp.asarray(state) < 0))
        if neg > 0:
            warnings.warn(
                f"quantize_state_unsigned: {neg} negative values clamped to "
                f"0. This may indicate an issue with the optimizer state.",
                UserWarning, stacklevel=2)
    return _quantize_state_unsigned_jit(state, block_size)


@partial(jax.jit, static_argnames=("block_size",))
def _quantize_state_unsigned_jit(state: jnp.ndarray, block_size: int = 256
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    orig_shape = state.shape
    flat = jnp.clip(state.reshape(-1).astype(jnp.float32), min=0)
    blocks = _pad_blocks(flat, block_size)
    block_max = jnp.clip(jnp.max(blocks, axis=1), min=1e-12)
    normalized = blocks / block_max[:, None]
    q = jnp.clip(jnp.round(jnp.sqrt(normalized) * 255.0), 0, 255).astype(jnp.uint8)
    return q.reshape(-1)[: state.size].reshape(orig_shape), block_max


@partial(jax.jit, static_argnames=("block_size", "dtype"))
def dequantize_state_unsigned(state_uint8: jnp.ndarray, block_max: jnp.ndarray,
                              block_size: int = 256, dtype=jnp.float32
                              ) -> jnp.ndarray:
    """Inverse of :func:`quantize_state_unsigned` (reference :120-138)."""
    orig_shape = state_uint8.shape
    blocks = _pad_blocks(state_uint8.reshape(-1).astype(jnp.float32), block_size)
    s = blocks / 255.0
    deq = (s * s) * block_max[:, None]
    return deq.reshape(-1)[: state_uint8.size].reshape(orig_shape).astype(dtype)
