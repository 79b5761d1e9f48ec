"""TPU BitsAndBytes — Functional API (L2).

bitsandbytes-compatible quantization primitives, built TPU-native on JAX.
All functions here are pure (no tensor mutation), jit-traceable with static
shapes, and serve double duty as the *reference oracles* for the fused Pallas
kernels in ``tpu_bitsandbytes.ops`` (differential-testing pattern).

API surface and semantics mirror the reference implementation
(``mps_bitsandbytes/functional.py`` in mps-bitsandbytes): NF4/FP4 blockwise
4-bit quantization with row-wise 2D layout (functional.py:163-462), blockwise
INT8 (:469-600), row-wise INT8 (:607-636), FP8-E4M3 (:643-673, 1044-1216),
LLM.int8-style double_quant / col+row INT8 (:814-945), and COO sparse ops
(:952-1037). Differences from the reference are deliberate TPU-first choices:

* arrays are immutable — ``out=`` params are accepted for API compatibility
  but a new array is always returned;
* default floating dtype is ``bfloat16`` (TPU-native) rather than float16;
* the fused matmul path dispatches to Pallas TPU kernels instead of Metal.
"""

from __future__ import annotations

import dataclasses
import warnings
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "NF4_CODEBOOK",
    "FP4_CODEBOOK",
    "create_normal_map",
    "create_fp4_map",
    "QuantState",
    "quantize_4bit",
    "dequantize_4bit",
    "quantize_nf4",
    "dequantize_nf4",
    "quantize_fp4",
    "dequantize_fp4",
    "matmul_4bit",
    "matmul_nf4",
    "matmul_fp4",
    "quantize_blockwise",
    "dequantize_blockwise",
    "quantize_rowwise",
    "dequantize_rowwise",
    "matmul_int8",
    "quantize_fp8_e4m3",
    "dequantize_fp8_e4m3",
    "matmul_fp8_e4m3",
    "quantize_fp8_e5m2",
    "dequantize_fp8_e5m2",
    "double_quant",
    "dequant_absmax",
    "quantize_colrow",
    "dequantize_colrow",
    "matmul_colrow",
    "spmm_coo",
    "spmm_coo_int8",
    "sparse_coo_from_dense",
    "quantize_sparse_coo",
]

# =============================================================================
# Codebooks
# =============================================================================

# NF4: 16 quantiles of N(0,1), normalized to [-1, 1].  Values must match the
# reference bit-for-bit (mps_bitsandbytes/functional.py:21-26) so that packed
# checkpoints round-trip identically.
_NF4_VALUES = (
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
)

# FP4: 1-3-0 sign/exp/mantissa-style ladder (functional.py:29-32).
_FP4_VALUES = (
    0.0, 0.0625, 0.125, 0.25, 0.375, 0.5, 0.75, 1.0,
    -0.0, -0.0625, -0.125, -0.25, -0.375, -0.5, -0.75, -1.0,
)

# numpy copies for host-side/static computation.
NF4_CODEBOOK_NP = np.asarray(_NF4_VALUES, dtype=np.float32)
FP4_CODEBOOK_NP = np.asarray(_FP4_VALUES, dtype=np.float32)


def __getattr__(name):
    # NF4_CODEBOOK / FP4_CODEBOOK are *device* arrays in the public API, but
    # materializing them at import time would initialize the XLA backend —
    # which breaks jax.distributed.initialize() in multi-host processes
    # (it must run before ANY backend-touching call;
    # scripts/multihost_smoke.py). PEP 562 lazy module attributes defer the
    # device transfer to first access.
    if name == "NF4_CODEBOOK":
        return jnp.asarray(NF4_CODEBOOK_NP)
    if name == "FP4_CODEBOOK":
        return jnp.asarray(FP4_CODEBOOK_NP)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def create_normal_map(offset: float = 0.9677083, use_extra_value: bool = True):
    """Create the NF4 codebook (bitsandbytes-compat shim, functional.py:35-38)."""
    return jnp.asarray(NF4_CODEBOOK_NP)


def create_fp4_map(signed: bool = True):
    """Create the FP4 codebook (bitsandbytes-compat shim, functional.py:41-42)."""
    return jnp.asarray(FP4_CODEBOOK_NP)


def _codebook_for(quant_type: str) -> np.ndarray:
    """Codebook for use inside jitted functions.

    Returns the numpy copy on purpose: a module-level *device* array closed
    over by a jitted function becomes an MLIR constant whose lowering pulls
    the value device->host (`array._value`) — on the tunneled axon backend
    that fetch can deadlock against in-flight async dispatches. A numpy
    constant embeds straight from host memory with no device round-trip.
    """
    return NF4_CODEBOOK_NP if quant_type == "nf4" else FP4_CODEBOOK_NP


# =============================================================================
# Native-kernel dispatch bookkeeping (parity with functional.py:45-83)
# =============================================================================

_native_fallback_count = 0
_native_fallback_warned = False
_FUSED_ENABLED = True


class disable_fused_kernels:
    """Context manager forcing the XLA (GSPMD-partitionable) matmul path.

    Pallas custom calls cannot be auto-partitioned by GSPMD; computations
    that jit over sharded quantized params outside shard_map (e.g. the
    engine's tensor-parallel prefill) disable the fused path for their
    trace."""

    def __enter__(self):
        global _FUSED_ENABLED
        self._prev = _FUSED_ENABLED
        _FUSED_ENABLED = False
        return self

    def __exit__(self, *exc):
        global _FUSED_ENABLED
        _FUSED_ENABLED = self._prev
        return False


def _default_backend() -> str:
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover
        return "cpu"


def has_fused_kernels() -> bool:
    """True when the Pallas fused kernels can run compiled (TPU backend).

    ``TBNB_FUSED_INTERPRET=1`` additionally enables them OFF-TPU in Pallas
    interpret mode — slow, but it lets CPU-mesh validation (the multichip
    dryrun, sharding tests) drive the GSPMD-partitioned fused path for real
    instead of the unfused fallback."""
    if not _FUSED_ENABLED:
        return False
    import os
    return (_default_backend() == "tpu"
            or os.environ.get("TBNB_FUSED_INTERPRET") == "1")


def _warn_native_fallback(operation: str) -> None:
    """Count + warn-once when an op falls back to the unfused XLA path.

    Mirrors the reference's fallback reporter (functional.py:59-73).
    """
    global _native_fallback_count, _native_fallback_warned
    _native_fallback_count += 1
    if not _native_fallback_warned:
        warnings.warn(
            f"tpu-bitsandbytes: fused Pallas kernel unavailable for {operation}, "
            f"using unfused XLA fallback (materializes dequantized weights).",
            UserWarning,
            stacklevel=3,
        )
        _native_fallback_warned = True


# =============================================================================
# QuantState — pytree dataclass (parity with functional.py:90-156)
# =============================================================================


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantState:
    """Quantization state required to dequantize a packed tensor.

    A registered JAX pytree: ``absmax``/``code``/``offset``/``state2`` are
    leaves (flow through jit/pjit/shard_map/grad); ``shape``, ``blocksize``,
    ``quant_type`` and ``dtype`` are static aux data. Mirrors the reference
    ``QuantState`` (mps_bitsandbytes/functional.py:90-156).
    """

    absmax: jnp.ndarray
    shape: Tuple[int, ...]
    code: Optional[jnp.ndarray] = None
    blocksize: int = 64
    quant_type: str = "nf4"
    dtype: Any = jnp.bfloat16
    offset: Optional[jnp.ndarray] = None
    state2: Optional["QuantState"] = None

    def __post_init__(self):
        self.shape = tuple(int(s) for s in self.shape)
        self.dtype = jnp.dtype(self.dtype)
        if self.code is None and self.quant_type in ("nf4", "fp4"):
            self.code = _codebook_for(self.quant_type)

    # --- pytree protocol -------------------------------------------------
    # ``code`` is NOT a leaf: it is derived from quant_type (a fixed host
    # codebook), so flowing it through jit would re-upload one small array
    # per quantized tensor on every dispatch — pure overhead on a tunneled
    # backend. Kernels take it as an in-trace numpy constant instead.
    def tree_flatten(self):
        leaves = (self.absmax, self.offset, self.state2)
        aux = (self.shape, self.blocksize, self.quant_type, self.dtype)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        absmax, offset, state2 = leaves
        shape, blocksize, quant_type, dtype = aux
        obj = cls.__new__(cls)
        obj.absmax = absmax
        obj.code = (_codebook_for(quant_type)
                    if quant_type in ("nf4", "fp4") else None)
        obj.offset = offset
        obj.state2 = state2
        obj.shape = shape
        obj.blocksize = blocksize
        obj.quant_type = quant_type
        obj.dtype = dtype
        return obj

    # --- conveniences ----------------------------------------------------
    def to(self, device) -> "QuantState":
        """Return a copy with all leaves placed on ``device`` (functional.py:120-129)."""
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, device), self)

    def as_dict(self, packed: bool = False) -> dict:
        """Serializable dict (functional.py:131-141)."""
        return {
            "absmax": self.absmax,
            "shape": tuple(self.shape),
            "blocksize": self.blocksize,
            "quant_type": self.quant_type,
            "dtype": jnp.dtype(self.dtype).name,
            "state2": self.state2.as_dict() if self.state2 is not None else None,
        }

    @classmethod
    def from_dict(cls, state_dict: dict, device=None) -> "QuantState":
        """Inverse of :meth:`as_dict` (functional.py:143-156)."""
        state2 = None
        if state_dict.get("state2") is not None:
            state2 = cls.from_dict(state_dict["state2"], device)
        absmax = jnp.asarray(state_dict["absmax"])
        if device is not None:
            absmax = jax.device_put(absmax, device)
        return cls(
            absmax=absmax,
            shape=tuple(state_dict["shape"]),
            blocksize=int(state_dict.get("blocksize", 64)),
            quant_type=state_dict.get("quant_type", "nf4"),
            dtype=jnp.dtype(state_dict.get("dtype", "bfloat16")),
            state2=state2,
        )

    # Derived geometry (static — usable at trace time).
    @property
    def k_padded(self) -> int:
        """Padded inner dim for 2D states (quantize_4bit padding rule)."""
        if len(self.shape) != 2:
            raise ValueError("k_padded only defined for 2D quant states")
        return _pad_k(self.shape[1], self.blocksize)

    @property
    def blocks_per_row(self) -> int:
        return self.k_padded // self.blocksize


# =============================================================================
# Shared helpers
# =============================================================================


def _pad_k(k: int, blocksize: int) -> int:
    """Padding rule for the 2D row-wise layout (functional.py:218-222).

    K is padded up to a multiple of ``blocksize``; if the result is odd
    (only possible for blocksize==1), one more block is added so nibble
    packing always has an even count.
    """
    k_padded = ((k + blocksize - 1) // blocksize) * blocksize
    if k_padded % 2 != 0:
        k_padded += blocksize
    return k_padded


def _pad_flat(numel: int, blocksize: int) -> int:
    padded = ((numel + blocksize - 1) // blocksize) * blocksize
    if padded % 2 != 0:
        padded += blocksize
    return padded


def _validate_blocksize(blocksize: int, power_of_two: bool = True) -> None:
    if blocksize <= 0:
        raise ValueError(f"blocksize must be positive, got {blocksize}")
    if blocksize > 65536:
        raise ValueError(f"blocksize too large ({blocksize}), max is 65536")
    if power_of_two and (blocksize & (blocksize - 1)) != 0:
        raise ValueError(f"blocksize must be a power of 2, got {blocksize}")


_MAX_SAFE_NUMEL = 2**31 - 1


def _validate_numel(a: jnp.ndarray) -> None:
    if a.size > _MAX_SAFE_NUMEL:
        raise ValueError(
            f"Tensor too large ({a.size} elements), max is {_MAX_SAFE_NUMEL}"
        )


def nearest_code(x_norm: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Nearest-codebook index with first-occurrence tie-breaking.

    Memory-lean replacement for the reference's O(16·numel) broadcast argmin
    (functional.py:242-243): a running min over the 16 entries, which XLA
    fuses into one elementwise pass.
    """
    x = x_norm.astype(jnp.float32)
    best_idx = jnp.zeros(x.shape, dtype=jnp.uint8)
    best_diff = jnp.abs(x - codebook[0])
    for i in range(1, codebook.shape[0]):
        diff = jnp.abs(x - codebook[i])
        take = diff < best_diff
        best_idx = jnp.where(take, jnp.uint8(i), best_idx)
        best_diff = jnp.where(take, diff, best_diff)
    return best_idx


def pack_nibbles(idx: jnp.ndarray) -> jnp.ndarray:
    """Pack adjacent 4-bit codes along the last axis: ``lo | hi<<4``.

    Layout identical to the reference (functional.py:251): element ``2j`` in
    the low nibble, ``2j+1`` in the high nibble of byte ``j``.
    """
    if idx.shape[-1] % 2 != 0:
        raise ValueError("last axis must be even to pack nibbles")
    pairs = idx.reshape(*idx.shape[:-1], idx.shape[-1] // 2, 2).astype(jnp.uint8)
    return pairs[..., 0] | (pairs[..., 1] << 4)


def unpack_nibbles(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_nibbles` — interleave lo/hi along last axis."""
    lo = packed & jnp.uint8(0x0F)
    hi = (packed >> 4) & jnp.uint8(0x0F)
    stacked = jnp.stack([lo, hi], axis=-1)
    return stacked.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


def codes_to_values(idx: jnp.ndarray, quant_type: str) -> jnp.ndarray:
    """Decode 4-bit code indices to f32 codebook values (16-way select).

    NOT ``jnp.take`` from the 16-entry table: XLA lowers a tiny-table
    gather with a large index array to a catastrophic per-element path on
    TPU — measured 1045 us for a [64, 2048] decode at the Gemma-vocab
    embedding (kbench/embedding_probe round 3) and the 12 GB/s of the
    round-2 "XLA dequant+dot fusion" row (KERNEL_NOTES). The compare+select
    chain vectorizes on the VPU and fuses into neighbors.
    """
    book = _codebook_for(quant_type)
    out = jnp.full(idx.shape, np.float32(book[0]), jnp.float32)
    for i in range(1, 16):
        out = jnp.where(idx == i, np.float32(book[i]), out)
    return out


# =============================================================================
# 4-bit quantization (parity with functional.py:163-462)
# =============================================================================


@partial(jax.jit, static_argnames=("blocksize", "quant_type"))
def _quantize_4bit_2d(a, blocksize: int, quant_type: str):
    n, k = a.shape
    k_padded = _pad_k(k, blocksize)
    a = a.astype(jnp.float32)
    a_padded = jnp.zeros((n, k_padded), dtype=jnp.float32).at[:, :k].set(a)
    nblocks = k_padded // blocksize
    blocked = a_padded.reshape(n, nblocks, blocksize)
    absmax = jnp.clip(jnp.max(jnp.abs(blocked), axis=2), min=1e-8)
    codebook = _codebook_for(quant_type)
    a_norm = blocked / absmax[:, :, None]
    idx = nearest_code(a_norm, codebook)
    packed = pack_nibbles(idx.reshape(n, k_padded))
    return packed.reshape(-1), absmax.reshape(-1)


@partial(jax.jit, static_argnames=("blocksize", "quant_type"))
def _quantize_4bit_flat(a, blocksize: int, quant_type: str):
    flat = a.reshape(-1).astype(jnp.float32)
    padded_numel = _pad_flat(flat.size, blocksize)
    a_flat = jnp.zeros((padded_numel,), dtype=jnp.float32).at[: flat.size].set(flat)
    nblocks = padded_numel // blocksize
    blocked = a_flat.reshape(nblocks, blocksize)
    absmax = jnp.clip(jnp.max(jnp.abs(blocked), axis=1), min=1e-8)
    codebook = _codebook_for(quant_type)
    a_norm = blocked / absmax[:, None]
    idx = nearest_code(a_norm, codebook)
    packed = pack_nibbles(idx.reshape(1, padded_numel)).reshape(-1)
    return packed, absmax


def quantize_4bit(
    A: jnp.ndarray,
    absmax: Optional[jnp.ndarray] = None,
    out: Optional[jnp.ndarray] = None,
    blocksize: int = 64,
    compress_statistics: bool = False,
    quant_type: str = "nf4",
    quant_storage=jnp.uint8,
) -> Tuple[jnp.ndarray, QuantState]:
    """Quantize to packed 4-bit NF4/FP4 (reference: functional.py:163-303).

    2D inputs use the row-wise blockwise layout (each row quantized with its
    own absmax blocks, K padded per :func:`_pad_k`); other ranks use the flat
    layout. Returns ``(packed_uint8_flat, QuantState)``.

    ``absmax``/``out`` are accepted for bitsandbytes API compatibility:
    ``absmax`` (if given) overrides the computed statistics; ``out`` is
    ignored (JAX arrays are immutable) and a new array is returned.
    """
    if quant_type not in ("nf4", "fp4"):
        raise ValueError(f"quant_type must be 'nf4' or 'fp4', got {quant_type}")
    _validate_blocksize(blocksize, power_of_two=True)
    A = jnp.asarray(A)
    _validate_numel(A)
    orig_shape = tuple(A.shape)
    orig_dtype = A.dtype

    if absmax is not None:
        # Respect caller-provided statistics (rare; keeps bnb API parity).
        packed, absmax = _quantize_4bit_with_absmax(A, absmax, blocksize,
                                                    quant_type)
    elif A.ndim == 2:
        packed, absmax = _quantize_4bit_2d(A, blocksize, quant_type)
    else:
        packed, absmax = _quantize_4bit_flat(A, blocksize, quant_type)

    state2 = None
    if compress_statistics:
        absmax_q, state2 = quantize_blockwise(absmax, blocksize=256)
        absmax = absmax_q

    state = QuantState(
        absmax=absmax,
        shape=orig_shape,
        blocksize=blocksize,
        quant_type=quant_type,
        dtype=orig_dtype,
        state2=state2,
    )
    if quant_storage != jnp.uint8:
        packed = packed.view(quant_storage) if hasattr(packed, "view") else packed
    return packed, state


def _quantize_4bit_with_absmax(a, absmax, blocksize, quant_type):
    """Quantization against caller-provided absmax statistics."""
    codebook = _codebook_for(quant_type)
    if a.ndim == 2:
        n, k = a.shape
        k_padded = _pad_k(k, blocksize)
        a_p = jnp.zeros((n, k_padded), jnp.float32).at[:, :k].set(a.astype(jnp.float32))
        nblocks = k_padded // blocksize
        am = absmax.reshape(n, nblocks).astype(jnp.float32)
        idx = nearest_code(a_p.reshape(n, nblocks, blocksize) / am[:, :, None], codebook)
        return pack_nibbles(idx.reshape(n, k_padded)).reshape(-1), am.reshape(-1)
    flat = a.reshape(-1).astype(jnp.float32)
    padded = _pad_flat(flat.size, blocksize)
    a_p = jnp.zeros((padded,), jnp.float32).at[: flat.size].set(flat)
    nblocks = padded // blocksize
    am = absmax.reshape(nblocks).astype(jnp.float32)
    idx = nearest_code(a_p.reshape(nblocks, blocksize) / am[:, None], codebook)
    return pack_nibbles(idx.reshape(1, padded)).reshape(-1), am


@partial(jax.jit, static_argnames=("shape", "blocksize", "quant_type", "dtype"))
def _dequantize_4bit_2d(packed, absmax, shape, blocksize, quant_type, dtype):
    n, k = shape
    k_padded = _pad_k(k, blocksize)
    nblocks = k_padded // blocksize
    idx = unpack_nibbles(packed.reshape(n, k_padded // 2))
    values = codes_to_values(idx, quant_type)
    values = values.reshape(n, nblocks, blocksize)
    values = values * absmax.reshape(n, nblocks).astype(jnp.float32)[:, :, None]
    return values.reshape(n, k_padded)[:, :k].astype(dtype)


@partial(jax.jit, static_argnames=("numel", "blocksize", "quant_type", "dtype"))
def _dequantize_4bit_flat(packed, absmax, numel, blocksize, quant_type, dtype):
    idx = unpack_nibbles(packed.reshape(1, -1)).reshape(-1)
    nblocks = absmax.size
    padded_numel = nblocks * blocksize
    idx = idx[:padded_numel].reshape(nblocks, blocksize)
    values = codes_to_values(idx, quant_type)
    values = values * absmax.astype(jnp.float32)[:, None]
    return values.reshape(-1)[:numel].astype(dtype)


def dequantize_4bit(
    A: jnp.ndarray,
    quant_state: Optional[QuantState] = None,
    absmax: Optional[jnp.ndarray] = None,
    out: Optional[jnp.ndarray] = None,
    blocksize: int = 64,
    quant_type: str = "nf4",
) -> jnp.ndarray:
    """Dequantize packed 4-bit back to floats (reference: functional.py:306-416)."""
    shape = None
    dtype = jnp.bfloat16
    if quant_state is not None:
        absmax = quant_state.absmax
        blocksize = quant_state.blocksize
        quant_type = quant_state.quant_type
        shape = quant_state.shape
        dtype = quant_state.dtype
        if quant_state.state2 is not None:
            absmax = dequantize_blockwise(absmax, quant_state.state2)
    elif absmax is None:
        raise ValueError("Either quant_state or absmax must be provided")

    A = jnp.asarray(A)
    if shape is not None and len(shape) == 2:
        return _dequantize_4bit_2d(A, absmax, tuple(shape), blocksize, quant_type,
                                   jnp.dtype(dtype))
    numel = int(np.prod(shape)) if shape is not None else A.size * 2
    flat = _dequantize_4bit_flat(A, absmax, numel, blocksize, quant_type,
                                 jnp.dtype(dtype))
    if shape is not None:
        return flat.reshape(shape)
    return flat


def quantize_nf4(A, absmax=None, out=None, blocksize=64, compress_statistics=False,
                 quant_storage=jnp.uint8):
    """Alias for :func:`quantize_4bit` with quant_type='nf4'."""
    return quantize_4bit(A, absmax, out, blocksize, compress_statistics, "nf4",
                         quant_storage)


def dequantize_nf4(A, quant_state=None, absmax=None, out=None, blocksize=64):
    """Alias for :func:`dequantize_4bit` with quant_type='nf4'."""
    return dequantize_4bit(A, quant_state, absmax, out, blocksize, "nf4")


def quantize_fp4(A, absmax=None, out=None, blocksize=64, compress_statistics=False,
                 quant_storage=jnp.uint8):
    """Alias for :func:`quantize_4bit` with quant_type='fp4'."""
    return quantize_4bit(A, absmax, out, blocksize, compress_statistics, "fp4",
                         quant_storage)


def dequantize_fp4(A, quant_state=None, absmax=None, out=None, blocksize=64):
    """Alias for :func:`dequantize_4bit` with quant_type='fp4'."""
    return dequantize_4bit(A, quant_state, absmax, out, blocksize, "fp4")


# =============================================================================
# Blockwise INT8 (parity with functional.py:469-600)
# =============================================================================


@partial(jax.jit, static_argnames=("blocksize",))
def _quantize_blockwise_impl(a, blocksize: int):
    flat = a.reshape(-1).astype(jnp.float32)
    numel = flat.size
    padded = ((numel + blocksize - 1) // blocksize) * blocksize
    a_p = jnp.zeros((padded,), jnp.float32).at[:numel].set(flat)
    blocked = a_p.reshape(padded // blocksize, blocksize)
    absmax = jnp.clip(jnp.max(jnp.abs(blocked), axis=1), min=1e-8)
    scale = 127.0 / absmax[:, None]
    q = jnp.clip(jnp.round(blocked * scale), -127, 127).astype(jnp.int8)
    return q.reshape(-1)[:numel], absmax


def quantize_blockwise(
    A: jnp.ndarray,
    code: Optional[jnp.ndarray] = None,
    absmax: Optional[jnp.ndarray] = None,
    out: Optional[jnp.ndarray] = None,
    blocksize: int = 4096,
    nested: bool = False,
) -> Tuple[jnp.ndarray, QuantState]:
    """Blockwise symmetric INT8 quantization (reference: functional.py:469-539).

    Used both standalone and as the absmax double-quantizer
    (``compress_statistics``). ``code`` is unused (API compat).
    """
    _validate_blocksize(blocksize, power_of_two=False)
    A = jnp.asarray(A)
    orig_shape = tuple(A.shape)
    orig_dtype = A.dtype
    q, am = _quantize_blockwise_impl(A, blocksize)
    q = q.reshape(orig_shape)
    state2 = None
    if nested:
        am, state2 = quantize_blockwise(am, blocksize=256)
    state = QuantState(
        absmax=am, shape=orig_shape, code=None, blocksize=blocksize,
        quant_type="int8", dtype=orig_dtype, state2=state2,
    )
    return q, state


@partial(jax.jit, static_argnames=("blocksize", "shape", "dtype"))
def _dequantize_blockwise_impl(a, absmax, blocksize: int, shape, dtype):
    flat = a.reshape(-1).astype(jnp.float32)
    numel = flat.size
    padded = ((numel + blocksize - 1) // blocksize) * blocksize
    a_p = jnp.zeros((padded,), jnp.float32).at[:numel].set(flat)
    blocked = a_p.reshape(padded // blocksize, blocksize)
    deq = blocked * (absmax.astype(jnp.float32)[:, None] / 127.0)
    return deq.reshape(-1)[:numel].reshape(shape).astype(dtype)


def dequantize_blockwise(
    A: jnp.ndarray,
    quant_state: Optional[QuantState] = None,
    absmax: Optional[jnp.ndarray] = None,
    code: Optional[jnp.ndarray] = None,
    out: Optional[jnp.ndarray] = None,
    blocksize: int = 4096,
    nested: bool = False,
) -> jnp.ndarray:
    """Inverse of :func:`quantize_blockwise` (reference: functional.py:542-600)."""
    if quant_state is not None:
        absmax = quant_state.absmax
        blocksize = quant_state.blocksize
        shape = tuple(quant_state.shape)
        dtype = quant_state.dtype
        if quant_state.state2 is not None:
            absmax = dequantize_blockwise(absmax, quant_state.state2)
    else:
        if absmax is None:
            raise ValueError("Either quant_state or absmax must be provided")
        shape = tuple(jnp.asarray(A).shape)
        dtype = jnp.bfloat16
    return _dequantize_blockwise_impl(jnp.asarray(A), absmax, blocksize, shape,
                                      jnp.dtype(dtype))


# =============================================================================
# Row-wise INT8 (parity with functional.py:607-636)
# =============================================================================


@jax.jit
def _quantize_rowwise_impl(a2d):
    a = a2d.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(a), axis=-1)
    scales = jnp.clip(absmax, min=1e-8)
    q = jnp.clip(jnp.round(a * (127.0 / scales[:, None])), -127, 127).astype(jnp.int8)
    return q, scales


def quantize_rowwise(tensor: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-wise (per last-dim vector) symmetric INT8 (functional.py:607-625)."""
    tensor = jnp.asarray(tensor)
    orig_shape = tensor.shape
    q, scales = _quantize_rowwise_impl(tensor.reshape(-1, tensor.shape[-1]))
    return q.reshape(orig_shape), scales


def dequantize_rowwise(quantized: jnp.ndarray, scales: jnp.ndarray,
                       dtype=jnp.bfloat16) -> jnp.ndarray:
    """Inverse of :func:`quantize_rowwise` (functional.py:628-636)."""
    quantized = jnp.asarray(quantized)
    orig_shape = quantized.shape
    q2 = quantized.reshape(-1, quantized.shape[-1]).astype(jnp.float32)
    s = scales.reshape(-1).astype(jnp.float32)
    return (q2 * (s[:, None] / 127.0)).astype(dtype).reshape(orig_shape)


def matmul_int8(A, B, A_scales, B_scales, dtype=jnp.bfloat16):
    """INT8×INT8 matmul with row-wise scales (reference: functional.py:788-793).

    TPU-native: contracts in int8 on the MXU with int32 accumulation, then
    applies the rank-1 scale outer product — instead of the reference's
    dequantize-then-matmul. A [M,K] int8 row-quantized; B [K,N] int8
    column-quantized (B_scales per column of B, i.e. per row of B.T).
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    acc = jax.lax.dot_general(
        A, B, (((A.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    a_s = jnp.asarray(A_scales).astype(jnp.float32) / 127.0
    b_s = jnp.asarray(B_scales).astype(jnp.float32) / 127.0
    return (acc * a_s[..., :, None] * b_s[None, :]).astype(dtype)


# =============================================================================
# FP8 (E4M3 / E5M2) — bit-exact encode per reference functional.py:1086-1163
# =============================================================================


def _encode_fp8_e4m3(values: jnp.ndarray) -> jnp.ndarray:
    """Vectorized float→FP8-E4M3 encode via the native e4m3fn dtype.

    Deliberate deviation from the reference's bit-math encoder
    (functional.py:1106-1163), which has two accuracy bugs: values with
    biased exponent 15 (|x| ≥ 256 after scaling) clamp to ±240 instead of
    encoding the valid exp-15 range up to ±448 (its ``fp8_overflow = (14<<3)|7``
    path), and subnormals flush to zero. The hardware conversion is
    round-to-nearest-even, keeps subnormals, and maps NaN→0x7F — strictly
    more accurate, and a single instruction on TPU.
    """
    v = jnp.clip(values.astype(jnp.float32), -448.0, 448.0)
    v = jnp.where(jnp.isnan(values), jnp.float32(jnp.nan), v)
    enc = jax.lax.convert_element_type(v, jnp.float8_e4m3fn)
    return jax.lax.bitcast_convert_type(enc, jnp.uint8)


def _decode_fp8_e4m3(fp8: jnp.ndarray) -> jnp.ndarray:
    """FP8-E4M3 bits → float32. Bitcast through the native e4m3fn dtype —
    identical semantics to the reference decoder (functional.py:1178-1216)
    including subnormals and NaN, but a single hardware convert on TPU."""
    return jax.lax.bitcast_convert_type(
        fp8.astype(jnp.uint8), jnp.float8_e4m3fn
    ).astype(jnp.float32)


@jax.jit
def _quantize_fp8_e4m3_impl(a):
    a = a.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(a), axis=1)
    scales = jnp.clip(absmax / 448.0, min=1e-12)
    normalized = jnp.clip(a / scales[:, None], -448.0, 448.0)
    return _encode_fp8_e4m3(normalized), scales


def quantize_fp8_e4m3(tensor: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-scaled FP8-E4M3 quantization (reference: functional.py:643-663)."""
    tensor = jnp.asarray(tensor)
    if tensor.ndim != 2:
        raise ValueError("Input must be 2D")
    return _quantize_fp8_e4m3_impl(tensor)


def dequantize_fp8_e4m3(quantized, scales, dtype=jnp.bfloat16):
    """Inverse of :func:`quantize_fp8_e4m3` (reference: functional.py:666-673)."""
    vals = _decode_fp8_e4m3(jnp.asarray(quantized))
    return (vals * jnp.asarray(scales).astype(jnp.float32)[:, None]).astype(dtype)


def matmul_fp8_e4m3(input, weight, weight_scales, bias=None, dtype=jnp.bfloat16):
    """Fused matmul with FP8-E4M3 weights (reference: functional.py:796-807,
    fused kernels csrc/mps_bitsandbytes.mm:1067-1203, kernels/fp8_matmul.metal).

    TPU-native fusion: the stored uint8 bits are bitcast to the hardware
    ``float8_e4m3fn`` dtype and widened *inside* the dot — XLA fuses the
    convert chain into the GEMM the same way as the int8 W8A16 path
    (kbench/probe2: ~750 GB/s, 91%% of v5e HBM roofline), so the bf16
    weight is never materialized in HBM. Row scales apply on the output
    (rank-1 epilogue), exactly equivalent to scaling the weight rows."""
    x = jnp.asarray(input)
    is_1d = x.ndim == 1
    if is_1d:
        x = x[None, :]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    w8 = jax.lax.bitcast_convert_type(
        jnp.asarray(weight).astype(jnp.uint8), jnp.float8_e4m3fn)
    out = jax.lax.dot_general(
        x2.astype(dtype), w8.astype(dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    out = out * jnp.asarray(weight_scales).astype(jnp.float32)[None, :]
    out = out.astype(dtype).reshape(*lead, -1)
    if bias is not None:
        out = out + jnp.asarray(bias).astype(dtype)
    return out[0] if is_1d else out


# --- E5M2 (present in the reference's standalone kernels,
#     kernels/fp8_matmul.metal:100-157; optional surface per SURVEY §2.2) ---


@jax.jit
def _quantize_fp8_e5m2_impl(a):
    a = a.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(a), axis=1)
    scales = jnp.clip(absmax / 57344.0, min=1e-12)
    normalized = jnp.clip(a / scales[:, None], -57344.0, 57344.0)
    enc = jax.lax.convert_element_type(normalized, jnp.float8_e5m2)
    return jax.lax.bitcast_convert_type(enc, jnp.uint8), scales


def quantize_fp8_e5m2(tensor: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-scaled FP8-E5M2 quantization (reference: kernels/fp8_matmul.metal:212-259)."""
    tensor = jnp.asarray(tensor)
    if tensor.ndim != 2:
        raise ValueError("Input must be 2D")
    return _quantize_fp8_e5m2_impl(tensor)


def dequantize_fp8_e5m2(quantized, scales, dtype=jnp.bfloat16):
    """Inverse of :func:`quantize_fp8_e5m2`."""
    vals = jax.lax.bitcast_convert_type(
        jnp.asarray(quantized).astype(jnp.uint8), jnp.float8_e5m2
    ).astype(jnp.float32)
    return (vals * jnp.asarray(scales).astype(jnp.float32)[:, None]).astype(dtype)


# =============================================================================
# Double quantization & col+row INT8 (parity with functional.py:814-945)
# =============================================================================


def double_quant(
    A: jnp.ndarray,
    col_stats: Optional[jnp.ndarray] = None,
    row_stats: Optional[jnp.ndarray] = None,
    out_col: Optional[jnp.ndarray] = None,
    out_row: Optional[jnp.ndarray] = None,
    threshold: float = 0.0,
):
    """LLM.int8-style row+col statistics quantization (functional.py:814-863).

    Returns ``(col_quantized, row_quantized, col_stats, row_stats, outliers)``
    — ``outliers`` is always None, matching the reference.
    """
    A = jnp.asarray(A)
    if A.ndim != 2:
        raise ValueError("Input must be 2D")
    a = A.astype(jnp.float32)
    if row_stats is None:
        row_stats = jnp.clip(jnp.max(jnp.abs(a), axis=1), min=1e-8)
    if col_stats is None:
        col_stats = jnp.clip(jnp.max(jnp.abs(a), axis=0), min=1e-8)
    if out_row is None:
        out_row = jnp.clip(jnp.round(a * (127.0 / row_stats[:, None])), -127, 127
                           ).astype(jnp.int8)
    if out_col is None:
        out_col = jnp.clip(jnp.round(a * (127.0 / col_stats[None, :])), -127, 127
                           ).astype(jnp.int8)
    return out_col, out_row, col_stats, row_stats, None


def dequant_absmax(absmax_quant, absmax_scales, blocksize: int = 256):
    """Dequantize double-quantized absmax (reference: functional.py:866-889).

    Vectorized: the reference loops over dq-blocks in Python; here the scale
    is broadcast per 256-block in one pass.
    """
    if isinstance(absmax_scales, QuantState):
        return dequantize_blockwise(absmax_quant, absmax_scales)
    aq = jnp.asarray(absmax_quant)
    sc = jnp.asarray(absmax_scales).astype(jnp.float32)
    squeeze = aq.ndim == 1
    if squeeze:
        aq = aq[None, :]
        sc = sc[None, :]
    rows, num_blocks = aq.shape
    dq_blocks = sc.shape[1]
    padded = dq_blocks * blocksize
    a_p = jnp.zeros((rows, padded), jnp.float32).at[:, :num_blocks].set(
        aq.astype(jnp.float32))
    out = (a_p.reshape(rows, dq_blocks, blocksize) * sc[:, :, None]
           ).reshape(rows, padded)[:, :num_blocks]
    return out[0] if squeeze else out


def quantize_colrow(tensor: jnp.ndarray):
    """Geometric-mean row×col INT8 quantization (functional.py:896-924)."""
    tensor = jnp.asarray(tensor)
    if tensor.ndim != 2:
        raise ValueError("Input must be 2D")
    a = tensor.astype(jnp.float32)
    row_absmax = jnp.clip(jnp.max(jnp.abs(a), axis=1), min=1e-8)
    col_absmax = jnp.clip(jnp.max(jnp.abs(a), axis=0), min=1e-8)
    scale_matrix = jnp.sqrt(row_absmax[:, None] * col_absmax[None, :])
    q = jnp.clip(jnp.round(a * (127.0 / scale_matrix)), -127, 127).astype(jnp.int8)
    return q, row_absmax, col_absmax


def dequantize_colrow(quantized, row_scales, col_scales, dtype=jnp.bfloat16):
    """Inverse of :func:`quantize_colrow` (functional.py:927-932)."""
    scale_matrix = jnp.sqrt(
        jnp.asarray(row_scales).astype(jnp.float32)[:, None]
        * jnp.asarray(col_scales).astype(jnp.float32)[None, :]
    )
    return (jnp.asarray(quantized).astype(jnp.float32) * (scale_matrix / 127.0)
            ).astype(dtype)


def matmul_colrow(input, weight_int8, weight_row_scales, weight_col_scales,
                  bias=None, dtype=jnp.bfloat16):
    """Matmul with col+row quantized weights (functional.py:935-945)."""
    w = dequantize_colrow(weight_int8, weight_row_scales, weight_col_scales, dtype)
    out = jnp.asarray(input).astype(dtype) @ w.T
    if bias is not None:
        out = out + jnp.asarray(bias).astype(dtype)
    return out


# =============================================================================
# Sparse COO ops (parity with functional.py:952-1037)
# =============================================================================


def spmm_coo(row_indices, col_indices, values, dense, sparse_rows: int,
             sparse_cols: int):
    """COO sparse × dense matmul (reference: functional.py:952-979).

    TPU-native: scatter-add of ``values ⊙ dense[col]`` rows (device-side
    segment sum) — no host COO→CSR conversion like the reference's
    csrc/mps_bitsandbytes.mm:2603-2627.
    """
    dense = jnp.asarray(dense)
    values = jnp.asarray(values)
    gathered = values[:, None].astype(dense.dtype) * dense[col_indices]
    out = jnp.zeros((sparse_rows, dense.shape[1]), dtype=dense.dtype)
    return out.at[row_indices].add(gathered)


def spmm_coo_int8(row_indices, col_indices, values_int8, values_scale, dense,
                  sparse_rows: int, sparse_cols: int, dtype=jnp.bfloat16):
    """INT8-valued COO sparse × dense matmul (functional.py:982-1002)."""
    scale = jnp.asarray(values_scale).astype(jnp.float32)
    values = jnp.asarray(values_int8).astype(jnp.float32) * scale.reshape(())
    return spmm_coo(row_indices, col_indices, values.astype(dtype),
                    jnp.asarray(dense).astype(dtype), sparse_rows, sparse_cols)


def sparse_coo_from_dense(tensor, threshold: float = 0.0):
    """Dense → COO (reference: functional.py:1005-1020).

    Note: returns *concrete* index arrays (uses ``nonzero``), so this is a
    host-side/setup op, not jit-traceable — same role as in the reference.
    """
    tensor = np.asarray(tensor)
    rows, cols = tensor.shape
    sparse = np.where(np.abs(tensor) >= threshold, tensor, 0) if threshold > 0 \
        else tensor
    row_indices, col_indices = np.nonzero(sparse)
    values = sparse[row_indices, col_indices]
    return (jnp.asarray(row_indices, jnp.int32), jnp.asarray(col_indices, jnp.int32),
            jnp.asarray(values), rows, cols)


def quantize_sparse_coo(row_indices, col_indices, values):
    """Single-global-scale INT8 quantization of COO values (functional.py:1023-1037)."""
    values = jnp.asarray(values)
    absmax = jnp.clip(jnp.max(jnp.abs(values.astype(jnp.float32))), min=1e-8)
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(values.astype(jnp.float32) / scale), -127, 127
                 ).astype(jnp.int8)
    return row_indices, col_indices, q, scale.reshape(1)


# =============================================================================
# 4-bit matmul — dispatches to the fused Pallas kernel (L1 equivalent)
# =============================================================================

# Measured crossover (KERNEL_NOTES.md): at MXU-efficient M the XLA
# dequantize+GEMM fusion overtakes the Pallas kernel.
_FUSED_M_CROSSOVER = 256


def matmul_4bit(
    A: jnp.ndarray,
    B: jnp.ndarray,
    quant_state: QuantState,
    bias: Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Matmul with packed 4-bit weights (reference: functional.py:680-773).

    ``A @ dequant(B).T`` where B is the packed flat uint8 from
    :func:`quantize_4bit` of a 2D weight [N, K]. Dispatch on TPU:

    * M ≤ 256 (decode / small batch): the fused Pallas dequant-matmul —
      packed nibbles stream HBM→VMEM, never materializing fp weights;
    * larger M (prefill): XLA's fused dequantize+GEMM, which measures
      faster at MXU-efficient M (KERNEL_NOTES.md). Unlike the reference's
      M>512 crossover (functional.py:714-717) this is a measured perf
      choice — the Pallas kernel is capable at every M.

    Off-TPU the unfused path runs with a warn-once notice.
    """
    A = jnp.asarray(A)
    if compute_dtype is None:
        compute_dtype = A.dtype

    orig_shape = A.shape
    if A.ndim == 1:
        A2 = A.reshape(1, -1)
    elif A.ndim > 2:
        A2 = A.reshape(-1, A.shape[-1])
    else:
        A2 = A

    out = None
    use_fused = (len(quant_state.shape) == 2 and has_fused_kernels()
                 and A2.shape[0] <= _FUSED_M_CROSSOVER)
    if use_fused:
        from .ops.matmul4bit import fused_matmul_4bit  # lazy: avoids cycle
        # Half-precision compute uses native bf16 MXU passes; f32 compute
        # keeps the exact (Precision.HIGHEST) path for oracle parity.
        mxu = (jnp.bfloat16 if jnp.dtype(compute_dtype) in
               (jnp.bfloat16, jnp.float16) else jnp.float32)
        try:
            out = fused_matmul_4bit(A2, B, quant_state, mxu_dtype=mxu)
        except NotImplementedError:
            out = None
    if out is None:
        if len(quant_state.shape) == 2 and not has_fused_kernels():
            _warn_native_fallback("matmul_4bit")
        weight = dequantize_4bit(B, quant_state)
        out = A2.astype(weight.dtype) @ weight.T

    if bias is not None:
        out = out + jnp.asarray(bias).astype(out.dtype)
    if len(orig_shape) > 2:
        out = out.reshape(*orig_shape[:-1], out.shape[-1])
    elif A.ndim == 1:
        out = out.reshape(out.shape[-1])
    return out.astype(compute_dtype)


def matmul_nf4(input, weight_packed, weight_state: QuantState, bias=None):
    """Matmul with NF4 weights (functional.py:776-779)."""
    return matmul_4bit(input, weight_packed, weight_state, bias)


def matmul_fp4(input, weight_packed, weight_state: QuantState, bias=None):
    """Matmul with FP4 weights (functional.py:782-785)."""
    return matmul_4bit(input, weight_packed, weight_state, bias)
