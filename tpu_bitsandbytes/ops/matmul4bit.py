"""Fused 4-bit dequant + matmul Pallas TPU kernel (L1 equivalent).

TPU-native replacement for the reference's fused Metal kernels
(``nf4_matmul_simd``/``large``/``fused``/``simple`` and FP4 variants,
csrc/mps_bitsandbytes.mm:440-1004). One parameterized kernel covers all M —
the reference's M>512 crossover to a vendor GEMM (functional.py:714-717) is
eliminated: the kernel streams packed nibbles HBM→VMEM, decodes them on the
VPU and feeds the MXU without ever materializing the fp16 weight in HBM.

TPU-first design choices:

* **Even/odd K-phase split** — for ``y = x @ W^T`` with W packed
  two-codes-per-byte along K, the unpacked nibble planes are never
  re-interleaved (a lane-level shuffle). Matmul is order-invariant along the
  contraction axis, so the wrapper splits x into its even/odd K phases once
  (activations are tiny next to weights) and the kernel computes
  ``x_even @ LUT(lo)^T + x_odd @ LUT(hi)^T``.
* **MXU scale broadcast** — the per-block absmax is expanded across its
  ``blocksize/2`` lanes with a constant 0/1 block matrix on the MXU
  (lane-axis ``jnp.repeat`` is an unsupported Mosaic relayout). absmax is
  fed to the kernel transposed ``[blocks, N]`` so every block-spec dimension
  satisfies TPU (sublane, lane) divisibility.
* **i32 nibble unpack** — Mosaic has no 8-bit vector shifts; packed bytes
  are widened u8→i32 and unpacked with native i32 shifts.

Codebook lookup strategies live in :mod:`tpu_bitsandbytes.ops.lut`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lut import lookup
from ..functional import (
    NF4_CODEBOOK_NP,
    FP4_CODEBOOK_NP,
    QuantState,
    _pad_k,
    dequantize_blockwise,
)

DEFAULT_LUT_MODE = "select"
_VMEM_BUDGET = 10 * 1024 * 1024  # soft per-step working-set budget (bytes)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _largest_tile(dim: int, target: int, mult: int) -> Optional[int]:
    """Largest t ≤ target with t % mult == 0 and dim % t == 0."""
    if dim <= target:
        return dim if dim % mult == 0 else None
    start = (min(target, dim) // mult) * mult
    for t in range(start, mult - 1, -mult):
        if dim % t == 0:
            return t
    return None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _matmul4bit_kernel(xe_ref, xo_ref, w_ref, amT_ref, out_ref, acc_ref, *,
                       bs2: int, table, lut_mode: str, n_k: int, mxu_dtype,
                       precision):
    """Grid (gm, gn, gk); K-accumulation in a VMEM scratch."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Unpack nibbles in i32 (no 8-bit vector shifts on TPU).
    w32 = w_ref[:].astype(jnp.int32)  # [N_t, K2_t] packed nibble pairs
    lo = w32 & 0x0F
    hi = w32 >> 4  # zero-extended, already < 16
    vlo = lookup(lo, table, lut_mode, jnp.float32)
    vhi = lookup(hi, table, lut_mode, jnp.float32)

    # Broadcast per-block absmax across its bs2 lanes via a constant 0/1
    # block matrix on the MXU: scale[n, j] = Σ_b amT[b, n] · 1[j//bs2 == b].
    am_t, n_t = amT_ref.shape
    k2_t = am_t * bs2
    blk_of_lane = jax.lax.broadcasted_iota(jnp.int32, (am_t, k2_t), 1) // bs2
    blk_row = jax.lax.broadcasted_iota(jnp.int32, (am_t, k2_t), 0)
    expand = (blk_of_lane == blk_row).astype(jnp.float32)
    scale = jax.lax.dot_general(
        amT_ref[:], expand, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)  # [N_t, K2_t]

    vlo = (vlo * scale).astype(mxu_dtype)
    vhi = (vhi * scale).astype(mxu_dtype)
    # Contract the lane axis of both operands: [M_t,K2_t] x [N_t,K2_t] -> [M_t,N_t]
    dn = (((1,), (1,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        xe_ref[:].astype(mxu_dtype), vlo, dn,
        preferred_element_type=jnp.float32, precision=precision,
    ) + jax.lax.dot_general(
        xo_ref[:].astype(mxu_dtype), vhi, dn,
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _dequant_planes(packed2d, absmaxT, blocksize, quant_type):
    """Dequantized even/odd-K weight planes [N, K2] for the backward pass."""
    table = NF4_CODEBOOK_NP if quant_type == "nf4" else FP4_CODEBOOK_NP
    cb = jnp.asarray(table, jnp.float32)
    lo = (packed2d & jnp.uint8(0x0F)).astype(jnp.int32)
    hi = (packed2d >> 4).astype(jnp.int32)
    bs2 = blocksize // 2
    scale = jnp.repeat(absmaxT.T, bs2, axis=1)  # [N, K2] (XLA-level: fine)
    vlo = jnp.take(cb, lo, axis=0) * scale
    vhi = jnp.take(cb, hi, axis=0) * scale
    return vlo, vhi


def _aligned_dispatch(xe, xo, packed2d, absmaxT, *, blocksize: int,
                      quant_type: str, out_dtype_name: str,
                      mxu_dtype_name: str, lut_mode: str, exact: bool):
    """Tile-select + pad + invoke the Pallas kernel; returns exact [m, n].

    Runs on whatever shapes it is traced with — the GLOBAL arrays in the
    single-device path, or one device's LOCAL shard inside the GSPMD
    partition body (tile selection and padding are trace-time Python over
    static local shapes, so every shard tiles itself correctly).
    """
    mxu_dtype = jnp.dtype(mxu_dtype_name)
    m, k2 = xe.shape
    n = packed2d.shape[0]
    bs2 = blocksize // 2

    tiles = _select_tiles(m, n, k2, bs2, mxu_dtype)
    if tiles is None:
        # Unfriendly N: pad rows to a lane multiple (copies weight — only on
        # the generic functional path; modules pre-align their layouts).
        n_pad = _round_up(n, 128)
        packed2d = jnp.pad(packed2d, ((0, n_pad - n), (0, 0)))
        absmaxT = jnp.pad(absmaxT, ((0, 0), (0, n_pad - n)))
        tiles = _select_tiles(m, n_pad, k2, bs2, mxu_dtype)
        if tiles is None:
            raise NotImplementedError("no valid tiling for this shape")
    m_pad, m_t, n_t, k2_t = tiles
    if m_pad != m:
        xe = jnp.pad(xe, ((0, m_pad - m), (0, 0)))
        xo = jnp.pad(xo, ((0, m_pad - m), (0, 0)))
    out = _fused_matmul_4bit_fwd_impl(
        xe, xo, packed2d, absmaxT, blocksize=blocksize,
        quant_type=quant_type, out_dtype=jnp.dtype(out_dtype_name),
        mxu_dtype=mxu_dtype, lut_mode=lut_mode, m_t=m_t, n_t=n_t,
        k2_t=k2_t, exact=exact)
    return out[:m, :n]


def _spec_dim(sharding, i):
    """Axis name(s) sharding dimension ``i`` of a NamedSharding, else None."""
    spec = getattr(sharding, "spec", None)
    if spec is None or i >= len(spec):
        return None
    return spec[i]


@functools.lru_cache(maxsize=None)
def _make_partitioned(blocksize: int, quant_type: str, out_dtype_name: str,
                      mxu_dtype_name: str, lut_mode: str, exact: bool):
    """GSPMD-partitionable fused matmul (VERDICT r3 #5).

    ``jax.experimental.custom_partitioning`` teaches the partitioner how to
    shard the opaque Pallas call, so plain ``jax.jit`` over NamedSharding'd
    quantized params runs the fused kernel per shard instead of silently
    materializing dequantized weights (the old ``disable_fused_kernels``
    route). Supported shardings: M (data-parallel activations) and N
    (column-parallel weights — packed dim 0, absmaxT dim 1) partition
    freely; the contraction factors (K2 phases, absmax blocks) are declared
    need-replication, so a K-sharded weight is all-gathered by the
    partitioner first (correct, not fast — the engine's shard_map TP path
    remains the hand-scheduled fast path for row-parallel layouts).
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    kwargs = dict(blocksize=blocksize, quant_type=quant_type,
                  out_dtype_name=out_dtype_name,
                  mxu_dtype_name=mxu_dtype_name, lut_mode=lut_mode,
                  exact=exact)

    fn = custom_partitioning(
        lambda xe, xo, packed2d, absmaxT:
        _aligned_dispatch(xe, xo, packed2d, absmaxT, **kwargs))

    def _dims(arg_infos):
        m_ax = _spec_dim(arg_infos[0].sharding, 0)
        n_ax = _spec_dim(arg_infos[2].sharding, 0)
        return m_ax, n_ax

    def infer(mesh, arg_infos, result_infos):
        m_ax, n_ax = _dims(arg_infos)
        return NamedSharding(mesh, P(m_ax, n_ax))

    def partition(mesh, arg_infos, result_infos):
        m_ax, n_ax = _dims(arg_infos)
        arg_shardings = (
            NamedSharding(mesh, P(m_ax, None)),      # xe
            NamedSharding(mesh, P(m_ax, None)),      # xo
            NamedSharding(mesh, P(n_ax, None)),      # packed2d
            NamedSharding(mesh, P(None, n_ax)),      # absmaxT
        )
        out_sharding = NamedSharding(mesh, P(m_ax, n_ax))

        def lower(xe, xo, packed2d, absmaxT):
            return _aligned_dispatch(xe, xo, packed2d, absmaxT, **kwargs)

        return mesh, lower, out_sharding, arg_shardings

    fn.def_partition(
        partition, infer_sharding_from_operands=infer,
        # factors: m=rows, k=K2 phase lanes, n=weight rows, b=absmax blocks
        sharding_rule="m k, m k, n k, b n -> m n",
        need_replication_factors=("k", "b"))
    return fn


@functools.lru_cache(maxsize=None)
def _make_fused_aligned(blocksize: int, quant_type: str, out_dtype_name: str,
                        mxu_dtype_name: str, lut_mode: str, exact: bool):
    """custom_vjp-wrapped fused matmul for one static config.

    pallas_call has no AD rule, but QLoRA training differentiates through
    frozen quantized linears — the backward pass computes d_x against the
    XLA-dequantized weight planes (weights are frozen integer state and get
    zero cotangents, and the XLA ops partition natively under GSPMD).
    Static config is closed over (custom_vjp over plain array args only).
    """
    inner = _make_partitioned(blocksize, quant_type, out_dtype_name,
                              mxu_dtype_name, lut_mode, exact)

    @jax.custom_vjp
    def f(xe, xo, packed2d, absmaxT):
        return inner(xe, xo, packed2d, absmaxT)

    x_dtype = jnp.dtype(mxu_dtype_name)  # the wrapper casts x to mxu dtype

    def fwd(xe, xo, packed2d, absmaxT):
        return f(xe, xo, packed2d, absmaxT), (packed2d, absmaxT)

    def bwd(res, g):
        packed2d, absmaxT = res
        vlo, vhi = _dequant_planes(packed2d, absmaxT, blocksize, quant_type)
        g32 = g.astype(jnp.float32)
        d_xe = (g32 @ vlo).astype(x_dtype)
        d_xo = (g32 @ vhi).astype(x_dtype)
        # packed is integer (symbolic-zero cotangent); absmax is frozen state
        return d_xe, d_xo, None, jnp.zeros_like(absmaxT)

    f.defvjp(fwd, bwd)
    return f


@functools.partial(
    jax.jit,
    static_argnames=("blocksize", "quant_type", "out_dtype", "mxu_dtype",
                     "lut_mode", "m_t", "n_t", "k2_t", "exact"),
)
def _fused_matmul_4bit_fwd_impl(xe, xo, packed2d, absmaxT, *, blocksize: int,
                                quant_type: str, out_dtype, mxu_dtype,
                                lut_mode: str, m_t: int, n_t: int, k2_t: int,
                                exact: bool):
    m, k2 = xe.shape
    n = packed2d.shape[0]
    bs2 = blocksize // 2
    table = NF4_CODEBOOK_NP if quant_type == "nf4" else FP4_CODEBOOK_NP
    gm, gn, gk = m // m_t, n // n_t, k2 // k2_t
    am_t = k2_t // bs2
    precision = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT

    kernel = functools.partial(
        _matmul4bit_kernel, bs2=bs2, table=table, lut_mode=lut_mode, n_k=gk,
        mxu_dtype=jnp.dtype(mxu_dtype), precision=precision,
    )
    flops = 2 * m * n * (2 * k2) * 2
    bytes_accessed = (n * k2 + absmaxT.size * 4
                      + (xe.size + xo.size) * xe.dtype.itemsize + m * n * 2)
    return pl.pallas_call(
        kernel,
        grid=(gm, gn, gk),
        in_specs=[
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((n_t, k2_t), lambda im, i, j: (i, j)),
            pl.BlockSpec((am_t, n_t), lambda im, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((m_t, n_t), lambda im, i, j: (im, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((m_t, n_t), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=_interpret(),
    )(xe, xo, packed2d, absmaxT)


def _select_tiles(m: int, n: int, k2: int, bs2: int, mxu_dtype):
    """Pick (m_t, n_t, k2_t) honoring TPU tiling and VMEM constraints.

    Returns None if no divisor-based tiling exists (caller pads instead).
    Constraints: lane dims (k2_t for x/w, n_t for absmaxT/out) must be
    multiples of 128 or the full dim; amT sublane dim (k2_t/bs2) must be a
    multiple of 8 or the full block count.
    """
    sub = 8 if jnp.dtype(mxu_dtype) == jnp.float32 else 16
    m_pad = _round_up(m, sub)
    m_t = m_pad if m_pad <= 512 else (_largest_tile(m_pad, 256, sub) or 256)
    if m_pad % m_t != 0:
        m_pad = _round_up(m_pad, m_t)

    n_t = _largest_tile(n, 256, 128) or (n if n % 8 == 0 else None)
    if n_t is None:
        return None

    nb_total = k2 // bs2
    # Prefer a k tile whose absmax sublane count is a multiple of 8.
    k2_t = _largest_tile(k2, 2048, max(bs2 * 8, 128))
    if k2_t is None:
        # Single k step (absmax block = full). Shrink n_t to fit VMEM.
        k2_t = k2
        while n_t > 8 and n_t * k2_t * 13 > _VMEM_BUDGET:
            if n_t % 2 != 0 or (n_t // 2) % 8 != 0 or n % (n_t // 2) != 0:
                break
            n_t //= 2
    return m_pad, m_t, n_t, k2_t


def fused_matmul_4bit(
    x: jnp.ndarray,
    packed_flat: jnp.ndarray,
    quant_state: QuantState,
    *,
    mxu_dtype=jnp.float32,
    lut_mode: str = DEFAULT_LUT_MODE,
    exact: Optional[bool] = None,
) -> jnp.ndarray:
    """``x [M,K] @ dequant(W [N,K]).T`` with W packed 4-bit (flat uint8).

    Wrapper: expands double-quantized absmax (XLA level — tiny), splits x
    into even/odd K phases, aligns shapes to kernel tiles, invokes the Pallas
    kernel. ``exact=True`` (default for f32) uses Precision.HIGHEST so f32
    results match an exact f32 reference; bf16 mode uses native MXU passes.
    Raises NotImplementedError for configs the kernel doesn't cover (caller
    falls back to the unfused path).
    """
    if len(quant_state.shape) != 2:
        raise NotImplementedError("fused path requires 2D quant state")
    blocksize = quant_state.blocksize
    if blocksize < 2 or blocksize % 2 != 0:
        raise NotImplementedError("fused path requires even blocksize >= 2")
    if exact is None:
        exact = jnp.dtype(mxu_dtype) == jnp.float32
    n, k = quant_state.shape
    k_padded = _pad_k(k, blocksize)
    k2 = k_padded // 2
    bs2 = blocksize // 2

    absmax = quant_state.absmax
    if quant_state.state2 is not None:
        absmax = dequantize_blockwise(absmax, quant_state.state2)
    absmaxT = absmax.reshape(n, k_padded // blocksize).astype(jnp.float32).T
    packed2d = packed_flat.reshape(n, k2)

    x = x.astype(jnp.float32) if mxu_dtype == jnp.float32 else x.astype(mxu_dtype)
    if k_padded != k:
        x = jnp.pad(x, ((0, 0), (0, k_padded - k)))
    xe = x[:, 0::2]
    xo = x[:, 1::2]

    # Validate tilability on the GLOBAL shape up front so the caller's
    # NotImplementedError fallback fires before any custom-call is staged.
    if (_select_tiles(x.shape[0], n, k2, bs2, mxu_dtype) is None
            and _select_tiles(x.shape[0], _round_up(n, 128), k2, bs2,
                              mxu_dtype) is None):
        raise NotImplementedError("no valid tiling for this shape")

    fn = _make_fused_aligned(
        blocksize, quant_state.quant_type, jnp.dtype(quant_state.dtype).name,
        jnp.dtype(mxu_dtype).name, lut_mode, exact)
    return fn(xe, xo, packed2d, absmaxT)
