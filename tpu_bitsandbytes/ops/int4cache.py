"""int4 runtime execution cache: native S4 weights, per-block partial scaling.

The third execution format for NF4-stored weights (VERDICT r4 perf round),
between the int8 cache (1 B/param, ~750 GB/s, +<=0.4% err) and the packed
NF4 W4A8 kernel (0.5 B/param, ~80 GB/s, exact-NF4 class):

* **0.5 B/param at ~650 GB/s** — measured 2.1x the int8 cache per matmul
  at 7B decode shapes (kbench/int4_args_probe: 69 us vs 145 us on a
  [8,4096]x[22016,4096], A8 n_t=2048). XLA/Mosaic store S4 packed
  (layout tiling `(8,1)`), the MXU ingests it through one in-kernel
  s4->s8 hardware convert — per-element work is ONE convert, not the
  W4A8 kernel's unpack+16-way-select (the ~80 GB/s VPU wall).
* Per-(row, 64-column-block) scales: the Pallas kernel runs per-block
  s8 x s8 -> s32 MXU dots and applies the f32 scale to the [M, N_t]
  partials (the W4A8 partial-scale structure) — XLA alone cannot fold a
  contraction-axis scale into one streaming dot, which is why this is a
  kernel and not a jnp path (kbench/int4_forms_probe).
* Numerics: the cache REQUANTIZES the dequantized NF4 weight to
  symmetric int4-linear per 64-block (FP4-class resolution: ~1.5x the
  NF4 RMS error) and row-quantizes activations to int8 (W4A8 class,
  <=0.8% rel). This is an opt-in speed/HBM format for serving — NF4
  remains the storage/checkpoint format, and `runtime_cache="int8"`
  remains the accuracy-first default. See tests/test_int4_cache.py for
  the measured quality gates.

jax 0.9 workaround: jit producers emit S4 layouts with
sub_byte_element_size_in_bits=0 while consumers expect 4; passing such an
array into jit loops forever reconciling layouts (_array_shard_arg).
`quantize_int4` therefore produces the cache with the explicit Format an
AOT-compiled consumer reports (TPU only; other backends are unaffected).

Reference anchor: execution-format selection over 4-bit storage,
mps_bitsandbytes/csrc/mps_bitsandbytes.mm:1981-1993.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .matmul4bit import _largest_tile, _round_up

__all__ = ["quantize_int4", "dequant_int4", "int4_matmul"]

# Scale blocksize on K. 64-deep dots half-fill the MXU's 128-deep pass;
# 128 measures 719 GB/s vs 64's 650 (kbench/int4_args_probe bs sweep) at
# indistinguishable proxy ppl (+0.18% vs +0.46% — both noise-level,
# KERNEL_NOTES round 4). 256+ adds <5% more speed for coarser scales.
INT4_BLOCK = 128
_MAX_M = 64                  # decode-shaped; beyond this XLA dequant+dot wins
_VMEM_BUDGET = 12 * 2 ** 20  # w tile: 0.5 B packed + 1 B converted per elt


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=None)
def _s4_format(shape: Tuple[int, ...], device=None):
    """The Format jit consumers expect for an s4 array of ``shape``
    (sub_byte_element_size_in_bits=4 — see module docstring). ``device``
    pins the producing jit to one device (the per-shard mesh cache build,
    parallel.sharding.build_sharded_int4_cache)."""
    comp = jax.jit(lambda w: w.astype(jnp.int8)).lower(
        jax.ShapeDtypeStruct(shape, jnp.int4)).compile()
    fmt = comp.input_formats[0][0]
    if device is not None:
        fmt = type(fmt)(fmt.layout, jax.sharding.SingleDeviceSharding(device))
    return fmt


def quantize_int4(w: jnp.ndarray, blocksize: int = INT4_BLOCK, device=None):
    """Symmetric int4-linear per-(row, K-block): ``w ~= q4 * scale``.

    w [N, K] float -> (q4 s4 [N_pad, K_pad], scales f32
    [K_pad/blocksize, N_pad]). K pads with zeros (zero codes contribute
    nothing); N pads to the kernel's preferred grid tile (zero rows,
    sliced off by int4_matmul) — e.g. gateup N=22016 only admits a 512
    tile (83.1 us/matmul) while padding to 22528 admits the measured-best
    2048 tile (69.4 us, kbench/int4_args_probe) for +2.3% bytes.
    """
    n, k = w.shape
    kp = _round_up(k, blocksize)
    t = _preferred_tile(kp)
    np_ = _round_up(n, t) if n >= t else n
    w32 = w.astype(jnp.float32)
    if kp != k or np_ != n:
        w32 = jnp.pad(w32, ((0, np_ - n), (0, kp - k)))
    nb = kp // blocksize
    wb = w32.reshape(np_, nb, blocksize)
    amax = jnp.max(jnp.abs(wb), axis=-1)                    # [N_pad, nb]
    s = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wb / s[:, :, None]), -7, 7)
    q = q.reshape(np_, kp)

    def conv(qf):
        return qf.astype(jnp.int4)

    if _interpret():
        q4 = jax.jit(conv)(q)
    else:
        q4 = jax.jit(conv,
                     out_shardings=_s4_format((np_, kp), device))(q)
    return q4, s.T.astype(jnp.float32)                      # [nb, N_pad]


def dequant_int4(q4: jnp.ndarray, scales: jnp.ndarray,
                 blocksize: Optional[int] = None, dtype=jnp.float32):
    """[N, K_pad] s4 + [nb, N] f32 -> [N, K_pad] float (oracle + XLA path)."""
    n, kp = q4.shape
    nb = scales.shape[0]
    if blocksize is not None:
        assert kp // blocksize == nb
    w = q4.astype(jnp.float32).reshape(n, nb, kp // nb)
    return (w * scales.T[:, :, None]).reshape(n, kp).astype(dtype)


def _preferred_tile(kp: int) -> int:
    """Largest 128-multiple grid tile whose working set (0.5 B packed +
    1 B converted per element, double-buffered input) fits VMEM."""
    t = min(2048, max(128, _VMEM_BUDGET // max(1, (kp * 3) // 2)))
    return (t // 128) * 128


def _select_n_tile(n: int, kp: int) -> Optional[int]:
    target = _preferred_tile(kp)
    if target < 128:
        return None
    return _largest_tile(n, target, 128)


def _kernel(x_ref, w_ref, s_ref, o_ref, *, bs: int):
    """Per-block s8 x s8 -> s32 dots over an in-register s4->s8 convert;
    f32 scales applied to the [M_t, N_t] partials."""
    w = w_ref[:].astype(jnp.int8)               # ONE hardware convert/elt
    dn = (((1,), (1,)), ((), ()))
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for b in range(w.shape[1] // bs):
        sl = slice(b * bs, (b + 1) * bs)
        p = jax.lax.dot_general(x_ref[:, sl], w[:, sl], dn,
                                preferred_element_type=jnp.int32)
        acc = acc + p.astype(jnp.float32) * s_ref[b, :][None, :]
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("m_t", "n_t", "bs"))
def _int4_call(xq, q4, scales, *, m_t: int, n_t: int, bs: int):
    n, kp = q4.shape
    nb = kp // bs
    return pl.pallas_call(
        functools.partial(_kernel, bs=bs),
        grid=(n // n_t,),
        in_specs=[
            pl.BlockSpec((m_t, kp), lambda i: (0, 0)),
            pl.BlockSpec((n_t, kp), lambda i: (i, 0)),
            pl.BlockSpec((nb, n_t), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m_t, n_t), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m_t, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_t * n * kp,
            bytes_accessed=n * kp // 2 + scales.size * 4 + m_t * n * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(xq, q4, scales)


@functools.lru_cache(maxsize=None)
def _make_int4_mm(bs: int, m_t: int, n_t: int, axis: Optional[str] = None):
    """custom_vjp: A8 row quantization inside the boundary; d_x is the
    straight-through gradient against the dequantized int4 weight (weights
    are frozen serving state — same arrangement as ops.w4a8).

    ``axis``: named mesh axis for row-parallel TP shards — the activation
    row-max is pmax'd over it so the A8 quantization matches the
    single-device kernel bit-for-bit (each shard sees only K/tp of the
    row; without the collective, per-shard scales diverge from the
    unsharded engine's and so do greedy tokens)."""

    def _fwd_only(xp, q4, scales):
        m = xp.shape[0]
        x32 = xp.astype(jnp.float32)
        s_x = jnp.max(jnp.abs(x32), axis=1, keepdims=True) / 127.0
        if axis is not None:
            s_x = jax.lax.pmax(s_x, axis)
        s_x = jnp.maximum(s_x, 1e-12)
        xq = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
        if m_t != m:
            xq = jnp.pad(xq, ((0, m_t - m), (0, 0)))
        out = _int4_call(xq, q4, scales, m_t=m_t, n_t=n_t, bs=bs)
        return out[:m] * s_x

    @jax.custom_vjp
    def f(xp, q4, scales):
        return _fwd_only(xp, q4, scales)

    def fwd(xp, q4, scales):
        return (_fwd_only(xp, q4, scales),
                (q4, scales, jnp.zeros((0,), xp.dtype)))

    def bwd(res, g):
        q4, scales, x_sent = res
        w = dequant_int4(q4, scales, bs)
        d_x = g.astype(jnp.float32) @ w
        return d_x.astype(x_sent.dtype), None, jnp.zeros_like(scales)

    f.defvjp(fwd, bwd)
    return f


def int4_matmul(x: jnp.ndarray, q4: jnp.ndarray, scales: jnp.ndarray, *,
                blocksize: Optional[int] = None,
                bias: Optional[jnp.ndarray] = None,
                out_dtype=jnp.bfloat16,
                n_out: Optional[int] = None,
                xmax_axis: Optional[str] = None) -> jnp.ndarray:
    """``x [M, K] @ (q4 * scales).T`` streaming the packed s4 cache.

    Decode-shaped calls (M <= 64, tileable N) run the A8 Pallas kernel;
    anything else takes the XLA dequant+dot (prefill is compute-bound, the
    2 B/param dequant materialization amortizes at large M). ``n_out``
    slices off quantize_int4's grid-tile N padding (default: all rows).
    ``blocksize`` defaults to what the scales' shape implies.
    ``xmax_axis``: mesh axis to pmax the A8 row scale over (row-parallel
    TP shards inside shard_map — see _make_int4_mm).
    """
    m, k = x.shape
    n, kp = q4.shape
    if blocksize is None:
        blocksize = kp // scales.shape[0]
    if kp != k:
        x = jnp.pad(x, ((0, 0), (0, kp - k)))
    n_t = _select_n_tile(n, kp) if (m <= _MAX_M and kp % blocksize == 0
                                    and kp % 128 == 0) else None
    if n_t is not None:
        m_t = _round_up(m, 8)
        out = _make_int4_mm(blocksize, m_t, n_t, xmax_axis)(x, q4, scales)
    else:
        w = dequant_int4(q4, scales, blocksize, dtype=x.dtype)
        out = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    if n_out is not None and n_out != n:
        out = out[:, :n_out]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(out_dtype)
