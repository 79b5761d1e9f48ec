"""Candidate flash-decode formulations (probe-only until one wins).

The shipped XLA chain runs decode attention's matvec contractions as
multiply-reduce fusions at 715 GB/s isolated but ~430-450 GB/s in situ
(kbench/attn_a8_probe, fusion_breakdown) — the loss is the in-situ
structure (masks + staged two-block softmax + span slice) living at
fusion boundaries. The round-3 Pallas kernel (ops/flash_decode.py) fuses
the structure but computes QK/PV as per-head M=1 MXU dots and measures
NET-NEGATIVE in situ (8.48 vs 6.50 ms/step, KERNEL_NOTES r4).

``mr`` here keeps the round-3 kernel's grid/blocks/masking contract but
computes both contractions the way XLA's fast path does — VPU
multiply-reduce over the head loop — with no q/p quantization at all:

  QK:  lg[h, t] = sum_d K[h, t, d] * q[h, d]      (lane reduction)
  PV:  o[h, d]  = sum_t V[h, t, d] * p[h, t]      (sublane reduction)

If Mosaic's codegen for these matches XLA's, the kernel gets the
isolated stream rate PLUS the structure for free, and the ~0.8 ms/step
(B=8) in-situ structure tax disappears.

Numerics: exact f32 attention over the dequantized codes — STRICTLY
better than both the shipped chain (bf16 probability rounding) and the
round-3 kernel (i8 q/p rounding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mr_decode_attention"]


def _mr_kernel(off_ref, step_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
               stk_ref, stks_ref, stv_ref, stvs_ref, o_ref, *,
               scale: float, window, kpos_start: int, softcap,
               compute_dtype):
    b = pl.program_id(0)
    off = off_ref[b]
    step = step_ref[0]
    q = q_ref[0].astype(jnp.float32)          # [H_kv, rep, D]
    h_kv, rep, d = q.shape
    h = h_kv * rep
    qf = (q.reshape(h, d) * scale).astype(compute_dtype)
    t = k_ref.shape[2]
    c = stk_ref.shape[2]

    def qk(kref, ksref, tt):
        # lg[h, t] = sum_d K[hk, t, d] * q[h, d] — multiply + lane-reduce
        rows = []
        for hk in range(h_kv):
            kf = kref[0, hk].astype(compute_dtype)          # [tt, D]
            for r in range(rep):
                prod = kf * qf[hk * rep + r][None, :]
                rows.append(jnp.sum(prod.astype(jnp.float32), axis=-1))
        lg = jnp.stack(rows, axis=0)                        # [H, tt]
        ks = ksref[0, :, 0]                                 # [H_kv, tt]
        ksb = jnp.broadcast_to(ks[:, None, :], (h_kv, rep, tt)
                               ).reshape(h, tt)
        return lg * (ksb * (1.0 / 127.0))

    lg = qk(k_ref, ks_ref, t)
    if softcap is not None:
        lg = jnp.tanh(lg / softcap) * softcap
    kpos = kpos_start + jax.lax.broadcasted_iota(jnp.int32, (h, t), 1)
    keep = kpos <= off - step - 1
    if window is not None:
        keep &= kpos > off - window
    lg = jnp.where(keep, lg, -1e30)

    lg_st = qk(stk_ref, stks_ref, c)
    if softcap is not None:
        lg_st = jnp.tanh(lg_st / softcap) * softcap
    jst = jax.lax.broadcasted_iota(jnp.int32, (h, c), 1)
    keep_st = jst <= step
    if window is not None:
        keep_st &= jst > step - window
    lg_st = jnp.where(keep_st, lg_st, -1e30)

    m = jnp.maximum(jnp.max(lg, axis=-1, keepdims=True),
                    jnp.max(lg_st, axis=-1, keepdims=True))
    p = jnp.exp(lg - m)
    p_st = jnp.exp(lg_st - m)
    l = (jnp.sum(p, axis=-1, keepdims=True)
         + jnp.sum(p_st, axis=-1, keepdims=True))

    pv = (p * jnp.broadcast_to(vs_ref[0, :, 0][:, None, :],
                               (h_kv, rep, t)).reshape(h, t) / l)
    pvs = (p_st * jnp.broadcast_to(stvs_ref[0, :, 0][:, None, :],
                                   (h_kv, rep, c)).reshape(h, c) / l)

    outs = []
    for hk in range(h_kv):
        vf = v_ref[0, hk].astype(compute_dtype)             # [t, D]
        svf = stv_ref[0, hk].astype(compute_dtype)          # [c, D]
        for r in range(rep):
            hh = hk * rep + r
            # minor-dim insertion must happen in f32 (Mosaic: 16-bit
            # relayout with a new minor dim is unsupported), cast after
            pcol = pv[hh][:, None].astype(compute_dtype)
            pscol = pvs[hh][:, None].astype(compute_dtype)
            o_h = jnp.sum((vf * pcol).astype(jnp.float32), axis=0)
            o_h = o_h + jnp.sum((svf * pscol).astype(jnp.float32), axis=0)
            outs.append(o_h)
    out = jnp.stack(outs, axis=0) * (1.0 / 127.0)           # [H, D]
    o_ref[0] = out.reshape(h_kv, rep, d)


@functools.partial(jax.jit, static_argnames=("scale", "window",
                                             "kpos_start", "softcap",
                                             "compute_dtype", "interpret"))
def mr_decode_attention(q, k_q, k_scale, v_q, v_scale, off, *,
                        staged=None, scale, window=None, kpos_start=0,
                        softcap=None, compute_dtype=jnp.float32,
                        interpret=None):
    """Same contract as ops.flash_decode.flash_decode_attention."""
    bsz, h, d = q.shape
    h_kv, t = k_q.shape[1], k_q.shape[2]
    rep = h // h_kv
    if scale is None:
        scale = 1.0 / d ** 0.5
    if staged is None:
        c = 8
        stk = jnp.zeros((bsz, h_kv, c, d), jnp.int8)
        stv = stk
        stks = jnp.ones((bsz, h_kv, c), jnp.float32)
        stvs = stks
        step = jnp.int32(-1)
    else:
        stk, stks, stv, stvs, step = staged
        c = stk.shape[2]
    qg = q.reshape(bsz, h_kv, rep, d)
    ks4 = k_scale[:, :, None, :]
    vs4 = v_scale[:, :, None, :]
    stks4 = stks[:, :, None, :]
    stvs4 = stvs[:, :, None, :]
    kernel = functools.partial(_mr_kernel, scale=float(scale),
                               window=window, kpos_start=kpos_start,
                               softcap=softcap, compute_dtype=compute_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h_kv, rep, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, h_kv, t, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, h_kv, 1, t), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, h_kv, t, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, h_kv, 1, t), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, h_kv, c, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, h_kv, 1, c), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, h_kv, c, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, h_kv, 1, c), lambda i, *_: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h_kv, rep, d),
                               lambda i, *_: (i, 0, 0, 0)),
    )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h_kv, rep, d), jnp.float32),
        interpret=interpret,
    )(off.astype(jnp.int32), step[None].astype(jnp.int32), qg, k_q, ks4,
      v_q, vs4, stk, stks4, stv, stvs4)
    return out.reshape(bsz, h, d)
