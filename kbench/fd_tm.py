"""T-as-M flash-decode candidate: stream K/V through the MXU.

The r3 kernel (ops/flash_decode.py) computes QK as per-head
``q[rep,D] x K[T,D]^T`` dots — M=rep(=1 for MHA), N=T: the MXU spends its
time LOADING the [D,T] weight tiles (2 tiles at T=256) to multiply one
streaming row, ~8-9 us/cell, leaving the kernel compute-bound at ~37.5
us/layer-step (kbench/fd_probe) against a 20.5 us DMA floor.

Flip the orientation so the BIG operand streams:

  QK:  lgT[t, rep] = K[T, D] x q[rep, D]^T   — M=T, weights = q (1 tile)
  PV:  oT[d, rep]  = V[T, D]^T x p[T, rep]   — contraction on sublanes,
                                               V streams, p is the tiny side

All softmax reductions (max/sum over T) become SUBLANE reductions on
[t, rep] columns — the fast VPU direction — and the masks are [t, 1]
iota columns. Numerics contract identical to flash_decode_attention
(i8 q/p rows, scales folded; same two-block staged softmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tm_decode_attention"]


def _kernel(off_ref, step_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
            stk_ref, stks_ref, stv_ref, stvs_ref, o_ref, *,
            scale: float, window, kpos_start: int, softcap):
    b = pl.program_id(0)
    off = off_ref[b]
    step = step_ref[0]
    q = q_ref[0].astype(jnp.float32)          # [H_kv, rep, D]
    h_kv, rep, d = q.shape
    h = h_kv * rep
    qf = q.reshape(h, d)
    q_s = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) + 1e-9   # [H, 1]
    q_i8 = jnp.clip(jnp.round(qf * (127.0 / q_s)), -127, 127
                    ).astype(jnp.int8)
    lg_row = (q_s * (scale / (127.0 * 127.0))).reshape(1, h)     # [1, H]

    t = k_ref.shape[2]
    c = stk_ref.shape[2]
    # pad the query rows to 8 so the QK dot is a real MXU matmul with
    # K STREAMING as the M=T side (rhs.shape[0]==1 would hit Mosaic's
    # VPU-matvec lowering, which has no i32 accumulation); the idle N
    # columns are free — the MXU streams rows regardless of N
    rp = max(rep, 8)
    dn_t = (((1,), (1,)), ((), ()))   # K[t,d] x q[rp,d] -> [t, rp]
    dn_pv = (((1,), (0,)), ((), ()))  # p[rp,t] x V[t,d] -> [rp, d]

    kpos = kpos_start + jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    keep_m = kpos <= off - step - 1
    jst = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    keep_s = jst <= step
    if window is not None:
        keep_m &= kpos > off - window
        keep_s &= jst > step - window

    outs = []
    for hk in range(h_kv):
        sl = slice(hk * rep, (hk + 1) * rep)
        qh = q_i8[sl]                                            # [rep, D]
        if rp != rep:
            qh = jnp.concatenate(
                [qh] + [qh[:1]] * (rp - rep), axis=0)            # [rp, D]
        lgT = jax.lax.dot_general(
            k_ref[0, hk], qh, dn_t,
            preferred_element_type=jnp.int32).astype(jnp.float32)
        lgT = lgT[:, :rep] * ks_ref[0, hk, 0][:, None] * lg_row[:, sl]
        lgS = jax.lax.dot_general(
            stk_ref[0, hk], qh, dn_t,
            preferred_element_type=jnp.int32).astype(jnp.float32)
        lgS = lgS[:, :rep] * stks_ref[0, hk, 0][:, None] * lg_row[:, sl]
        if softcap is not None:
            lgT = jnp.tanh(lgT / softcap) * softcap
            lgS = jnp.tanh(lgS / softcap) * softcap
        lgT = jnp.where(keep_m, lgT, -1e30)                      # [t, rep]
        lgS = jnp.where(keep_s, lgS, -1e30)                      # [c, rep]

        m = jnp.maximum(jnp.max(lgT, axis=0, keepdims=True),
                        jnp.max(lgS, axis=0, keepdims=True))     # [1, rep]
        p = jnp.exp(lgT - m)
        ps = jnp.exp(lgS - m)
        l = (jnp.sum(p, axis=0, keepdims=True)
             + jnp.sum(ps, axis=0, keepdims=True))               # [1, rep]

        # fold v_scale, row-quantize in the [rep, t] orientation (32-bit
        # transpose BEFORE the i8 conversion; 8-bit relayouts are hostile)
        pv = p * vs_ref[0, hk, 0][:, None]                       # [t, rep]
        s_p = (jnp.max(pv, axis=0, keepdims=True) + 1e-30).T     # [rep, 1]
        pvT = pv.T                                               # [rep, t]
        pv_i8 = jnp.clip(jnp.round(pvT * (127.0 / s_p)), 0, 127
                         ).astype(jnp.int8)
        pvs = ps * stvs_ref[0, hk, 0][:, None]
        s_ps = (jnp.max(pvs, axis=0, keepdims=True) + 1e-30).T
        pvs_i8 = jnp.clip(jnp.round(pvs.T * (127.0 / s_ps)), 0, 127
                          ).astype(jnp.int8)

        o_h = jax.lax.dot_general(
            pv_i8, v_ref[0, hk], dn_pv,
            preferred_element_type=jnp.int32).astype(jnp.float32) * s_p
        o_h = o_h + jax.lax.dot_general(
            pvs_i8, stv_ref[0, hk], dn_pv,
            preferred_element_type=jnp.int32).astype(jnp.float32) * s_ps
        # /127^2 for the p-row quant + v dequant
        outs.append(o_h / (l.T * (127.0 * 127.0)))               # [rep, d]
    out = jnp.concatenate(outs, axis=0) if h_kv > 1 else outs[0]
    o_ref[0] = out.reshape(h_kv, rep, d)


@functools.partial(jax.jit, static_argnames=("scale", "window",
                                             "kpos_start", "softcap",
                                             "interpret"))
def tm_decode_attention(q, k_q, k_scale, v_q, v_scale, off, *,
                        staged=None, scale, window=None, kpos_start=0,
                        softcap=None, interpret=None):
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
    kernel = functools.partial(_kernel, scale=float(scale), window=window,
                               kpos_start=kpos_start, softcap=softcap)
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
