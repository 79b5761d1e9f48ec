"""Fused flash-decode attention over int8 KV codes (Pallas, TPU).

One kernel per layer replaces the ~12-op XLA staged-attention chain
(QK/PV dot fusions at ~420 GB/s plus ~0.6 ms/step of staged-glue copies at
7B B=8 — kbench/fusion_breakdown). TPU-native design points:

* the KV codes are ALREADY int8, so both contractions run as native
  i8 x i8 -> i32 MXU dots — no dequant materialization, no convert near the
  big arrays, and none of the ~150-250 GB/s VPU elementwise wall
  (KERNEL_NOTES round-1) is ever touched. q is row-quantized to i8
  in-kernel ([H, D] — trivial); p is row-quantized with v_scale folded in,
  so the PV dot needs no per-token scale either.
* grid (B,): each cell holds ALL kv heads — mask/softmax/scale VPU work
  runs on [H, T] planes at full sublane utilization (a (B, H_kv) grid's
  [rep, T] rows used 1 of 8 sublanes and measured 3x slower,
  kbench/attn_probe variant A), while the per-head MXU dots unroll in-cell.
* the decode chunk's staged KV block (KVCache.begin_stage) joins as a
  second set of blocks with the uniform in-chunk mask ``j <= step`` and the
  main span cut at the pre-chunk boundary — same two-block softmax as
  models.layers.gqa_attention_kv_quant(staged=). The UNstaged decode step
  is the degenerate ``step = -1`` of the same program (the main mask
  becomes ``kpos <= off``; the dummy staged block is fully masked), so one
  kernel serves both.

Numerics: q/p row-quantization adds ~0.7% relative error on the attention
output (kbench/attn_probe) — the same class as the int8 KV quantization it
sits on; validated by the differential tests (tests/test_flash_decode.py)
and the on-TPU compiled gate (scripts/tpu_selftest.py).

Reference anchor: the reference has no attention at all (SURVEY §5
long-context); this kernel is mandate-driven (north-star decode configs),
the attention analog of its fused dequant-matmuls
(csrc/mps_bitsandbytes.mm:440-560).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_decode_attention"]


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
    lg_scale = q_s * (scale / (127.0 * 127.0))

    dn_nk = (((1,), (1,)), ((), ()))          # contract lanes of rhs [N, K]
    dn_kn = (((1,), (0,)), ((), ()))          # contract sublanes of rhs
    t = k_ref.shape[2]
    c = stk_ref.shape[2]

    def qk(kref, tt):
        rows = [jax.lax.dot_general(
            q_i8[hk * rep:(hk + 1) * rep], kref[0, hk], dn_nk,
            preferred_element_type=jnp.int32) for hk in range(h_kv)]
        return jnp.concatenate(rows, axis=0) if h_kv > 1 else rows[0]

    def bcast(s3, tt):                        # [H_kv, 1, tt] -> [H, tt]
        return jnp.broadcast_to(s3, (h_kv, rep, tt)).reshape(h, tt)

    lg = qk(k_ref, t).astype(jnp.float32) * lg_scale * bcast(ks_ref[0], t)
    if softcap is not None:
        lg = jnp.tanh(lg / softcap) * softcap
    kpos = kpos_start + jax.lax.broadcasted_iota(jnp.int32, (h, t), 1)
    keep = kpos <= off - step - 1             # pre-chunk region only
    if window is not None:
        keep &= kpos > off - window
    lg = jnp.where(keep, lg, -1e30)

    lg_st = (qk(stk_ref, c).astype(jnp.float32) * lg_scale
             * bcast(stks_ref[0], c))
    if softcap is not None:
        lg_st = jnp.tanh(lg_st / softcap) * softcap
    jst = jax.lax.broadcasted_iota(jnp.int32, (h, c), 1)
    keep_st = jst <= step
    if window is not None:
        keep_st &= jst > step - window
    lg_st = jnp.where(keep_st, lg_st, -1e30)

    # two-block online softmax
    m = jnp.maximum(jnp.max(lg, axis=-1, keepdims=True),
                    jnp.max(lg_st, axis=-1, keepdims=True))
    p = jnp.exp(lg - m)
    p_st = jnp.exp(lg_st - m)
    l = (jnp.sum(p, axis=-1, keepdims=True)
         + jnp.sum(p_st, axis=-1, keepdims=True))

    # PV: fold v_scale into p, row-quantize, i8 dots, rescale partials
    pv = p * bcast(vs_ref[0], t)
    s_p = jnp.max(pv, axis=-1, keepdims=True) + 1e-30
    pv_i8 = jnp.clip(jnp.round(pv * (127.0 / s_p)), 0, 127).astype(jnp.int8)
    pvs = p_st * bcast(stvs_ref[0], c)
    s_ps = jnp.max(pvs, axis=-1, keepdims=True) + 1e-30
    pvs_i8 = jnp.clip(jnp.round(pvs * (127.0 / s_ps)), 0, 127
                      ).astype(jnp.int8)

    outs = []
    for hk in range(h_kv):
        sl = slice(hk * rep, (hk + 1) * rep)
        o_h = jax.lax.dot_general(pv_i8[sl], v_ref[0, hk], dn_kn,
                                  preferred_element_type=jnp.int32
                                  ).astype(jnp.float32) * s_p[sl]
        o_h = o_h + jax.lax.dot_general(
            pvs_i8[sl], stv_ref[0, hk], dn_kn,
            preferred_element_type=jnp.int32).astype(jnp.float32) * s_ps[sl]
        outs.append(o_h)
    out = jnp.concatenate(outs, axis=0) if h_kv > 1 else outs[0]
    # /127 for the p-row quantization, /127 for the v-code dequant
    o_ref[0] = (out / (l * (127.0 * 127.0))).reshape(h_kv, rep, d)


@functools.partial(jax.jit, static_argnames=("scale", "window",
                                             "kpos_start", "softcap",
                                             "interpret"))
def flash_decode_attention(q, k_q, k_scale, v_q, v_scale, off, *,
                           staged=None, scale, window=None, kpos_start=0,
                           softcap=None, interpret=None):
    """Fused single-token attention over int8 KV.

    q [B, H, D] (any float dtype); k_q/v_q int8 [B, H_kv, T, D];
    k_scale/v_scale f32 [B, H_kv, T]; ``off`` i32 [B] — each slot's write
    position (the query's absolute position). ``staged``:
    (st_k, st_ks, st_v, st_vs, step) from KVCache.read_stage, or None for
    the plain decode step. Returns [B, H, D] f32.
    """
    bsz, h, d = q.shape
    h_kv, t = k_q.shape[1], k_q.shape[2]
    rep = h // h_kv
    if scale is None:
        scale = 1.0 / d ** 0.5
    if staged is None:
        # degenerate staged block: step=-1 masks it out entirely and turns
        # the main-span cut into the plain causal bound kpos <= off
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
    # scales as [B, H_kv, 1, T]: blocks keep a (1, T) trailing shape
    # (Pallas TPU wants the last two block dims to divide (8, 128) or
    # equal the array dims)
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
