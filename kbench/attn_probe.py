"""Fused flash-decode attention kernel probe (VERDICT r2 #2: the decode
residue). The XLA staged-attention chain costs ~2.0 ms/step at 7B B=8
span-256 (kbench/fusion_breakdown: QK/PV fusions at ~420 GB/s + ~0.6 ms of
staged-glue copies) against a 0.65 ms KV-read roofline, and scales with B —
it is why B=32 sits at 48%.

Design measured here: one Pallas kernel per layer, grid (B, H_kv):
  * q row-quantized to i8 in-kernel (tiny [rep, D] VPU work)
  * QK as i8 x i8 -> i32 MXU dot (KV codes are ALREADY int8 — no convert
    anywhere near the big arrays; the ~150-250 GB/s VPU convert wall from
    KERNEL_NOTES never enters)
  * logits scaled by q_s * k_scale[t] * scale/127^2 on the [rep, T] output
  * causal/window mask from iota vs a scalar-prefetched offset
  * two-block online softmax over (main span, staged chunk block)
  * PV: fold v_scale into p, row-quantize p*vs to i8, i8 x i8 -> i32 dot,
    rescale partials — all f32/VPU work is on logits-sized arrays only
Run: python -m kbench.attn_probe [--batch 8] [--span 256]
"""

import argparse
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kbench.probe2 import profile


def _attn_kernel_b(off_ref, step_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                   stk_ref, stks_ref, stv_ref, stvs_ref, o_ref, *,
                   scale: float, window, kpos_start: int, softcap):
    """Variant B: grid (B,) — one cell per slot, ALL kv heads in-cell.

    Softmax/mask/scale VPU work runs on [H_kv*rep, T] planes (full sublane
    utilization — variant A's [rep, T] rows used 1 of 8 sublanes); the
    per-head i8 MXU dots unroll over kv heads writing [rep, T] rows into
    the logits plane. k/v stream 2x H*T*D bytes per cell (8 cells vs 256),
    so the DMA pipeline has real block sizes to work with.
    """
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

    dn_nk = (((1,), (1,)), ((), ()))
    dn_kn = (((1,), (0,)), ((), ()))
    t = k_ref.shape[2]
    c = stk_ref.shape[2]

    def qk(kref, tt):
        rows = []
        for hk in range(h_kv):
            lg_h = jax.lax.dot_general(
                q_i8[hk * rep:(hk + 1) * rep], kref[0, hk], dn_nk,
                preferred_element_type=jnp.int32)          # [rep, tt]
            rows.append(lg_h)
        return jnp.concatenate(rows, axis=0) if h_kv > 1 else rows[0]

    ks = ks_ref[0]                              # [H_kv, 1, T]
    ks_h = jnp.broadcast_to(ks, (h_kv, rep, t)).reshape(h, t)
    lg = (qk(k_ref, t).astype(jnp.float32)
          * (q_s * (scale / (127.0 * 127.0))) * ks_h)       # [H, T]
    if softcap is not None:
        lg = jnp.tanh(lg / softcap) * softcap
    kpos = kpos_start + jax.lax.broadcasted_iota(jnp.int32, (h, t), 1)
    keep = kpos <= off - step - 1
    if window is not None:
        keep &= kpos > off - window
    lg = jnp.where(keep, lg, -1e30)

    stks = stks_ref[0]
    stks_h = jnp.broadcast_to(stks, (h_kv, rep, c)).reshape(h, c)
    lg_st = (qk(stk_ref, c).astype(jnp.float32)
             * (q_s * (scale / (127.0 * 127.0))) * stks_h)  # [H, C]
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

    vs = vs_ref[0]
    pv = p * jnp.broadcast_to(vs, (h_kv, rep, t)).reshape(h, t)
    s_p = jnp.max(pv, axis=-1, keepdims=True) + 1e-30
    pv_i8 = jnp.clip(jnp.round(pv * (127.0 / s_p)), 0, 127).astype(jnp.int8)
    stvs = stvs_ref[0]
    pvs = p_st * jnp.broadcast_to(stvs, (h_kv, rep, c)).reshape(h, c)
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
            preferred_element_type=jnp.int32
        ).astype(jnp.float32) * s_ps[sl]
        outs.append(o_h)
    out = jnp.concatenate(outs, axis=0) if h_kv > 1 else outs[0]
    o_ref[0] = (out / (l * (127.0 * 127.0))).reshape(h_kv, rep, d)


def _attn_kernel(off_ref, step_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                 stk_ref, stks_ref, stv_ref, stvs_ref, o_ref, *,
                 scale: float, window, kpos_start: int, softcap):
    """Grid (B, H_kv). Blocks: q [1,1,rep,D]; k/v [1,1,T,D] i8; scales
    [1,1,T]; staged [1,1,C,D]/[1,1,C]; out [1,1,rep,D] f32.
    off_ref/step_ref are scalar-prefetch (SMEM): off [B], step [1]."""
    b = pl.program_id(0)
    off = off_ref[b]                      # this slot's write position
    step = step_ref[0]
    q = q_ref[0, 0].astype(jnp.float32)   # [rep, D]
    rep = q.shape[0]

    # in-kernel q row quantization (i8 MXU operand)
    q_s = jnp.max(jnp.abs(q), axis=-1, keepdims=True) + 1e-9   # [rep, 1]
    q_i8 = jnp.clip(jnp.round(q * (127.0 / q_s)), -127, 127).astype(jnp.int8)

    dn_nk = (((1,), (1,)), ((), ()))      # contract lanes of rhs [N, K]
    k = k_ref[0, 0]                       # [T, D] i8
    t = k.shape[0]
    lg = jax.lax.dot_general(q_i8, k, dn_nk,
                             preferred_element_type=jnp.int32)  # [rep, T]
    ks = ks_ref[0, 0]                     # [1, T]
    lg = (lg.astype(jnp.float32) * (q_s * (scale / (127.0 * 127.0)))
          * ks)
    if softcap is not None:
        lg = jnp.tanh(lg / softcap) * softcap

    kpos = kpos_start + jax.lax.broadcasted_iota(jnp.int32, (rep, t), 1)
    keep = kpos <= off - step - 1         # pre-chunk region only
    if window is not None:
        keep &= kpos > off - window
    lg = jnp.where(keep, lg, -1e30)

    stk = stk_ref[0, 0]                   # [C, D] i8
    c = stk.shape[0]
    lg_st = jax.lax.dot_general(q_i8, stk, dn_nk,
                                preferred_element_type=jnp.int32)
    stks = stks_ref[0, 0]                 # [1, C]
    lg_st = (lg_st.astype(jnp.float32) * (q_s * (scale / (127.0 * 127.0)))
             * stks)
    if softcap is not None:
        lg_st = jnp.tanh(lg_st / softcap) * softcap
    jst = jax.lax.broadcasted_iota(jnp.int32, (rep, c), 1)
    keep_st = jst <= step
    if window is not None:
        keep_st &= jst > step - window
    lg_st = jnp.where(keep_st, lg_st, -1e30)

    # two-block online softmax
    m = jnp.maximum(jnp.max(lg, axis=-1, keepdims=True),
                    jnp.max(lg_st, axis=-1, keepdims=True))    # [rep, 1]
    p = jnp.exp(lg - m)
    p_st = jnp.exp(lg_st - m)
    l = (jnp.sum(p, axis=-1, keepdims=True)
         + jnp.sum(p_st, axis=-1, keepdims=True))              # [rep, 1]

    # PV: fold v_scale into p, row-quantize, i8 dot, rescale
    dn_kn = (((1,), (0,)), ((), ()))      # contract sublanes of rhs [K, N]
    pv = p * vs_ref[0, 0]                                       # [rep, T]
    s_p = jnp.max(pv, axis=-1, keepdims=True) + 1e-30
    pv_i8 = jnp.clip(jnp.round(pv * (127.0 / s_p)), 0, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(pv_i8, v_ref[0, 0], dn_kn,
                              preferred_element_type=jnp.int32
                              ).astype(jnp.float32) * s_p      # [rep, D]
    pvs = p_st * stvs_ref[0, 0]
    s_ps = jnp.max(pvs, axis=-1, keepdims=True) + 1e-30
    pvs_i8 = jnp.clip(jnp.round(pvs * (127.0 / s_ps)), 0, 127
                      ).astype(jnp.int8)
    acc = acc + jax.lax.dot_general(pvs_i8, stv_ref[0, 0], dn_kn,
                                    preferred_element_type=jnp.int32
                                    ).astype(jnp.float32) * s_ps
    # /127 for the p-row quantization, /127 for the v-code dequant
    o_ref[0, 0] = acc / (l * (127.0 * 127.0))


@functools.partial(jax.jit, static_argnames=("scale", "window",
                                             "kpos_start", "softcap"))
def flash_decode_b(q, k_q, k_scale, v_q, v_scale, stk, stks, stv, stvs,
                   off, step, *, scale, window=None, kpos_start=0,
                   softcap=None):
    """Variant B: grid (B,), whole-head cells."""
    bsz, h, d = q.shape
    h_kv, t = k_q.shape[1], k_q.shape[2]
    c = stk.shape[2]
    rep = h // h_kv
    qg = q.reshape(bsz, h_kv, rep, d)
    ks4 = k_scale[:, :, None, :]
    vs4 = v_scale[:, :, None, :]
    stks4 = stks[:, :, None, :]
    stvs4 = stvs[:, :, None, :]
    kernel = functools.partial(_attn_kernel_b, scale=scale, window=window,
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
        out_specs=pl.BlockSpec((1, h_kv, rep, d), lambda i, *_: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h_kv, rep, d), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(off, step[None], qg, k_q, ks4, v_q, vs4, stk, stks4, stv, stvs4)
    return out.reshape(bsz, h, d)


@functools.partial(jax.jit, static_argnames=("scale", "window",
                                             "kpos_start", "softcap"))
def flash_decode(q, k_q, k_scale, v_q, v_scale, stk, stks, stv, stvs,
                 off, step, *, scale, window=None, kpos_start=0,
                 softcap=None):
    """q [B,H,D] bf16; k_q/v_q s8 [B,Hkv,T,D]; scales f32 [B,Hkv,T];
    staged s8 [B,Hkv,C,D] / f32 [B,Hkv,C]; off i32 [B]; step i32 scalar.
    Returns [B,H,D] f32."""
    bsz, h, d = q.shape
    h_kv, t = k_q.shape[1], k_q.shape[2]
    c = stk.shape[2]
    rep = h // h_kv
    qg = q.reshape(bsz, h_kv, rep, d)
    # scales as [B, H_kv, 1, T] so blocks keep a (1, T) trailing shape
    # (Pallas TPU: last two block dims must divide (8, 128) or equal the
    # array dims)
    ks4 = k_scale[:, :, None, :]
    vs4 = v_scale[:, :, None, :]
    stks4 = stks[:, :, None, :]
    stvs4 = stvs[:, :, None, :]
    kernel = functools.partial(_attn_kernel, scale=scale, window=window,
                               kpos_start=kpos_start, softcap=softcap)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, h_kv),
        in_specs=[
            pl.BlockSpec((1, 1, rep, d), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, t), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, t), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, c, d), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, c), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, c, d), lambda i, j, *_: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, c), lambda i, j, *_: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, d), lambda i, j, *_: (i, j, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h_kv, rep, d), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(off, step[None], qg, k_q, ks4, v_q, vs4, stk, stks4, stv, stvs4)
    return out.reshape(bsz, h, d)


def reference(q, k_q, k_scale, v_q, v_scale, stk, stks, stv, stvs, off,
              step, *, scale, window=None, kpos_start=0, softcap=None):
    """The production XLA path (models.layers.gqa_attention_kv_quant)."""
    from tpu_bitsandbytes.models.layers import gqa_attention_kv_quant
    out = gqa_attention_kv_quant(
        q[:, None], k_q, k_scale, v_q, v_scale,
        causal_offset=off[:, None], scale=scale, window=window,
        kpos_start=kpos_start, softcap=softcap,
        staged=(stk, stks, stv, stvs, step))
    return out[:, 0]


def make_inputs(rng, bsz, h, h_kv, d, t, c):
    q = jnp.asarray(rng.standard_normal((bsz, h, d)) * 0.3, jnp.bfloat16)
    k_q = jnp.asarray(rng.integers(-127, 128, (bsz, h_kv, t, d)), jnp.int8)
    v_q = jnp.asarray(rng.integers(-127, 128, (bsz, h_kv, t, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.5, 2.0, (bsz, h_kv, t)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.5, 2.0, (bsz, h_kv, t)), jnp.float32)
    stk = jnp.asarray(rng.integers(-127, 128, (bsz, h_kv, c, d)), jnp.int8)
    stv = jnp.asarray(rng.integers(-127, 128, (bsz, h_kv, c, d)), jnp.int8)
    stks = jnp.asarray(rng.uniform(0.5, 2.0, (bsz, h_kv, c)), jnp.float32)
    stvs = jnp.asarray(rng.uniform(0.5, 2.0, (bsz, h_kv, c)), jnp.float32)
    off = jnp.asarray(rng.integers(t // 2, t, (bsz,)), jnp.int32)
    step = jnp.int32(c // 2)
    return q, k_q, ks, v_q, vs, stk, stks, stv, stvs, off, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--span", type=int, default=256)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--reps", type=int, default=32)
    args = ap.parse_args()
    d = 128
    rng = np.random.default_rng(0)
    inputs = make_inputs(rng, args.batch, args.heads, args.kv_heads, d,
                         args.span, args.chunk)
    sc = 1.0 / np.sqrt(d)

    # correctness
    ref = np.asarray(reference(*inputs, scale=sc), np.float32)
    denom = np.abs(ref).max() + 1e-9
    for name, fn in (("A", flash_decode), ("B", flash_decode_b)):
        got = np.asarray(fn(*inputs, scale=sc))
        err = np.abs(got - ref).max() / denom
        print(f"[{name}] rel max err vs XLA staged path: {err:.3e}")
        gw = np.asarray(fn(*inputs, scale=sc, window=64))
        rw = np.asarray(reference(*inputs, scale=sc, window=64), np.float32)
        errw = np.abs(gw - rw).max() / (np.abs(rw).max() + 1e-9)
        print(f"[{name}] rel max err (window=64):        {errw:.3e}")

    if jax.default_backend() != "tpu":
        print("cpu interpret mode: skipping timing", file=sys.stderr)
        return

    # timing: chain layers like a decode step does (data dependency via q)
    n = args.reps
    ks = [make_inputs(np.random.default_rng(i), args.batch, args.heads,
                      args.kv_heads, d, args.span, args.chunk)
          for i in range(n)]
    kv_bytes = (2 * args.batch * args.kv_heads * (args.span + args.chunk)
                * d + 8 * args.batch * args.kv_heads
                * (args.span + args.chunk))

    def chain(fn):
        def run(q0, packs):
            q = q0
            for p in packs:
                o = fn(q, *p[1:], scale=sc)
                q = (q0 + o.astype(jnp.bfloat16) * 1e-3)
            return q
        return run

    q0 = inputs[0]
    profile(f"pallas flash A (B,H) B={args.batch} span={args.span}",
            lambda: jax.jit(chain(flash_decode))(q0, ks), kv_bytes, n)
    profile(f"pallas flash B (B,)  B={args.batch} span={args.span}",
            lambda: jax.jit(chain(flash_decode_b))(q0, ks), kv_bytes, n)
    profile(f"XLA staged path      B={args.batch} span={args.span}",
            lambda: jax.jit(chain(reference))(q0, ks), kv_bytes, n)


if __name__ == "__main__":
    main()
