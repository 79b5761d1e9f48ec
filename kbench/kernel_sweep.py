"""Sweep fused-NF4-matmul kernel variants on real TPU hardware.

Measures per-kernel time with chained invocations inside one jit (the axon
tunnel adds ~400us per dispatch, which would swamp single-call timings).

Variants:
  A. current kernel (packed [N, K2], rhs transposed by Mosaic)
  B. transposed storage (packed [K2, N]) — natural MXU rhs layout
  C. transposed + gather decode (dynamic_gather via take_along_axis)
  D. transposed + bf16 LUT arithmetic
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import tpu_bitsandbytes.functional as F
from tpu_bitsandbytes.ops.lut import lut_select
from tpu_bitsandbytes.functional import NF4_CODEBOOK_NP

N = K = 4096
BS = 64
BS2 = BS // 2
REPS = 20


def timed(name, ff, args, per_call_work, iters=20):
    acc = ff(*args)
    jax.block_until_ready(acc)
    t0 = time.time()
    for _ in range(iters):
        acc = ff(*args)
    jax.block_until_ready(acc)
    per = (time.time() - t0) / iters / REPS
    print(f"{name}: {per*1e6:8.1f}us/matmul -> {per_call_work/per/1e9:6.0f} GB/s")
    return per


def chain(body):
    """Chain REPS kernel calls with a data dependency so XLA cannot CSE
    identical calls into one (pallas_calls are pure -> CSE-able)."""
    def f(a, b, c, d):
        y = None
        for _ in range(REPS):
            y = body(a, b, c, d)
            # tiny feedback: unique inputs per call + serialization
            a = a + y[: a.shape[0], : a.shape[1]].astype(a.dtype) * 1e-30
        return y
    return jax.jit(f)


def make_data(m):
    rng = np.random.default_rng(0)
    W = (rng.standard_normal((N, K)) * 0.02).astype(np.float32)
    packed, st = F.quantize_4bit(jnp.asarray(W), blocksize=BS)
    p2d = np.asarray(packed).reshape(N, K // 2)
    am = np.asarray(st.absmax).reshape(N, K // BS)
    x = rng.standard_normal((m, K)).astype(np.float32)
    Wd = np.asarray(F.dequantize_4bit(packed, st), np.float32)
    return p2d, am, x, Wd


WORK = N * K / 2 + N * K / BS * 4


# --- Variant B kernel: packed [K2, N] (transposed storage) -----------------
def kernel_T(xe_ref, xo_ref, w_ref, am_ref, out_ref, acc_ref, *, n_k, mxu_dtype,
             decode):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = w_ref[:].astype(jnp.int32)          # [K2_t, N_t]
    lo = w32 & 0x0F
    hi = w32 >> 4
    vlo = decode(lo)
    vhi = decode(hi)
    # absmax [am_t, N_t]; expand along sublanes via MXU:
    am_t, n_t = am_ref.shape
    k2_t = am_t * BS2
    sub_of = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 0) // BS2
    col = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 1)
    expand = (sub_of == col).astype(jnp.float32)
    scale = jax.lax.dot_general(expand, am_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    vlo = (vlo * scale).astype(mxu_dtype)
    vhi = (vhi * scale).astype(mxu_dtype)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        xe_ref[:].astype(mxu_dtype), vlo, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xo_ref[:].astype(mxu_dtype), vhi, dn, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def run_T(m, m_t, n_t, k2_t, decode_name, mxu_dtype=jnp.bfloat16):
    p2d, am, x, Wd = make_data(m)
    k2 = K // 2
    pT = jnp.asarray(np.ascontiguousarray(p2d.T))           # [K2, N]
    amT = jnp.asarray(np.ascontiguousarray(am.T))           # [nb, N]
    xp = np.zeros((max(m, m_t), K), np.float32)
    xp[:m] = x
    xe = jnp.asarray(xp[:, 0::2])
    xo = jnp.asarray(xp[:, 1::2])
    table = NF4_CODEBOOK_NP

    if decode_name == "select":
        decode = lambda c: lut_select(c, table, jnp.float32)
    elif decode_name == "select_bf16":
        decode = lambda c: lut_select(c, table, jnp.bfloat16).astype(jnp.float32)
    gm, gn, gk = xe.shape[0] // m_t, N // n_t, k2 // k2_t
    am_t = k2_t // BS2
    kern = functools.partial(kernel_T, n_k=gk, mxu_dtype=mxu_dtype, decode=decode)
    call = pl.pallas_call(
        kern,
        grid=(gm, gn, gk),
        in_specs=[
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((k2_t, n_t), lambda im, i, j: (j, i)),
            pl.BlockSpec((am_t, n_t), lambda im, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((m_t, n_t), lambda im, i, j: (im, i)),
        out_shape=jax.ShapeDtypeStruct((xe.shape[0], N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m_t, n_t), jnp.float32)],
    )
    body = lambda a, b, c, d: call(a, b, c, d)
    ff = chain(body)
    # correctness
    y = jax.jit(body)(xe, xo, pT, amT)
    md = np.abs(np.asarray(y)[:m] - x @ Wd.T).max()
    tag = f"B[{decode_name}] m={m} tiles=({m_t},{n_t},{k2_t})"
    if md > 0.1:
        print(f"{tag}: WRONG maxdiff={md}")
        return
    timed(tag + f" md={md:.3f}", ff, (xe, xo, pT, amT), WORK)


if __name__ == "__main__":
    for tiles in [(8, 256, 2048), (8, 512, 1024), (8, 1024, 512),
                  (8, 2048, 256), (8, 512, 2048), (8, 1024, 1024)]:
        try:
            run_T(1, *tiles, "select")
        except Exception as e:
            print(f"tiles={tiles}: FAIL {str(e).split(chr(10))[0][:120]}")


# --- Variant D kernels ------------------------------------------------------
def kernel_D1(xe_ref, xo_ref, w_ref, am_ref, out_ref, acc_ref, *, n_k):
    """Transposed storage + all-bf16 intermediates."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = w_ref[:].astype(jnp.int32)
    lo = w32 & 0x0F
    hi = w32 >> 4
    vlo = lut_select(lo, NF4_CODEBOOK_NP, jnp.bfloat16)
    vhi = lut_select(hi, NF4_CODEBOOK_NP, jnp.bfloat16)
    am_t, n_t = am_ref.shape
    k2_t = am_t * BS2
    sub_of = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 0) // BS2
    col = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 1)
    expand = (sub_of == col).astype(jnp.bfloat16)
    scale = jax.lax.dot_general(expand, am_ref[:].astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.bfloat16)
    vlo = vlo * scale
    vhi = vhi * scale
    dn = (((1,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        xe_ref[:], vlo, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xo_ref[:], vhi, dn, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def kernel_D2(xe_ref, xo_ref, w_ref, am_ref, out_ref, acc_ref, *, n_k):
    """Transposed + bf16 + NO scale tensor: per-block partial dots, absmax
    applied on the tiny [m, nblk, n] partials."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = w_ref[:].astype(jnp.int32)
    lo = w32 & 0x0F
    hi = w32 >> 4
    vlo = lut_select(lo, NF4_CODEBOOK_NP, jnp.bfloat16)
    vhi = lut_select(hi, NF4_CODEBOOK_NP, jnp.bfloat16)
    am_t, n_t = am_ref.shape
    k2_t = am_t * BS2
    m_t = xe_ref.shape[0]
    # reshape contraction into (blocks, bs2): batched dot over blocks
    vlo3 = vlo.reshape(am_t, BS2, n_t)
    vhi3 = vhi.reshape(am_t, BS2, n_t)
    xe3 = xe_ref[:].reshape(m_t, am_t, BS2)
    xo3 = xo_ref[:].reshape(m_t, am_t, BS2)
    # dims: batch am_t; contract bs2
    dnb = (((2,), (1,)), ((1,), (0,)))
    plo = jax.lax.dot_general(xe3, vlo3, dnb, preferred_element_type=jnp.float32)
    phi = jax.lax.dot_general(xo3, vhi3, dnb, preferred_element_type=jnp.float32)
    # p: [am_t, m_t, n_t]; scale by am [am_t, 1, n_t] then sum over blocks
    p = (plo + phi) * am_ref[:].reshape(am_t, 1, n_t)
    acc_ref[:] += jnp.sum(p, axis=0)

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def run_D(variant, m, m_t, n_t, k2_t, iters=20):
    p2d, am, x, Wd = make_data(m)
    k2 = K // 2
    pT = jnp.asarray(np.ascontiguousarray(p2d.T))
    amT = jnp.asarray(np.ascontiguousarray(am.T))
    xp = np.zeros((max(m, m_t), K), np.float32)
    xp[:m] = x
    xe = jnp.asarray(xp[:, 0::2], dtype=jnp.bfloat16)
    xo = jnp.asarray(xp[:, 1::2], dtype=jnp.bfloat16)
    gm, gn, gk = xe.shape[0] // m_t, N // n_t, k2 // k2_t
    am_t = k2_t // BS2
    kern = functools.partial(variant, n_k=gk)
    call = pl.pallas_call(
        kern,
        grid=(gm, gn, gk),
        in_specs=[
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((k2_t, n_t), lambda im, i, j: (j, i)),
            pl.BlockSpec((am_t, n_t), lambda im, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((m_t, n_t), lambda im, i, j: (im, i)),
        out_shape=jax.ShapeDtypeStruct((xe.shape[0], N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m_t, n_t), jnp.float32)],
    )
    body = lambda a, b, c, d: call(a, b, c, d)
    ff = chain(body)
    y = jax.jit(body)(xe, xo, pT, amT)
    md = np.abs(np.asarray(y)[:m] - x @ Wd.T).max()
    rel = md / np.abs(x @ Wd.T).max()
    tag = f"{variant.__name__} m={m} tiles=({m_t},{n_t},{k2_t})"
    if rel > 0.05:
        print(f"{tag}: WRONG reldiff={rel}")
        return
    timed(tag + f" rel={rel:.4f}", ff, (xe, xo, pT, amT), WORK, iters)


# --- Variant C: gather decode from a VMEM table scratch --------------------
def kernel_C(xe_ref, xo_ref, w_ref, am_ref, out_ref, acc_ref, tbl_ref, *, n_k,
             bf16: bool):
    ik = pl.program_id(2)
    first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (ik == 0))

    @pl.when(first)
    def _():
        k2_t, n_t = tbl_ref.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (k2_t, n_t), 1) % 128
        val = (lane == 0).astype(jnp.float32) * float(NF4_CODEBOOK_NP[0])
        for i in range(1, 16):
            val = val + (lane == i).astype(jnp.float32) * float(NF4_CODEBOOK_NP[i])
        tbl_ref[:] = val.astype(tbl_ref.dtype)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = w_ref[:].astype(jnp.int32)
    lo = w32 & 0x0F
    hi = w32 >> 4
    tbl = tbl_ref[:]
    vlo = jnp.take_along_axis(tbl, lo, axis=1)
    vhi = jnp.take_along_axis(tbl, hi, axis=1)
    am_t, n_t = am_ref.shape
    k2_t = am_t * BS2
    sub_of = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 0) // BS2
    col = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 1)
    expand = (sub_of == col).astype(jnp.float32)
    scale = jax.lax.dot_general(
        expand, am_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    mxu = jnp.bfloat16 if bf16 else jnp.float32
    vlo = (vlo.astype(jnp.float32) * scale).astype(mxu)
    vhi = (vhi.astype(jnp.float32) * scale).astype(mxu)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        xe_ref[:].astype(mxu), vlo, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xo_ref[:].astype(mxu), vhi, dn, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


# --- Variant E: bf16 everywhere, f32 accumulators ---------------------------
def kernel_E(xe_ref, xo_ref, w_ref, am_ref, out_ref, acc_ref, *, n_k):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = w_ref[:].astype(jnp.int32)
    lo = w32 & 0x0F
    hi = w32 >> 4
    vlo = lut_select(lo, NF4_CODEBOOK_NP, jnp.bfloat16)
    vhi = lut_select(hi, NF4_CODEBOOK_NP, jnp.bfloat16)
    am_t, n_t = am_ref.shape
    k2_t = am_t * BS2
    sub_of = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 0) // BS2
    col = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 1)
    expand = (sub_of == col).astype(jnp.bfloat16)
    scale = jax.lax.dot_general(
        expand, am_ref[:].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    vlo = vlo * scale
    vhi = vhi * scale
    dn = (((1,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        xe_ref[:], vlo, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xo_ref[:], vhi, dn, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def run_V(kern_name, m, m_t, n_t, k2_t, iters=20, tbl_dtype=jnp.float32,
          bf16=True):
    p2d, am, x, Wd = make_data(m)
    k2 = K // 2
    pT = jnp.asarray(np.ascontiguousarray(p2d.T))
    amT = jnp.asarray(np.ascontiguousarray(am.T))
    xp = np.zeros((max(m, m_t), K), np.float32)
    xp[:m] = x
    xe = jnp.asarray(xp[:, 0::2], dtype=jnp.bfloat16)
    xo = jnp.asarray(xp[:, 1::2], dtype=jnp.bfloat16)
    gm, gn, gk = xe.shape[0] // m_t, N // n_t, k2 // k2_t
    am_t = k2_t // BS2
    scratch = [pltpu.VMEM((m_t, n_t), jnp.float32)]
    if kern_name == "C":
        kern = functools.partial(kernel_C, n_k=gk, bf16=bf16)
        scratch.append(pltpu.VMEM((k2_t, n_t), tbl_dtype))
    else:
        kern = functools.partial(kernel_E, n_k=gk)
    call = pl.pallas_call(
        kern,
        grid=(gm, gn, gk),
        in_specs=[
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((k2_t, n_t), lambda im, i, j: (j, i)),
            pl.BlockSpec((am_t, n_t), lambda im, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((m_t, n_t), lambda im, i, j: (im, i)),
        out_shape=jax.ShapeDtypeStruct((xe.shape[0], N), jnp.float32),
        scratch_shapes=scratch,
    )
    body = lambda a, b, c, d: call(a, b, c, d)
    ff = chain(body)
    y = jax.jit(body)(xe, xo, pT, amT)
    ref = x @ Wd.T
    rel = np.abs(np.asarray(y)[:m] - ref).max() / np.abs(ref).max()
    tag = f"{kern_name} m={m} tiles=({m_t},{n_t},{k2_t})"
    if rel > 0.05:
        print(f"{tag}: WRONG reldiff={rel}")
        return
    timed(tag + f" rel={rel:.4f}", ff, (xe, xo, pT, amT), WORK, iters)


# --- Variant F: gather decode + bf16 operands, minimal VMEM traffic ---------
def kernel_F(xe_ref, xo_ref, w_ref, am_ref, out_ref, acc_ref, tbl_ref, *, n_k):
    ik = pl.program_id(2)
    first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (ik == 0))

    @pl.when(first)
    def _():
        k2_t, n_t = tbl_ref.shape
        lane = jax.lax.broadcasted_iota(jnp.int32, (k2_t, n_t), 1) % 128
        val = (lane == 0).astype(jnp.float32) * float(NF4_CODEBOOK_NP[0])
        for i in range(1, 16):
            val = val + (lane == i).astype(jnp.float32) * float(NF4_CODEBOOK_NP[i])
        tbl_ref[:] = val

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = w_ref[:].astype(jnp.int32)
    lo = w32 & 0x0F
    hi = w32 >> 4
    tbl = tbl_ref[:]
    am_t, n_t = am_ref.shape
    k2_t = am_t * BS2
    sub_of = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 0) // BS2
    col = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 1)
    expand = (sub_of == col).astype(jnp.float32)
    scale = jax.lax.dot_general(
        expand, am_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # gather in f32, scale in f32, single cast to bf16 per plane
    vlo = (jnp.take_along_axis(tbl, lo, axis=1) * scale).astype(jnp.bfloat16)
    vhi = (jnp.take_along_axis(tbl, hi, axis=1) * scale).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        xe_ref[:], vlo, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xo_ref[:], vhi, dn, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def run_F(m, m_t, n_t, k2_t, iters=20):
    p2d, am, x, Wd = make_data(m)
    k2 = K // 2
    pT = jnp.asarray(np.ascontiguousarray(p2d.T))
    amT = jnp.asarray(np.ascontiguousarray(am.T))
    xp = np.zeros((max(m, m_t), K), np.float32)
    xp[:m] = x
    xe = jnp.asarray(xp[:, 0::2], dtype=jnp.bfloat16)
    xo = jnp.asarray(xp[:, 1::2], dtype=jnp.bfloat16)
    gm, gn, gk = xe.shape[0] // m_t, N // n_t, k2 // k2_t
    am_t = k2_t // BS2
    kern = functools.partial(kernel_F, n_k=gk)
    call = pl.pallas_call(
        kern,
        grid=(gm, gn, gk),
        in_specs=[
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((k2_t, n_t), lambda im, i, j: (j, i)),
            pl.BlockSpec((am_t, n_t), lambda im, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((m_t, n_t), lambda im, i, j: (im, i)),
        out_shape=jax.ShapeDtypeStruct((xe.shape[0], N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m_t, n_t), jnp.float32),
                        pltpu.VMEM((k2_t, n_t), jnp.float32)],
    )
    body = lambda a, b, c, d: call(a, b, c, d)
    ff = chain(body)
    y = jax.jit(body)(xe, xo, pT, amT)
    ref = x @ Wd.T
    rel = np.abs(np.asarray(y)[:m] - ref).max() / np.abs(ref).max()
    tag = f"F m={m} tiles=({m_t},{n_t},{k2_t})"
    if rel > 0.05:
        print(f"{tag}: WRONG reldiff={rel}")
        return
    timed(tag + f" rel={rel:.4f}", ff, (xe, xo, pT, amT), WORK, iters)


# --- Variant G: f32, scale via 3D sublane-split reshape --------------------
def kernel_G(xe_ref, xo_ref, w_ref, am_ref, out_ref, acc_ref, *, n_k):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = w_ref[:].astype(jnp.int32)
    lo = w32 & 0x0F
    hi = w32 >> 4
    vlo = lut_select(lo, NF4_CODEBOOK_NP, jnp.float32)
    vhi = lut_select(hi, NF4_CODEBOOK_NP, jnp.float32)
    am_t, n_t = am_ref.shape
    k2_t = am_t * BS2
    am3 = am_ref[:].reshape(am_t, 1, n_t)
    vlo = (vlo.reshape(am_t, BS2, n_t) * am3).reshape(k2_t, n_t)
    vhi = (vhi.reshape(am_t, BS2, n_t) * am3).reshape(k2_t, n_t)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        xe_ref[:], vlo, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xo_ref[:], vhi, dn, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def run_G(m, m_t, n_t, k2_t, iters=20):
    p2d, am, x, Wd = make_data(m)
    k2 = K // 2
    pT = jnp.asarray(np.ascontiguousarray(p2d.T))
    amT = jnp.asarray(np.ascontiguousarray(am.T))
    xp = np.zeros((max(m, m_t), K), np.float32)
    xp[:m] = x
    xe = jnp.asarray(xp[:, 0::2])
    xo = jnp.asarray(xp[:, 1::2])
    gm, gn, gk = xe.shape[0] // m_t, N // n_t, k2 // k2_t
    am_t = k2_t // BS2
    kern = functools.partial(kernel_G, n_k=gk)
    call = pl.pallas_call(
        kern,
        grid=(gm, gn, gk),
        in_specs=[
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((k2_t, n_t), lambda im, i, j: (j, i)),
            pl.BlockSpec((am_t, n_t), lambda im, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((m_t, n_t), lambda im, i, j: (im, i)),
        out_shape=jax.ShapeDtypeStruct((xe.shape[0], N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m_t, n_t), jnp.float32)],
    )
    body = lambda a, b, c, d: call(a, b, c, d)
    ff = chain(body)
    y = jax.jit(body)(xe, xo, pT, amT)
    ref = x @ Wd.T
    rel = np.abs(np.asarray(y)[:m] - ref).max() / np.abs(ref).max()
    tag = f"G m={m} tiles=({m_t},{n_t},{k2_t})"
    if rel > 0.05:
        print(f"{tag}: WRONG reldiff={rel}")
        return
    timed(tag + f" rel={rel:.4f}", ff, (xe, xo, pT, amT), WORK, iters)


# --- Variant H: NO LUT (codes used raw) — isolates widen+write cost --------
def kernel_H(xe_ref, xo_ref, w_ref, am_ref, out_ref, acc_ref, *, n_k):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = w_ref[:].astype(jnp.int32)
    vlo = (w32 & 0x0F).astype(jnp.float32)
    vhi = (w32 >> 4).astype(jnp.float32)
    am_t, n_t = am_ref.shape
    k2_t = am_t * BS2
    sub_of = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 0) // BS2
    col = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 1)
    expand = (sub_of == col).astype(jnp.float32)
    scale = jax.lax.dot_general(
        expand, am_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    vlo = vlo * scale
    vhi = vhi * scale
    dn = (((1,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        xe_ref[:], vlo, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xo_ref[:], vhi, dn, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


# --- Variant H2: no LUT, no scale — pure widen+dot --------------------------
def kernel_H2(xe_ref, xo_ref, w_ref, am_ref, out_ref, acc_ref, *, n_k):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = w_ref[:].astype(jnp.int32)
    vlo = (w32 & 0x0F).astype(jnp.float32)
    vhi = (w32 >> 4).astype(jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        xe_ref[:], vlo, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xo_ref[:], vhi, dn, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def run_H(which, m, m_t, n_t, k2_t, iters=10):
    p2d, am, x, Wd = make_data(m)
    k2 = K // 2
    pT = jnp.asarray(np.ascontiguousarray(p2d.T))
    amT = jnp.asarray(np.ascontiguousarray(am.T))
    xp = np.zeros((max(m, m_t), K), np.float32)
    xp[:m] = x
    xe = jnp.asarray(xp[:, 0::2])
    xo = jnp.asarray(xp[:, 1::2])
    gm, gn, gk = xe.shape[0] // m_t, N // n_t, k2 // k2_t
    am_t = k2_t // BS2
    kern = functools.partial({"H": kernel_H, "H2": kernel_H2}[which], n_k=gk)
    call = pl.pallas_call(
        kern,
        grid=(gm, gn, gk),
        in_specs=[
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((k2_t, n_t), lambda im, i, j: (j, i)),
            pl.BlockSpec((am_t, n_t), lambda im, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((m_t, n_t), lambda im, i, j: (im, i)),
        out_shape=jax.ShapeDtypeStruct((xe.shape[0], N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m_t, n_t), jnp.float32)],
    )
    ff = chain(lambda a, b, c, d: call(a, b, c, d))
    timed(f"{which} m={m} tiles=({m_t},{n_t},{k2_t})", ff, (xe, xo, pT, amT),
          WORK, iters)


# --- Variant J: VPU matvec for M=1 decode ----------------------------------
# y[n] = sum_blocks am[b,n] * sum_{s in b} (xe[s]*cb[lo[s,n]] + xo[s]*cb[hi[s,n]])
# Decode chain stays in registers; two-stage sublane reduction applies the
# per-block scale at block granularity (no scale tensor, no MXU).
def kernel_J(xer_ref, xor_ref, w_ref, am_ref, out_ref, acc_ref, *, n_k,
             decode):
    ik = pl.program_id(0)   # k outer
    in_ = pl.program_id(1)  # n inner

    @pl.when((ik == 0) & (in_ == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = w_ref[:].astype(jnp.int32)        # [k2_t, 128]
    lo = w32 & 0x0F
    hi = w32 >> 4
    vlo = decode(lo)
    vhi = decode(hi)
    k2_t = w32.shape[0]
    am_t = k2_t // BS2
    contrib = vlo * xer_ref[:] + vhi * xor_ref[:]          # [k2_t, 128]
    per_block = jnp.sum(contrib.reshape(am_t, BS2, 128), axis=1)
    y = jnp.sum(per_block * am_ref[:], axis=0, keepdims=True)  # [1, 128]
    acc_ref[0:1, pl.ds(in_ * 128, 128)] += y

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[0:1, pl.ds(in_ * 128, 128)]


def run_J(m_t_unused=None, k2_t=2048, iters=10, decode_name="select"):
    m = 1
    p2d, am, x, Wd = make_data(m)
    k2 = K // 2
    pT = jnp.asarray(np.ascontiguousarray(p2d.T))
    amT = jnp.asarray(np.ascontiguousarray(am.T))
    # x replicated across 128 lanes: [k2, 128]
    xer = jnp.asarray(np.repeat(x[0, 0::2][:, None], 128, axis=1))
    xor = jnp.asarray(np.repeat(x[0, 1::2][:, None], 128, axis=1))
    gk, gn = k2 // k2_t, N // 128
    am_t = k2_t // BS2
    if decode_name == "select":
        decode = lambda c: lut_select(c, NF4_CODEBOOK_NP, jnp.float32)
    kern = functools.partial(kernel_J, n_k=gk, decode=decode)
    call = pl.pallas_call(
        kern,
        grid=(gk, gn),
        in_specs=[
            pl.BlockSpec((k2_t, 128), lambda ik, in_: (ik, 0)),
            pl.BlockSpec((k2_t, 128), lambda ik, in_: (ik, 0)),
            pl.BlockSpec((k2_t, 128), lambda ik, in_: (ik, in_)),
            pl.BlockSpec((am_t, 128), lambda ik, in_: (ik, in_)),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda ik, in_: (0, in_)),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, N), jnp.float32)],
    )
    body = lambda a, b, c, d: call(a, b, c, d)

    def f(a, b, c, d):
        y = None
        for _ in range(REPS):
            y = body(a, b, c, d)
            a = a + jnp.broadcast_to(y[0:1, 0:1], a.shape) * 1e-30
        return y
    ff = jax.jit(f)
    y = jax.jit(body)(xer, xor, pT, amT)
    ref = x @ Wd.T
    rel = np.abs(np.asarray(y)[0] - ref[0]).max() / np.abs(ref).max()
    tag = f"J k2_t={k2_t} [{decode_name}]"
    if rel > 0.05:
        print(f"{tag}: WRONG reldiff={rel}")
        return
    timed(tag + f" rel={rel:.4f}", ff, (xer, xor, pT, amT), WORK, iters)


# --- Variant K: VPU matvec + dynamic-gather decode --------------------------
def kernel_K(xer_ref, xor_ref, w_ref, am_ref, out_ref, acc_ref, tbl_ref, *,
             n_k):
    ik = pl.program_id(0)
    in_ = pl.program_id(1)

    @pl.when((ik == 0) & (in_ == 0))
    def _():
        k2_t = tbl_ref.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (k2_t, 128), 1) % 128
        val = (lane == 0).astype(jnp.float32) * float(NF4_CODEBOOK_NP[0])
        for i in range(1, 16):
            val = val + (lane == i).astype(jnp.float32) * float(NF4_CODEBOOK_NP[i])
        tbl_ref[:] = val

    @pl.when((ik == 0))
    def _():
        acc_ref[0:1, pl.ds(in_ * 128, 128)] = jnp.zeros((1, 128), jnp.float32)

    w32 = w_ref[:].astype(jnp.int32)
    lo = w32 & 0x0F
    hi = w32 >> 4
    tbl = tbl_ref[:]
    vlo = jnp.take_along_axis(tbl, lo, axis=1)
    vhi = jnp.take_along_axis(tbl, hi, axis=1)
    k2_t = w32.shape[0]
    am_t = k2_t // BS2
    contrib = vlo * xer_ref[:] + vhi * xor_ref[:]
    per_block = jnp.sum(contrib.reshape(am_t, BS2, 128), axis=1)
    y = jnp.sum(per_block * am_ref[:], axis=0, keepdims=True)
    acc_ref[0:1, pl.ds(in_ * 128, 128)] += y

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[0:1, pl.ds(in_ * 128, 128)]


def run_K(k2_t=2048, iters=10):
    m = 1
    p2d, am, x, Wd = make_data(m)
    k2 = K // 2
    pT = jnp.asarray(np.ascontiguousarray(p2d.T))
    amT = jnp.asarray(np.ascontiguousarray(am.T))
    xer = jnp.asarray(np.repeat(x[0, 0::2][:, None], 128, axis=1))
    xor = jnp.asarray(np.repeat(x[0, 1::2][:, None], 128, axis=1))
    gk, gn = k2 // k2_t, N // 128
    am_t = k2_t // BS2
    kern = functools.partial(kernel_K, n_k=gk)
    call = pl.pallas_call(
        kern,
        grid=(gk, gn),
        in_specs=[
            pl.BlockSpec((k2_t, 128), lambda ik, in_: (ik, 0)),
            pl.BlockSpec((k2_t, 128), lambda ik, in_: (ik, 0)),
            pl.BlockSpec((k2_t, 128), lambda ik, in_: (ik, in_)),
            pl.BlockSpec((am_t, 128), lambda ik, in_: (ik, in_)),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda ik, in_: (0, in_)),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, N), jnp.float32),
                        pltpu.VMEM((k2_t, 128), jnp.float32)],
    )
    body = lambda a, b, c, d: call(a, b, c, d)

    def f(a, b, c, d):
        y = None
        for _ in range(REPS):
            y = body(a, b, c, d)
            a = a + jnp.broadcast_to(y[0:1, 0:1], a.shape) * 1e-30
        return y
    ff = jax.jit(f)
    y = jax.jit(body)(xer, xor, pT, amT)
    ref = x @ Wd.T
    rel = np.abs(np.asarray(y)[0] - ref[0]).max() / np.abs(ref).max()
    if rel > 0.05:
        print(f"K k2_t={k2_t}: WRONG reldiff={rel}")
        return
    timed(f"K k2_t={k2_t} rel={rel:.4f}", ff, (xer, xor, pT, amT), WORK, iters)


# --- Variant L: all-16-bit decode pipeline ----------------------------------
# u8 -> i16 widen (half the relayout of i32), masks+selects in 16-bit
# (2x lanes/vreg), i16 mask -> bf16 convert is same-width (cheap), bf16 MXU.
def kernel_L(xe_ref, xo_ref, w_ref, am_ref, out_ref, acc_ref, *, n_k):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w16 = w_ref[:].astype(jnp.int16)
    # no 16-bit shifts on TPU: extract the high nibble by comparing the
    # masked byte against i<<4 instead of shifting
    lo = w16 & jnp.int16(0x0F)
    hi = w16 & jnp.int16(0xF0)

    def lut16(c, step):
        out = (c == jnp.int16(0)).astype(jnp.bfloat16) * jnp.bfloat16(
            NF4_CODEBOOK_NP[0])
        for i in range(1, 16):
            out = out + (c == jnp.int16(i * step)).astype(
                jnp.bfloat16) * jnp.bfloat16(NF4_CODEBOOK_NP[i])
        return out

    vlo = lut16(lo, 1)
    vhi = lut16(hi, 16)
    am_t, n_t = am_ref.shape
    k2_t = am_t * BS2
    sub_of = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 0) // BS2
    col = jax.lax.broadcasted_iota(jnp.int32, (k2_t, am_t), 1)
    expand = (sub_of == col).astype(jnp.float32)
    scale = jax.lax.dot_general(
        expand, am_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    vlo = vlo * scale
    vhi = vhi * scale
    dn = (((1,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        xe_ref[:], vlo, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xo_ref[:], vhi, dn, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def run_L(m, m_t, n_t, k2_t, iters=10):
    p2d, am, x, Wd = make_data(m)
    k2 = K // 2
    pT = jnp.asarray(np.ascontiguousarray(p2d.T))
    amT = jnp.asarray(np.ascontiguousarray(am.T))
    xp = np.zeros((max(m, m_t), K), np.float32)
    xp[:m] = x
    xe = jnp.asarray(xp[:, 0::2], dtype=jnp.bfloat16)
    xo = jnp.asarray(xp[:, 1::2], dtype=jnp.bfloat16)
    gm, gn, gk = xe.shape[0] // m_t, N // n_t, k2 // k2_t
    am_t = k2_t // BS2
    kern = functools.partial(kernel_L, n_k=gk)
    call = pl.pallas_call(
        kern,
        grid=(gm, gn, gk),
        in_specs=[
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((k2_t, n_t), lambda im, i, j: (j, i)),
            pl.BlockSpec((am_t, n_t), lambda im, i, j: (j, i)),
        ],
        out_specs=pl.BlockSpec((m_t, n_t), lambda im, i, j: (im, i)),
        out_shape=jax.ShapeDtypeStruct((xe.shape[0], N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m_t, n_t), jnp.float32)],
    )
    body = lambda a, b, c, d: call(a, b, c, d)
    ff = chain(body)
    y = jax.jit(body)(xe, xo, pT, amT)
    ref = x @ Wd.T
    rel = np.abs(np.asarray(y)[:m] - ref).max() / np.abs(ref).max()
    tag = f"L m={m} tiles=({m_t},{n_t},{k2_t})"
    if rel > 0.05:
        print(f"{tag}: WRONG reldiff={rel}")
        return
    timed(tag + f" rel={rel:.4f}", ff, (xe, xo, pT, amT), WORK, iters)


# --- Variant M: VPU matvec + cubic-polynomial decode ("af4" prototype) ------
# Measures the speed of an analytic codebook: v(c) = ((a c + b) c + d) c + e.
# Uses arbitrary coefficients (speed test only; af4 would fit them to N(0,1)).
def kernel_M(xer_ref, xor_ref, w_ref, am_ref, out_ref, acc_ref, *, n_k):
    ik = pl.program_id(0)
    in_ = pl.program_id(1)

    @pl.when(ik == 0)
    def _():
        acc_ref[0:1, pl.ds(in_ * 128, 128)] = jnp.zeros((1, 128), jnp.float32)

    w32 = w_ref[:].astype(jnp.int32)
    lo = (w32 & 0x0F).astype(jnp.float32)
    hi = (w32 >> 4).astype(jnp.float32)
    A_, B_, D_, E_ = 0.00317, -0.0431, 0.334, -1.02  # speed-test coefficients

    def poly(c):
        return ((A_ * c + B_) * c + D_) * c + E_

    vlo = poly(lo)
    vhi = poly(hi)
    k2_t = w32.shape[0]
    am_t = k2_t // BS2
    contrib = vlo * xer_ref[:] + vhi * xor_ref[:]
    per_block = jnp.sum(contrib.reshape(am_t, BS2, 128), axis=1)
    y = jnp.sum(per_block * am_ref[:], axis=0, keepdims=True)
    acc_ref[0:1, pl.ds(in_ * 128, 128)] += y

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[0:1, pl.ds(in_ * 128, 128)]


def run_M(k2_t=2048, iters=10):
    m = 1
    p2d, am, x, Wd = make_data(m)
    k2 = K // 2
    pT = jnp.asarray(np.ascontiguousarray(p2d.T))
    amT = jnp.asarray(np.ascontiguousarray(am.T))
    xer = jnp.asarray(np.repeat(x[0, 0::2][:, None], 128, axis=1))
    xor = jnp.asarray(np.repeat(x[0, 1::2][:, None], 128, axis=1))
    gk, gn = k2 // k2_t, N // 128
    am_t = k2_t // BS2
    kern = functools.partial(kernel_M, n_k=gk)
    call = pl.pallas_call(
        kern,
        grid=(gk, gn),
        in_specs=[
            pl.BlockSpec((k2_t, 128), lambda ik, in_: (ik, 0)),
            pl.BlockSpec((k2_t, 128), lambda ik, in_: (ik, 0)),
            pl.BlockSpec((k2_t, 128), lambda ik, in_: (ik, in_)),
            pl.BlockSpec((am_t, 128), lambda ik, in_: (ik, in_)),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda ik, in_: (0, in_)),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, N), jnp.float32)],
    )
    body = lambda a, b, c, d: call(a, b, c, d)

    def f(a, b, c, d):
        y = None
        for _ in range(REPS):
            y = body(a, b, c, d)
            a = a + jnp.broadcast_to(y[0:1, 0:1], a.shape) * 1e-30
        return y
    ff = jax.jit(f)
    y = ff(xer, xor, pT, amT); jax.block_until_ready(y)
    timed(f"M(poly-af4) k2_t={k2_t}", ff, (xer, xor, pT, amT), WORK, iters)
