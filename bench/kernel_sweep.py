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
    def f(*args):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(REPS):
            y = body(*args)
            acc = acc + y.astype(jnp.float32)[0, 0]
        return acc
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
