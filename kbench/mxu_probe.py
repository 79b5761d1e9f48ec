"""Round-2 MXU ingest probe: bf16 vs int8 vs W4A8 contraction at decode shapes.

Methodology (v2): chain the matmul through NREPS *distinct* weights, output
feeding the next input — exactly the shape of a real transformer decode step.
Distinct weights defeat VMEM residency and any CSE/collapse of the chain
(the single-feedback-scalar chaining used in round 1 was found to collapse:
wall time did not scale with chain length).

Run on the real chip:  python -m kbench.mxu_probe
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_bitsandbytes.functional import NF4_CODEBOOK_NP

M = 8
N = K = 4096
NREPS = 20   # distinct weights chained (168MB packed / 671MB bf16 in HBM)
ITERS = 10

NF4_I8 = np.round(NF4_CODEBOOK_NP * 127.0).astype(np.int32)


def timed(name, f, x, ws, bytes_per_matmul):
    y = f(x, ws)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(ITERS):
        y = f(x, ws)
    jax.block_until_ready(y)
    per = (time.time() - t0) / ITERS / NREPS
    print(f"{name:46s}: {per*1e6:8.1f} us/matmul   "
          f"{bytes_per_matmul/per/1e9:7.1f} GB/s eff")
    return per


# ---------------- chains ----------------

def chain_bf16(x, ws):
    for w in ws:
        y = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        x = y.astype(jnp.bfloat16)[:, :K]
    return x


def _requant_i8(y):
    """f32/i32 [M,N] -> int8 activations for the next layer."""
    s = jnp.max(jnp.abs(y), axis=-1, keepdims=True) + 1e-6
    return jnp.clip(jnp.round(y / s * 127.0), -127, 127).astype(jnp.int8)


def chain_i8_xla(x, ws):
    for w in ws:
        y = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        x = _requant_i8(y.astype(jnp.float32))[:, :K]
    return x


# ---------------- Pallas int8 kernel, scale on partials ----------------

def _i8_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc_ref[:] += p.astype(jnp.float32) * s_ref[pl.ds(ik, 1), :]

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("m_t", "n_t", "k_t"))
def pallas_i8(x, w, scales, m_t=8, n_t=256, k_t=512):
    m, k = x.shape
    n = w.shape[0]
    gm, gn, gk = m // m_t, n // n_t, k // k_t
    return pl.pallas_call(
        functools.partial(_i8_kernel, n_k=gk),
        grid=(gm, gn, gk),
        in_specs=[
            pl.BlockSpec((m_t, k_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((n_t, k_t), lambda im, i, j: (i, j)),
            pl.BlockSpec((gk, n_t), lambda im, i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((m_t, n_t), lambda im, i, j: (im, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m_t, n_t), jnp.float32)],
    )(x, w, scales)


# ---------------- Pallas W4A8: in-kernel nf4->i8 decode + i8 dot ----------

def _w4a8_kernel(xe_ref, xo_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = w_ref[:].astype(jnp.int32)
    lo = w32 & 0x0F
    hi = w32 >> 4
    clo = jnp.full_like(lo, int(NF4_I8[0]))
    chi = jnp.full_like(hi, int(NF4_I8[0]))
    for i in range(1, 16):
        v = int(NF4_I8[i])
        clo = jnp.where(lo == i, v, clo)
        chi = jnp.where(hi == i, v, chi)
    clo8 = clo.astype(jnp.int8)
    chi8 = chi.astype(jnp.int8)
    dn = (((1,), (1,)), ((), ()))
    p = jax.lax.dot_general(xe_ref[:], clo8, dn,
                            preferred_element_type=jnp.int32)
    p += jax.lax.dot_general(xo_ref[:], chi8, dn,
                             preferred_element_type=jnp.int32)
    acc_ref[:] += p.astype(jnp.float32) * s_ref[pl.ds(ik, 1), :]

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("m_t", "n_t", "k2_t"))
def pallas_w4a8(xe, xo, packed, scales, m_t=8, n_t=256, k2_t=512):
    m, k2 = xe.shape
    n = packed.shape[0]
    gm, gn, gk = m // m_t, n // n_t, k2 // k2_t
    return pl.pallas_call(
        functools.partial(_w4a8_kernel, n_k=gk),
        grid=(gm, gn, gk),
        in_specs=[
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((m_t, k2_t), lambda im, i, j: (im, j)),
            pl.BlockSpec((n_t, k2_t), lambda im, i, j: (i, j)),
            pl.BlockSpec((gk, n_t), lambda im, i, j: (0, i)),
        ],
        out_specs=pl.BlockSpec((m_t, n_t), lambda im, i, j: (im, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m_t, n_t), jnp.float32)],
    )(xe, xo, packed, scales)


# ---------------- round-1 production kernel for comparison ----------------

def chain_fused_bf16(x, ws):
    """Round-1 production path: fused NF4->bf16 decode + bf16 MXU."""
    from tpu_bitsandbytes.ops.matmul4bit import fused_matmul_4bit
    from tpu_bitsandbytes.functional import QuantState
    for packed, am in ws:
        qs = QuantState(absmax=am.reshape(-1), shape=(N, K), blocksize=64,
                        quant_type="nf4", dtype=jnp.bfloat16)
        y = fused_matmul_4bit(x, packed.reshape(-1), qs,
                              mxu_dtype=jnp.bfloat16)
        x = y.astype(jnp.bfloat16)[:, :K]
    return x


def main():
    print(f"devices: {jax.devices()}  M={M} N=K={N} chain={NREPS}")
    rng = np.random.default_rng(0)

    x_bf = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)
    x_i8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)

    # bf16 XLA (weights from HBM)
    ws_bf = [jnp.asarray(rng.standard_normal((N, K)) * 0.02, jnp.bfloat16)
             for _ in range(NREPS)]
    timed("XLA bf16 dot (HBM weights)", jax.jit(chain_bf16), x_bf, ws_bf,
          N * K * 2)
    del ws_bf

    # int8 XLA
    ws_i8 = [jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
             for _ in range(NREPS)]
    timed("XLA int8 dot -> i32 (HBM weights)", jax.jit(chain_i8_xla),
          x_i8, ws_i8, N * K)

    # Pallas int8 + partial scales
    for k_t in (512, 1024):
        sc = jnp.asarray(rng.uniform(0.5, 1.5, (K // k_t, N)), jnp.float32)

        def ch(x, ws, k_t=k_t, sc=sc):
            for w in ws:
                y = pallas_i8(x, w, sc, k_t=k_t)
                x = _requant_i8(y)[:, :K]
            return x
        timed(f"Pallas i8 + partial scales (k_t={k_t})", jax.jit(ch),
              x_i8, ws_i8, N * K)
    del ws_i8

    # Pallas W4A8
    ws_p = [jnp.asarray(rng.integers(0, 256, (N, K // 2)), jnp.uint8)
            for _ in range(NREPS)]
    for k2_t in (256, 512, 1024):
        sc = jnp.asarray(
            rng.uniform(0.5, 1.5, (K // 2 // k2_t, N)), jnp.float32)

        def ch(x, ws, k2_t=k2_t, sc=sc):
            for w in ws:
                y = pallas_w4a8(x[:, 0::2], x[:, 1::2], w, sc, k2_t=k2_t)
                x = _requant_i8(y)[:, :K]
            return x
        timed(f"Pallas W4A8 decode+i8 dot (k2_t={k2_t})", jax.jit(ch),
              x_i8, ws_p, N * K // 2)
    del ws_p

    # round-1 production fused kernel
    from tpu_bitsandbytes import functional as F
    ws_f = []
    for _ in range(NREPS):
        w = jnp.asarray(rng.standard_normal((N, K)) * 0.02, jnp.float32)
        packed, st = F.quantize_4bit(w, blocksize=64)
        ws_f.append((jnp.asarray(packed).reshape(N, K // 2),
                     jnp.asarray(st.absmax).reshape(N, K // 64)))
    timed("round-1 fused NF4->bf16 (production)", jax.jit(chain_fused_bf16),
          x_bf, ws_f, N * K // 2)


if __name__ == "__main__":
    main()
