"""Probe: Mosaic (Pallas TPU) int4 operand support for the decode matmul.

kbench/int4_probe measured XLA s8 x s4 -> s32 dots streaming packed int4
at ~900 GB/s effective — 2.9x the shipped int8 cache per param. XLA can
only use a per-ROW scale epilogue (int4-linear per row is numerically
unusable); per-K-block scales need partial-scale accumulation inside a
kernel. The W4A8 Pallas kernel already has exactly that structure, but
its VPU nibble-decode pins it to ~80 GB/s. If Mosaic can dot s4 refs
DIRECTLY (MXU s4 ingest, zero VPU work per element), the same kernel
structure runs at the XLA byte rate -> an int4 runtime cache.

Stages probed independently (any may be unsupported by Mosaic):
  1. s4 VMEM ref as a pallas_call input (BlockSpec-streamed)
  2. lax.dot_general(s8, s4) -> s32 inside the kernel
  3. fallback: s4 -> s8 convert in-kernel, then s8 dot

Run: python -m kbench.s4_pallas_probe
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

M, N, K = 8, 22016, 4096
BS = 64                     # quant block on K
N_T = 512                   # grid tile


def _kernel_dot4(x_ref, w_ref, s_ref, o_ref, *, direct: bool):
    """Per-absmax-block s8 x s4 dots, f32 scale on the [M, N_t] partials."""
    w = w_ref[:]                      # [N_t, K] s4
    if not direct:
        w = w.astype(jnp.int8)
    x = x_ref[:]                      # [M, K] s8
    dn = (((1,), (1,)), ((), ()))
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    nblk = K // BS
    for b in range(nblk):
        sl = slice(b * BS, (b + 1) * BS)
        p = jax.lax.dot_general(x[:, sl], w[:, sl], dn,
                                preferred_element_type=jnp.int32)
        acc = acc + p.astype(jnp.float32) * s_ref[b, :][None, :]
    o_ref[:] = acc


def run(direct: bool):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-8, 8, (N, K)), jnp.int8)
    w4 = jax.jit(lambda w: w.astype(jnp.int4))(w8)
    scales = jnp.asarray(rng.uniform(0.5, 1.5, (K // BS, N)), jnp.float32)

    @jax.jit
    def call(x, w4, scales):
        return pl.pallas_call(
            functools.partial(_kernel_dot4, direct=direct),
            grid=(N // N_T,),
            in_specs=[
                pl.BlockSpec((M, K), lambda i: (0, 0)),
                pl.BlockSpec((N_T, K), lambda i: (i, 0)),
                pl.BlockSpec((K // BS, N_T), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((M, N_T), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        )(x, w4, scales)

    tag = "direct s4 dot" if direct else "s4->s8 convert then dot"
    try:
        out = call(x, w4, scales)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{tag}: UNSUPPORTED — {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")
        return
    # correctness vs jnp
    ref = jnp.zeros((M, N), jnp.float32)
    xw = x.astype(jnp.float32) @ w8.astype(jnp.float32).T
    # recompute blockwise for the scale
    ref = sum((x[:, b*BS:(b+1)*BS].astype(jnp.float32)
               @ w8[:, b*BS:(b+1)*BS].astype(jnp.float32).T)
              * scales[b][None, :] for b in range(K // BS))
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    # timing: chain via 3 distinct weights to avoid cache artifacts
    ws = [jax.jit(lambda w: w.astype(jnp.int4))(
        jnp.asarray(rng.integers(-8, 8, (N, K)), jnp.int8))
        for _ in range(3)]

    @jax.jit
    def chain(x, scales, *ws):
        outs = [call.__wrapped__(x, w, scales) for w in ws]
        return sum(o[0, 0] for o in outs), outs[-1]

    jax.block_until_ready(chain(x, scales, *ws))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(x, scales, *ws))
        ts.append((time.perf_counter() - t0) / len(ws))
    t = float(np.median(ts))
    gb = (N * K / 2) / t / 1e9
    print(f"{tag}: OK  rel_err {err:.2e}  {t*1e6:7.1f} us/matmul wall  "
          f"{gb:6.0f} GB/s on packed bytes")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    run(direct=True)
    run(direct=False)
