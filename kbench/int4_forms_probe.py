"""Probe: int4-cache dot formulations that admit usable quantization scales.

kbench/int4_probe: XLA streams s4 weights at the full HBM byte rate
(W4A16 613 GB/s, W4A8 ~900 GB/s effective on packed bytes) — but a single
dot only admits a per-ROW scale epilogue, and per-row int4-linear is
numerically unusable. Formulations probed here (methodology = probe2:
distinct weights, data-dependent chain, profiler device time):

  A. split-K partials: K split into G big blocks, G s4 dots, f32 scaled
     sum of the [M, N] partials — admits per-(row, K/G-block) scales.
  B. asymmetric per-row epilogue: u4-style q-z with the zero-point folded
     via sum(x) — one dot + rank-1 epilogue (scale granularity: full row).
  C. Pallas: s4 ref loads + in-kernel s4->s8 convert + per-64-block s8
     dots with partial scaling (the W4A8 kernel structure, decode replaced
     by ONE hardware convert per element). s4 arrays enter via in-jit
     convert + optimization_barrier (passing s4 as a jit arg trips a jax
     RecursionError bug).

Run: python -m kbench.int4_forms_probe
"""

import functools
import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from kbench.probe2 import device_time_us

M, N, K = 8, 22016, 4096
NREPS = 10
G = 4                        # split-K groups for form A
BS = 64                      # Pallas quant block
TRACE_ROOT = "/tmp/tbnb_traces_i4f"


def profile(name, fn, bytes_per_matmul, n_matmuls, iters=3, top=5,
            exclude=("convert_element_type", "copy")):
    fn()
    jax.block_until_ready(fn())
    log_dir = os.path.join(TRACE_ROOT,
                           name.replace(" ", "_").replace("/", "_"))
    shutil.rmtree(log_dir, ignore_errors=True)
    with jax.profiler.trace(log_dir):
        for _ in range(iters):
            y = fn()
        jax.block_until_ready(y)
    total, per_op = device_time_us(log_dir)
    if total is None:
        print(f"{name:40s}: NO TRACE")
        return
    # exclude the harness's in-jit s4 materialization converts
    total = sum(us for op, us in per_op.items()
                if not any(op.startswith(e) for e in exclude))
    per = total / iters / n_matmuls
    eff = bytes_per_matmul / (per * 1e-6) / 1e9
    print(f"{name:40s}: {per:8.1f} us/matmul dev  {eff:7.1f} GB/s packed")
    for op, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"    {op[:70]:70s} {us/iters:9.1f} us/iter")


def main():
    print(f"backend: {jax.default_backend()}  M={M} N={N} K={K} "
          f"chain={NREPS}")
    rng = np.random.default_rng(0)
    x_bf = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)
    ws_i8 = [jnp.asarray(rng.integers(-8, 8, (N, K)), jnp.int8)
             for _ in range(NREPS)]
    sG = jnp.asarray(rng.uniform(0.5, 1.5, (NREPS, G, N)), jnp.float32)
    dn = (((1,), (1,)), ((), ()))
    kg = K // G

    # ---- A. split-K s4 dots + scaled partial sum (per-(row, kg) scales)
    def chain_a(x, ws):
        ws4 = jax.lax.optimization_barrier(
            tuple(w.astype(jnp.int4) for w in ws))
        for i, w4 in enumerate(ws4):
            acc = None
            for g in range(G):
                p = jax.lax.dot_general(
                    x[:, g * kg:(g + 1) * kg],
                    w4[:, g * kg:(g + 1) * kg].astype(jnp.bfloat16), dn,
                    preferred_element_type=jnp.float32)
                p = p * sG[i, g][None, :]
                acc = p if acc is None else acc + p
            x = acc.astype(jnp.bfloat16)[:, :K]
        return x
    profile(f"A split-K({G}) W4A16 + block scales",
            lambda: jax.jit(chain_a)(x_bf, ws_i8), N * K // 2, NREPS)

    # ---- B. asymmetric per-row: one dot + zero-point rank-1 epilogue
    zrow = jnp.asarray(rng.uniform(-2, 2, (NREPS, N)), jnp.float32)

    def chain_b(x, ws):
        ws4 = jax.lax.optimization_barrier(
            tuple(w.astype(jnp.int4) for w in ws))
        for i, w4 in enumerate(ws4):
            y = jax.lax.dot_general(x, w4.astype(jnp.bfloat16), dn,
                                    preferred_element_type=jnp.float32)
            xs = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
            y = y * sG[i, 0][None, :] - xs * zrow[i][None, :]
            x = y.astype(jnp.bfloat16)[:, :K]
        return x
    profile("B asym per-row W4A16 + zp epilogue",
            lambda: jax.jit(chain_b)(x_bf, ws_i8), N * K // 2, NREPS)

    # ---- C. Pallas s4 loads + in-kernel convert + per-64 partial scaling
    n_t = 512
    s64 = jnp.asarray(rng.uniform(0.5, 1.5, (K // BS, N)), jnp.float32)
    x_i8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)

    def _kernel(x_ref, w_ref, s_ref, o_ref):
        w = w_ref[:].astype(jnp.int8)           # ONE convert per element
        acc = jnp.zeros(o_ref.shape, jnp.float32)
        for b in range(K // BS):
            sl = slice(b * BS, (b + 1) * BS)
            p = jax.lax.dot_general(x_ref[:, sl], w[:, sl], dn,
                                    preferred_element_type=jnp.int32)
            acc = acc + p.astype(jnp.float32) * s_ref[b, :][None, :]
        o_ref[:] = acc

    def pallas_mm(x, w4, s):
        return pl.pallas_call(
            _kernel,
            grid=(N // n_t,),
            in_specs=[
                pl.BlockSpec((M, K), lambda i: (0, 0)),
                pl.BlockSpec((n_t, K), lambda i: (i, 0)),
                pl.BlockSpec((K // BS, n_t), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((M, n_t), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        )(x, w4, s)

    def chain_c(x, ws):
        ws4 = jax.lax.optimization_barrier(
            tuple(w.astype(jnp.int4) for w in ws))
        outs = []
        for w4 in ws4:
            outs.append(pallas_mm(x, w4, s64))
        return sum(o[0, 0] for o in outs), outs[-1]

    try:
        profile("C Pallas s4 conv+per-64 partial dots",
                lambda: jax.jit(chain_c)(x_i8, ws_i8[:6]), N * K // 2, 6,
                exclude=("convert_element_type", "copy"))
    except Exception as e:
        print(f"C Pallas s4: UNSUPPORTED — {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
