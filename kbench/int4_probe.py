"""Probe: can the decode matmul stream int4 weights at MXU-ingest rate?

The int8 execution cache runs at ~750 GB/s via XLA's convert+dot but pays
2x the NF4 storage bytes (BENCH vs_nf4_storage_roofline 0.45). If
`lax.dot_general` over **s4** weights runs anywhere near the int8 byte
rate, an int4 execution cache halves decode bytes/token (roofline
1533 tok/s at 7B B=8) and puts a 13B int4 cache (6.5 GiB) comfortably in
HBM. XLA stores S4 packed on TPU (layout tag `(8,1)`), so the HBM read
is genuinely 0.5 B/param; the open question is the unpack cost on the
dot's ingest path.

Methodology = kbench/probe2: NREPS distinct weights, data-dependent
chain (no CSE), device time from the profiler (envelopes excluded).
NOTE: passing S4 arrays as jit ARGUMENTS trips a jax bug (recursive-jit
RecursionError during layout resolution), so the s4 chains take s8 args
and convert+optimization_barrier INSIDE the jit — the barrier forces the
packed s4 buffers to materialize in HBM before the dots stream them; the
per-op table separates the convert fusions from the dot fusions.

Run: python -m kbench.int4_probe
"""

import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp

from kbench.probe2 import device_time_us

M = 8
N, K = 22016, 4096
NREPS = 12
TRACE_ROOT = "/tmp/tbnb_traces_i4"


def profile(name, fn, bytes_per_matmul, n_matmuls, iters=3, top=8,
            match=None):
    fn()
    jax.block_until_ready(fn())
    log_dir = os.path.join(TRACE_ROOT, name.replace(" ", "_").replace("/", "_"))
    shutil.rmtree(log_dir, ignore_errors=True)
    with jax.profiler.trace(log_dir):
        for _ in range(iters):
            y = fn()
        jax.block_until_ready(y)
    total, per_op = device_time_us(log_dir)
    if total is None:
        print(f"{name:44s}: NO TRACE")
        return
    if match is not None:
        # count only ops whose name contains `match` (e.g. the dot fusions,
        # excluding the in-jit s4 materialization)
        total = sum(us for op, us in per_op.items() if match in op)
    per = total / iters / n_matmuls
    eff = bytes_per_matmul / (per * 1e-6) / 1e9
    print(f"{name:44s}: {per:8.1f} us/matmul dev  {eff:7.1f} GB/s")
    for op, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"    {op[:70]:70s} {us/iters:9.1f} us/iter")


def main():
    print(f"backend: {jax.default_backend()}  M={M} N={N} K={K} "
          f"chain={NREPS}")
    rng = np.random.default_rng(0)
    x_bf = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)
    ws_i8 = [jnp.asarray(rng.integers(-8, 8, (N, K)), jnp.int8)
             for _ in range(NREPS)]
    srow = jnp.asarray(rng.uniform(0.5, 1.5, (NREPS, N)), jnp.float32)
    dn = (((1,), (1,)), ((), ()))

    # reference: the shipped int8-cache path (convert+dot + row scale)
    def chain_w8(x, ws):
        for i, w in enumerate(ws):
            y = jax.lax.dot_general(x, w.astype(jnp.bfloat16), dn,
                                    preferred_element_type=jnp.float32)
            y = y * srow[i][None, :]
            x = y.astype(jnp.bfloat16)[:, :K]
        return x
    profile("W8A16 convert+dot+scale (shipped cache)",
            lambda: jax.jit(chain_w8)(x_bf, ws_i8), N * K, NREPS)

    # s4 weights: converted+barriered in-jit (see module docstring), the
    # dots then stream the packed s4 buffers from HBM
    def chain_w4(x, ws):
        ws4 = jax.lax.optimization_barrier(
            tuple(w.astype(jnp.int4) for w in ws))
        for i, w4 in enumerate(ws4):
            y = jax.lax.dot_general(x, w4.astype(jnp.bfloat16), dn,
                                    preferred_element_type=jnp.float32)
            y = y * srow[i][None, :]
            x = y.astype(jnp.bfloat16)[:, :K]
        return x
    profile("W4A16 s4 convert+dot+scale",
            lambda: jax.jit(chain_w4)(x_bf, ws_i8), N * K // 2, NREPS,
            match="fusion")

    # s8 x s4 -> s32 (int activations; MXU int mode)
    x_i8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)

    def chain_w4a8(x, ws):
        ws4 = jax.lax.optimization_barrier(
            tuple(w.astype(jnp.int4) for w in ws))
        for i, w4 in enumerate(ws4):
            y = jax.lax.dot_general(x, w4, dn,
                                    preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * srow[i][None, :]
            s = jnp.max(jnp.abs(y), axis=-1, keepdims=True) + 1e-6
            x = jnp.clip(jnp.round(y / s * 127.0), -127, 127
                         ).astype(jnp.int8)[:, :K]
        return x
    profile("W4A8 s8 x s4 -> s32 dot",
            lambda: jax.jit(chain_w4a8)(x_i8, ws_i8), N * K // 2, NREPS,
            match="fusion")


if __name__ == "__main__":
    main()
