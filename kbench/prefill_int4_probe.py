"""Probe: WHERE do the 12 MFU points go in int4-cache prefill?

Round-5 chip measurements (scripts/tpu_full_validation, bench --prefill
4096): S=4096 B=8 prefill runs at 72.7% MFU on the int8 execution cache
but 60.6% on the int4 cache. Prefill is compute-bound, so the suspect is
the int4 path's large-M branch (ops/int4cache.int4_matmul): it
dequantizes the s4 cache to a bf16 [N, K] weight and then dots — if XLA
does NOT fuse the 3-op dequant chain (s4 convert, per-128-block scale
multiply, bf16 cast) into the dot operand, the materialized weight costs
a 2 B/param HBM write + read per matmul (~64 MB at 4096^2, ~11% of the
M=4096 dot's compute time — the observed gap).

Variants at M=4096 (probe2 methodology, NREPS distinct weights,
data-dependent chaining):
  A  bf16 dot                      (the MXU ceiling)
  B  int8 cache: convert+dot       (the 72.7% regime)
  C  int4 cache: dequant_int4+dot  (the shipped large-M branch)
  D  C with the dequant hoisted    (dequant once outside the chain —
                                    what a weight-stationary prefill
                                    would get; isolates the round trip)

Run: python -m kbench.prefill_int4_probe [--m 4096] [--n 4096] [--k 4096]
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from kbench.attn_a8_probe import profile
from tpu_bitsandbytes.ops.int4cache import quantize_int4, dequant_int4

NREPS = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=4096)
    args = ap.parse_args()
    m, n, k = args.m, args.n, args.k
    rng = np.random.default_rng(0)
    flops = 2.0 * m * n * k

    ws, w8s, s8s, w4s, s4s, wdeq = [], [], [], [], [], []
    for _ in range(NREPS):
        w = jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.float32)
        ws.append(w.astype(jnp.bfloat16))
        s = jnp.clip(jnp.max(jnp.abs(w), axis=1), min=1e-8) / 127.0
        w8s.append(jnp.clip(jnp.round(w / s[:, None]), -127, 127
                            ).astype(jnp.int8))
        s8s.append(s)
        q4, sc = quantize_int4(w)
        w4s.append(q4)
        s4s.append(sc)
        wdeq.append(dequant_int4(q4, sc, k // sc.shape[0],
                                 dtype=jnp.bfloat16)[:, :k])
    x0 = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
    kp = w4s[0].shape[1]
    bs = kp // s4s[0].shape[0]

    def dot(x, w):
        return jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def step_a(x, w):
        return dot(x, w[0])

    def step_b(x, w):
        return dot(x, w[0].astype(jnp.bfloat16)) * w[1][None, :]

    def step_c(x, w):
        wd = dequant_int4(w[0], w[1], bs, dtype=jnp.bfloat16)
        xp = jnp.pad(x, ((0, 0), (0, kp - k))) if kp != k else x
        return dot(xp, wd)[:, :n]

    def step_d(x, w):
        return dot(x, w[0])

    def chain(step, packs):
        na = len(packs[0])

        @jax.jit
        def f(x, *flat):
            for i in range(NREPS):
                o = step(x, flat[i * na:(i + 1) * na])    # [m, n]
                # fold back for the data dependency (n >= k assumed)
                x = (x + o[:, :k] * 1e-4).astype(jnp.bfloat16)
            return x
        flat = [a for p in packs for a in p]
        return lambda: f(x0, *flat)

    names = [("A bf16 dot (ceiling)", step_a, [(w,) for w in ws]),
             ("B int8 cache convert+dot", step_b, list(zip(w8s, s8s))),
             ("C int4 dequant+dot (shipped)", step_c, list(zip(w4s, s4s))),
             ("D int4 dequant hoisted", step_d, [(w,) for w in wdeq])]
    # device-profiler timing (wall + block_until_ready is unreliable
    # through the axon tunnel — kbench/probe2 methodology)
    import os
    import shutil
    from kbench.probe2 import device_time_us
    for nm, st, packs in names:
        fn = chain(st, packs)
        fn()
        jax.block_until_ready(fn())
        d = os.path.join("/tmp/tbnb_prefill_probe", nm.replace(" ", "_"))
        shutil.rmtree(d, ignore_errors=True)
        iters = 3
        with jax.profiler.trace(d):
            for _ in range(iters):
                r = fn()
            jax.block_until_ready(r)
        total, _ = device_time_us(d)
        us = total / (iters * NREPS)
        print(f"{nm:34s}: {us:9.1f} us/matmul dev  "
              f"{flops / (us * 1e-6) / 1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
