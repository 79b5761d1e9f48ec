"""Device-time ground truth for the mxu_probe variants via jax.profiler.

Wall-clock through the axon tunnel is unreliable (async enqueue acks can
make XLA chains appear 10x faster than HBM allows). This probe captures a
profiler trace per variant and reports the summed device-side op durations —
the methodology KERNEL_NOTES.md establishes as ground truth.

Run: python -m kbench.profile_probe
"""

import glob
import gzip
import json
import os
import shutil
import time

import numpy as np
import jax
import jax.numpy as jnp

from kbench import mxu_probe as mp

TRACE_ROOT = "/tmp/tbnb_traces"


def device_time_us(log_dir):
    """Sum device-lane event durations (us) from the newest trace in log_dir."""
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None, {}
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device pids: process names containing "TPU" and not "host"
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if ("TPU" in name or "/device:" in name) and "Host" not in name:
                device_pids.add(e["pid"])
    per_op = {}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            # skip nested "steps"/module-level envelopes? sum leaf ops only:
            # XLA device lanes are flat per-op; module envelopes live on
            # separate "XLA Modules" lanes.
            tname = e.get("tid")
            dur = e.get("dur", 0.0)
            name = e.get("name", "?")
            per_op[name] = per_op.get(name, 0.0) + dur
            total += dur
    return total, per_op


def profile(name, fn, bytes_per_matmul, n_matmuls, iters=3):
    """Run fn() iters times under a trace; report device time per matmul."""
    fn()  # compile
    jax.block_until_ready(fn())
    log_dir = os.path.join(TRACE_ROOT, name.replace(" ", "_").replace("/", "_"))
    shutil.rmtree(log_dir, ignore_errors=True)
    t0 = time.time()
    with jax.profiler.trace(log_dir):
        for _ in range(iters):
            y = fn()
        jax.block_until_ready(y)
    wall = time.time() - t0
    total, per_op = device_time_us(log_dir)
    if total is None:
        print(f"{name:44s}: NO TRACE (wall {wall*1e3:.1f}ms)")
        return
    # Module envelopes ("jit_...") can double count; keep both raw views.
    per = total / iters / n_matmuls
    eff = bytes_per_matmul / (per * 1e-6) / 1e9
    print(f"{name:44s}: {per:8.1f} us/matmul dev  {eff:7.1f} GB/s  "
          f"(wall {wall/iters/n_matmuls*1e6:.1f} us)")
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:4]
    for op, us in top:
        print(f"    {op[:70]:70s} {us/iters:9.1f} us/iter")


def main():
    print(f"devices: {jax.devices()}  M={mp.M} N=K={mp.N} chain={mp.NREPS}")
    rng = np.random.default_rng(0)
    M, N, K, NREPS = mp.M, mp.N, mp.K, mp.NREPS

    x_bf = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)
    x_i8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)

    ws_bf = [jnp.asarray(rng.standard_normal((N, K)) * 0.02, jnp.bfloat16)
             for _ in range(NREPS)]
    f = jax.jit(mp.chain_bf16)
    profile("XLA bf16 dot", lambda: f(x_bf, ws_bf), N * K * 2, NREPS)
    del ws_bf

    ws_i8 = [jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
             for _ in range(NREPS)]
    f = jax.jit(mp.chain_i8_xla)
    profile("XLA int8 dot -> i32", lambda: f(x_i8, ws_i8), N * K, NREPS)

    sc = jnp.asarray(rng.uniform(0.5, 1.5, (K // 512, N)), jnp.float32)

    def ch_i8(x, ws):
        for w in ws:
            y = mp.pallas_i8(x, w, sc, k_t=512)
            x = mp._requant_i8(y)[:, :K]
        return x
    f = jax.jit(ch_i8)
    profile("Pallas i8 + partial scales k_t=512",
            lambda: f(x_i8, ws_i8), N * K, NREPS)
    del ws_i8

    ws_p = [jnp.asarray(rng.integers(0, 256, (N, K // 2)), jnp.uint8)
            for _ in range(NREPS)]
    sc2 = jnp.asarray(rng.uniform(0.5, 1.5, (K // 2 // 512, N)), jnp.float32)

    def ch_w4(x, ws):
        for w in ws:
            y = mp.pallas_w4a8(x[:, 0::2], x[:, 1::2], w, sc2, k2_t=512)
            x = mp._requant_i8(y)[:, :K]
        return x
    f = jax.jit(ch_w4)
    profile("Pallas W4A8 k2_t=512", lambda: f(x_i8, ws_p), N * K // 2, NREPS)
    del ws_p

    from tpu_bitsandbytes import functional as F
    ws_f = []
    for _ in range(NREPS):
        w = jnp.asarray(rng.standard_normal((N, K)) * 0.02, jnp.float32)
        packed, st = F.quantize_4bit(w, blocksize=64)
        ws_f.append((jnp.asarray(packed).reshape(N, K // 2),
                     jnp.asarray(st.absmax).reshape(N, K // 64)))
    f = jax.jit(mp.chain_fused_bf16)
    profile("round-1 fused NF4->bf16 (production)",
            lambda: f(x_bf, ws_f), N * K // 2, NREPS)


if __name__ == "__main__":
    main()
