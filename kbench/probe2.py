"""Probe 2: can a decode-free int8 weight layout ride XLA's dot to roofline?

Measures device time (profiler ground truth, envelopes excluded) at M=8 for:
  - XLA bf16 dot                         (32 MB/matmul)
  - XLA int8 x int8 -> i32 dot           (16 MB)
  - XLA W8A16: convert(int8->bf16) dot   (16 MB)  <- the candidate
  - XLA W8A16 + per-row scale epilogue   (16 MB)
  - XLA NF4 dequant+dot fusion           (8.4 MB)

Run: python -m kbench.probe2
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

M = 8
N = K = 4096
NREPS = 20
TRACE_ROOT = "/tmp/tbnb_traces2"


def device_time_us(log_dir):
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None, {}
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
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
            name = e.get("name", "?")
            if name.startswith("jit_"):   # module envelope: double-counts
                continue
            per_op[name] = per_op.get(name, 0.0) + e.get("dur", 0.0)
            total += e.get("dur", 0.0)
    return total, per_op


def profile(name, fn, bytes_per_matmul, n_matmuls, iters=3, top=6):
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
        print(f"{name:46s}: NO TRACE")
        return
    per = total / iters / n_matmuls
    eff = bytes_per_matmul / (per * 1e-6) / 1e9
    print(f"{name:46s}: {per:8.1f} us/matmul dev  {eff:7.1f} GB/s")
    for op, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"    {op[:66]:66s} {us/iters:9.1f} us/iter")


def main():
    print(f"devices: {jax.devices()}  M={M} N=K={N} chain={NREPS}")
    rng = np.random.default_rng(0)

    x_bf = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)
    x_i8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    dn = (((1,), (1,)), ((), ()))

    # ---- XLA bf16
    ws_bf = [jnp.asarray(rng.standard_normal((N, K)) * 0.02, jnp.bfloat16)
             for _ in range(NREPS)]

    def chain_bf16(x, ws):
        for w in ws:
            y = jax.lax.dot_general(x, w, dn,
                                    preferred_element_type=jnp.float32)
            x = y.astype(jnp.bfloat16)[:, :K]
        return x
    profile("XLA bf16 dot", lambda: jax.jit(chain_bf16)(x_bf, ws_bf),
            N * K * 2, NREPS)
    del ws_bf

    ws_i8 = [jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
             for _ in range(NREPS)]

    # ---- XLA int8 x int8
    def requant(y):
        s = jnp.max(jnp.abs(y), axis=-1, keepdims=True) + 1e-6
        return jnp.clip(jnp.round(y / s * 127.0), -127, 127).astype(jnp.int8)

    def chain_i8(x, ws):
        for w in ws:
            y = jax.lax.dot_general(x, w, dn,
                                    preferred_element_type=jnp.int32)
            x = requant(y.astype(jnp.float32))[:, :K]
        return x
    profile("XLA int8 dot -> i32", lambda: jax.jit(chain_i8)(x_i8, ws_i8),
            N * K, NREPS)

    # ---- XLA W8A16: int8 weight converted inline, bf16 activations
    def chain_w8a16(x, ws):
        for w in ws:
            y = jax.lax.dot_general(x, w.astype(jnp.bfloat16), dn,
                                    preferred_element_type=jnp.float32)
            x = y.astype(jnp.bfloat16)[:, :K]
        return x
    profile("XLA W8A16 convert+dot", lambda: jax.jit(chain_w8a16)(x_bf, ws_i8),
            N * K, NREPS)

    # ---- W8A16 + per-row weight scale epilogue (the real dequant math)
    srow = jnp.asarray(rng.uniform(0.5, 1.5, (NREPS, N)), jnp.float32)

    def chain_w8a16_scaled(x, ws):
        for i, w in enumerate(ws):
            y = jax.lax.dot_general(x, w.astype(jnp.bfloat16), dn,
                                    preferred_element_type=jnp.float32)
            y = y * srow[i][None, :]
            x = y.astype(jnp.bfloat16)[:, :K]
        return x
    profile("XLA W8A16 + row-scale epilogue",
            lambda: jax.jit(chain_w8a16_scaled)(x_bf, ws_i8), N * K, NREPS)
    del ws_i8

    # ---- XLA NF4 dequant + dot (unfused-path reference)
    from tpu_bitsandbytes import functional as F
    ws_f = []
    for _ in range(NREPS):
        w = jnp.asarray(rng.standard_normal((N, K)) * 0.02, jnp.float32)
        packed, st = F.quantize_4bit(w, blocksize=64)
        ws_f.append((jnp.asarray(packed), st))

    def chain_nf4_xla(x, ws):
        for packed, st in ws:
            wd = F.dequantize_4bit(packed, st).astype(jnp.bfloat16)
            y = jax.lax.dot_general(x, wd, dn,
                                    preferred_element_type=jnp.float32)
            x = y.astype(jnp.bfloat16)[:, :K]
        return x
    profile("XLA NF4 dequant+dot fusion",
            lambda: jax.jit(chain_nf4_xla)(x_bf, ws_f), N * K // 2, NREPS)


if __name__ == "__main__":
    main()
