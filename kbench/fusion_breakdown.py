"""Per-HLO-op device-time breakdown of the 7B decode chunk.

Unlike profile_decode's coarse groups (one 'fusion' bucket), this prints the
top individual ops with their trace args (shape/long-name when present), so
the inter-matmul elementwise residue (VERDICT r2 Weak #3) can be attributed.

Run: python -m kbench.fusion_breakdown [--batch 8] [--attn-span 256]
"""

import argparse
import dataclasses
import glob
import gzip
import json
import os
import shutil
import sys

import jax
import jax.numpy as jnp

import bench as B
from tpu_bitsandbytes.models import llama
from tpu_bitsandbytes.engine import KVCache
from tpu_bitsandbytes.engine.engine import decode_chunk
from tpu_bitsandbytes.engine.sampler import SamplingArrays


def dump(log_dir, n_steps, top):
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
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
    args_by_op = {}
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e.get("name", "?")
            if name.startswith("jit_") or name == "while":
                continue        # envelopes double-count their bodies
            d = e.get("dur", 0.0)
            per_op[name] = (per_op.get(name, (0.0, 0))[0] + d,
                            per_op.get(name, (0.0, 0))[1] + 1)
            total += d
            if e.get("args"):
                args_by_op[name] = e["args"]
    print(f"device total (sans envelopes) {total/n_steps/1e3:.3f} ms/step")
    for name, (us, cnt) in sorted(per_op.items(), key=lambda kv: -kv[1][0])[:top]:
        a = args_by_op.get(name, {})
        desc = a.get("long_name") or a.get("tf_op") or ""
        print(f"  {us/n_steps/1e3:8.4f} ms/step x{cnt:4d}  {name[:48]:48s} "
              f"{str(desc)[:140]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk-steps", type=int, default=16)
    ap.add_argument("--attn-span", type=int, default=256)
    ap.add_argument("--runtime-cache", default="int8")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    fmt = None if args.runtime_cache == "none" else args.runtime_cache

    config = llama.LlamaConfig.llama2_7b()
    print("building params...", file=sys.stderr)
    params = B.random_quantized_params(config, runtime_cache=fmt)
    cache = KVCache.create(config.num_layers, args.batch, 512,
                           config.num_kv_heads, config.hd, quantized=True,
                           dtype=config.dtype)
    cache = dataclasses.replace(
        cache, lengths=jnp.full((args.batch,), 128, jnp.int32))
    samp = SamplingArrays.build({}, args.batch)

    def run(cache, tokens, active, key):
        _, _, cache, tokens, active, key, _, _ = decode_chunk(
            params, cache, tokens, active, key, samp, config,
            n_steps=args.chunk_steps, all_greedy=True,
            attn_span=args.attn_span)
        return cache, tokens, active, key

    state = (cache, jnp.zeros((args.batch,), jnp.int32),
             jnp.ones((args.batch,), bool), jax.random.PRNGKey(0))
    state = run(*state)
    jax.block_until_ready(state)
    for _ in range(2):
        state = run(*state)
    jax.block_until_ready(state)

    log_dir = "/tmp/tbnb_fusion_trace"
    shutil.rmtree(log_dir, ignore_errors=True)
    iters = 3
    with jax.profiler.trace(log_dir):
        for _ in range(iters):
            state = run(*state)
        jax.block_until_ready(state)
    dump(log_dir, iters * args.chunk_steps, args.top)


if __name__ == "__main__":
    main()
