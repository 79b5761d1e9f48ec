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


def _sig(name, desc):
    """Group key: the op kind + its result/operand SHAPES, so the 32
    per-layer clones of one computation (fusion.3555 … fusion.4051) fold
    into a single row instead of flooding the per-name top list."""
    import re
    kind = re.sub(r"[.\d]+$", "", name)
    if not desc:
        return kind
    s = str(desc)
    # keep result type + the operand types in the arg list head
    shapes = re.findall(r"\b([a-z]+\d*\[[0-9,]*\])", s.replace(" ", ""))
    return f"{kind} {' '.join(shapes[:5])}"


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
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e.get("name", "?")
            if name.startswith(("jit_", "while")):
                continue        # envelopes double-count their bodies
            d = e.get("dur", 0.0)
            a = e.get("args") or {}
            key = _sig(name, a.get("long_name") or a.get("tf_op") or "")
            us, cnt, ex = per_op.get(key, (0.0, 0, name))
            per_op[key] = (us + d, cnt + 1, ex)
            total += d
    print(f"device total (sans envelopes) {total/n_steps/1e3:.3f} ms/step")
    for key, (us, cnt, ex) in sorted(per_op.items(),
                                     key=lambda kv: -kv[1][0])[:top]:
        print(f"  {us/n_steps/1e3:8.4f} ms/step x{cnt:5d}  e.g.{ex[:24]:24s} "
              f"{key[:150]}")


def dump_main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir")
    ap.add_argument("--n-steps", type=int, required=True)
    ap.add_argument("--top", type=int, default=40)
    a = ap.parse_args(argv)
    dump(a.log_dir, a.n_steps, a.top)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk-steps", type=int, default=16)
    ap.add_argument("--attn-span", type=int, default=256)
    ap.add_argument("--runtime-cache", default="int8")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--window", type=int, default=1,
                    help="compact-window staged decode (0 = two-block)")
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
            attn_span=args.attn_span, window_stage=bool(args.window))
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
