"""Profile the 7B decode step on the real chip: per-op device time breakdown.

Run: python -m kbench.profile_decode [--runtime-cache int8|bf16|none]
"""

import argparse
import dataclasses
import sys

import jax
import jax.numpy as jnp

from kbench.probe2 import device_time_us
import bench as B
from tpu_bitsandbytes.models import llama
from tpu_bitsandbytes.engine import KVCache, decode_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runtime-cache", default="int8")
    ap.add_argument("--batch", type=int, default=8)
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
    tokens = jnp.zeros((args.batch,), jnp.int32)
    active = jnp.ones((args.batch,), bool)

    logits, cache = decode_step(params, cache, tokens, active, config)
    jax.block_until_ready(logits)
    for _ in range(2):
        logits, cache = decode_step(params, cache, tokens, active, config)
    jax.block_until_ready(logits)

    import shutil
    log_dir = "/tmp/tbnb_decode_trace"
    shutil.rmtree(log_dir, ignore_errors=True)
    iters = 3
    with jax.profiler.trace(log_dir):
        for _ in range(iters):
            logits, cache = decode_step(params, cache, tokens, active, config)
        jax.block_until_ready(logits)
    total, per_op = device_time_us(log_dir)
    print(f"total device {total/iters/1e3:.2f} ms/step")
    groups = {}
    for op, us in per_op.items():
        key = op.split(".")[0]
        groups[key] = groups.get(key, 0.0) + us
    for op, us in sorted(groups.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {op[:64]:64s} {us/iters/1e3:9.3f} ms/step")


if __name__ == "__main__":
    main()
