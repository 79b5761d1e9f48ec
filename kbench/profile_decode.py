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
from tpu_bitsandbytes.engine.sampler import greedy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runtime-cache", default="int8")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk-steps", type=int, default=16,
                    help="profile the chunked path exactly as bench.py runs it"
                         " (0 = single decode_step, full-span attention)")
    ap.add_argument("--attn-span", type=int, default=256)
    ap.add_argument("--top", type=int, default=24)
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

    if args.chunk_steps:
        from tpu_bitsandbytes.engine.engine import decode_chunk
        from tpu_bitsandbytes.engine.sampler import SamplingArrays
        samp = SamplingArrays.build({}, args.batch)
        key = jax.random.PRNGKey(0)

        def run(cache, tokens, active, key):
            _, _, cache, tokens, active, key, _, _ = decode_chunk(
                params, cache, tokens, active, key, samp, config,
                n_steps=args.chunk_steps, all_greedy=True,
                attn_span=args.attn_span)
            return cache, tokens, active, key

        steps_per_call = args.chunk_steps
        state = (cache, tokens, active, key)
        state = run(*state)
        jax.block_until_ready(state[1])
        for _ in range(2):
            state = run(*state)
        jax.block_until_ready(state[1])
    else:
        def run(cache, tokens, active, key):
            logits, cache = decode_step(params, cache, tokens, active, config)
            # feed greedy tokens forward so state[1] depends on this step —
            # block_until_ready(state[1]) must actually wait for the decode
            tokens = greedy(logits)
            return cache, tokens, active, key

        steps_per_call = 1
        state = (cache, tokens, active, jax.random.PRNGKey(0))
        for _ in range(3):
            state = run(*state)
        jax.block_until_ready(state[1])

    import shutil
    log_dir = "/tmp/tbnb_decode_trace"
    shutil.rmtree(log_dir, ignore_errors=True)
    iters = 3
    with jax.profiler.trace(log_dir):
        for _ in range(iters):
            state = run(*state)
        jax.block_until_ready(state[1])
    n_steps = iters * steps_per_call
    total, per_op = device_time_us(log_dir)
    print(f"total device {total/n_steps/1e3:.3f} ms/step "
          f"({steps_per_call} steps/call)")
    groups = {}
    counts = {}
    for op, us in per_op.items():
        key = op.split(".")[0]
        groups[key] = groups.get(key, 0.0) + us
        counts[key] = counts.get(key, 0) + 1
    for op, us in sorted(groups.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {op[:64]:64s} {us/n_steps/1e3:9.4f} ms/step "
              f"x{counts[op]}")


if __name__ == "__main__":
    main()
