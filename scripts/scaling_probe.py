"""Scaling-efficiency probe for the TP decode/prefill path.

Measures what can be measured without a multi-chip pod (none exists in this
environment — one v5e chip behind a tunnel):

1. **Comm-volume accounting (virtual mesh)**: compiles the shard_map TP
   decode step for tp in {1, 2, 4, 8} on an 8-device CPU mesh and counts the
   collectives + their payload bytes in the compiled HLO. This is exact — the
   comm schedule is the compiled program, independent of backend.
2. **Roofline scaling model**: combines (1) with the v5e per-chip HBM
   bandwidth (819 GB/s) and ICI bandwidth (~100 GB/s/chip usable, 2D torus)
   to predict per-step time and scaling efficiency at 7B decode shapes.
3. **Real-chip shard_map overhead (run on TPU)**: tp=1, dp=1 mesh on the one
   real chip — the shard_map TP step vs the plain decode step. Any gap is
   pure shard_map/jit machinery, which would also be paid at tp>1.

Writes the numbers SCALING.md reports. Run:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_probe.py --mode hlo
    python scripts/scaling_probe.py --mode tpu   # real chip, tp=1 sanity
"""

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


HBM_BW = 819e9      # v5e HBM, bytes/s
ICI_BW = 100e9      # v5e usable per-chip ICI bandwidth (order-of-magnitude;
                    # 4 links x ~25 GB/s effective each on the 2D torus)
ICI_LAT = 1e-6      # per-collective launch latency, seconds (small-message)


def _shape_bytes(shape_str: str) -> int:
    """Bytes of an HLO shape string like 'f32[4,1,128]' or a tuple thereof."""
    total = 0
    for dt, dims in re.findall(r"(f32|bf16|f16|s32|s8|u8|pred)\[([\d,]*)\]",
                               shape_str):
        size = {"f32": 4, "s32": 4, "bf16": 2, "f16": 2,
                "s8": 1, "u8": 1, "pred": 1}[dt]
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * size
    return total


def collect_collectives(hlo_text: str):
    """(op kind, payload bytes) for every collective in compiled HLO."""
    out = []
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.-]+ = (\S+) (all-reduce|all-gather|"
                     r"reduce-scatter|collective-permute|all-to-all)", line)
        if m:
            out.append((m.group(2), _shape_bytes(m.group(1))))
    return out


def hlo_mode(args):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from tpu_bitsandbytes.models import llama
    from tpu_bitsandbytes.engine import KVCache
    from tpu_bitsandbytes.parallel import (
        make_mesh, shard_params, kv_cache_spec, make_tp_decode_step)

    # tiny-but-shaped model: comm pattern (collective count per layer, which
    # tensors travel) is shape-independent; payloads are scaled analytically
    # to 7B below.
    cfg = llama.LlamaConfig(vocab_size=512, hidden_size=256,
                            intermediate_size=512, num_layers=2, num_heads=8,
                            num_kv_heads=8, max_seq_len=64, dtype=jnp.float32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batch = 8
    results = {}
    for tp in args.tp_sizes:
        dp = 1
        mesh = make_mesh(tp=tp, dp=dp)
        q = llama.quantize_params(params, blocksize=32, dtype=jnp.float32,
                                  fuse_projections=args.fused, tp=tp)
        sharded = shard_params(q, mesh)
        cache = KVCache.create(cfg.num_layers, batch, 64, cfg.num_kv_heads,
                               cfg.hd, quantized=True, dtype=jnp.float32)
        cache = jax.device_put(
            cache, jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), kv_cache_spec(cache),
                is_leaf=lambda x: isinstance(x, P)))
        step = make_tp_decode_step(mesh, sharded, cfg, cache)
        tokens = jnp.zeros((batch,), jnp.int32)
        active = jnp.ones((batch,), bool)
        compiled = step.lower(sharded, cache, tokens, active).compile()
        colls = collect_collectives(compiled.as_text())
        results[tp] = {
            "collectives": len(colls),
            "bytes_per_step": sum(b for _, b in colls),
            "kinds": sorted({k for k, _ in colls}),
        }
        print(f"tp={tp}: {len(colls)} collectives, "
              f"{sum(b for _, b in colls)} payload bytes/step, "
              f"kinds={results[tp]['kinds']}", file=sys.stderr)

    # analytic 7B scale-up: per layer 2 psums of [B,1,H] f32 + lm_head
    # all-gather [B, V/tp] -> V f32; comm volume per chip per step.
    cfg7 = llama.LlamaConfig.llama2_7b()
    B = 8
    step_compute = 13.9e-3          # measured B=8 single-chip step (bench)
    print(json.dumps({"probe": "hlo", "fused": args.fused,
                      "results": results}))
    model = {}
    for tp in args.tp_sizes:
        psum_bytes = cfg7.num_layers * 2 * B * cfg7.hidden_size * 4
        ag_bytes = B * cfg7.vocab_size * 4
        n_coll = cfg7.num_layers * 2 + 1
        comm_t = (psum_bytes + ag_bytes) / ICI_BW + n_coll * ICI_LAT if tp > 1 \
            else 0.0
        compute_t = step_compute / tp
        eff = compute_t / (compute_t + comm_t)
        model[tp] = {"comm_bytes": psum_bytes + ag_bytes,
                     "comm_ms": comm_t * 1e3,
                     "compute_ms": compute_t * 1e3,
                     "efficiency": round(eff, 4)}
    print(json.dumps({"probe": "model_7b_b8", "model": model}))


def tpu_mode(args):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from tpu_bitsandbytes.models import llama
    from tpu_bitsandbytes.engine import KVCache, decode_step
    from tpu_bitsandbytes.parallel import (
        make_mesh, shard_params, kv_cache_spec, make_tp_decode_step)

    # big enough for stable step times, small enough to quantize on-chip
    # through the tunnel in seconds
    cfg = llama.LlamaConfig(vocab_size=8192, hidden_size=1024,
                            intermediate_size=2816, num_layers=4,
                            num_heads=8, num_kv_heads=8)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    q = llama.quantize_params(params, dtype=jnp.bfloat16)
    q = llama.build_runtime_cache(q, "int8")
    batch = 8
    cache = KVCache.create(cfg.num_layers, batch, 256, cfg.num_kv_heads,
                           cfg.hd, quantized=True, dtype=jnp.bfloat16)
    tokens = jnp.zeros((batch,), jnp.int32)
    active = jnp.ones((batch,), bool)

    def timeit(fn, p, c, t, a, reps=30):
        # steps donate the cache: thread the returned one back in
        logits, c = fn(p, c, t, a)
        jax.block_until_ready(logits)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            logits, c = fn(p, c, t, a)
            jax.block_until_ready(logits)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_plain = timeit(lambda p, c, t, a: decode_step(p, c, t, a, cfg),
                     q, cache, tokens, active)

    mesh = make_mesh(tp=1, dp=1)
    sharded = shard_params(q, mesh)
    mcache = KVCache.create(cfg.num_layers, batch, 256, cfg.num_kv_heads,
                            cfg.hd, quantized=True, dtype=jnp.bfloat16)
    mcache = jax.device_put(
        mcache, jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), kv_cache_spec(mcache),
            is_leaf=lambda x: isinstance(x, P)))
    step = make_tp_decode_step(mesh, sharded, cfg, mcache)
    t_tp1 = timeit(step, sharded, mcache, tokens, active)
    print(json.dumps({"probe": "tpu_tp1_sanity",
                      "plain_step_ms": round(t_plain * 1e3, 3),
                      "shard_map_tp1_step_ms": round(t_tp1 * 1e3, 3),
                      "overhead_pct": round(100 * (t_tp1 / t_plain - 1), 2)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["hlo", "tpu"], default="hlo")
    ap.add_argument("--tp-sizes", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--fused", action="store_true",
                    help="use the tp-interleaved fused qkv/gateup layout")
    args = ap.parse_args()
    if args.mode == "hlo":
        hlo_mode(args)
    else:
        tpu_mode(args)


if __name__ == "__main__":
    main()
