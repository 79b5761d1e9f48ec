"""Headline benchmark: Llama-2-7B-shaped NF4 decode, tokens/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/s/chip", "vs_baseline": N}

``vs_baseline`` is measured / derived-roofline. The reference publishes no
absolute numbers (BASELINE.md), so the baseline is the HBM roofline:
tokens/s = HBM_BW / bytes_touched_per_token (packed nibbles + absmax + KV
traffic + embedding rows), per BASELINE.md's derivation.

Weights are random-initialized *directly in packed form* on-device (a real
7B fp32 init would not fit HBM and adds nothing to a throughput bench).

Usage: python bench.py [--model 7b|tiny] [--batch 1] [--steps 10]
"""

import argparse
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpu_bitsandbytes.functional import _pad_k
from tpu_bitsandbytes.models import llama
from tpu_bitsandbytes.models.layers import QLinear4
from tpu_bitsandbytes.engine import KVCache, decode_step

HBM_BW = 819e9  # TPU v5e HBM bandwidth, bytes/s


def random_qlinear(key, n, k, blocksize=64, dtype=jnp.bfloat16):
    kp = _pad_k(k, blocksize)
    k1, k2 = jax.random.split(key)
    packed = jax.random.randint(k1, (n, kp // 2), 0, 256, jnp.int32
                                ).astype(jnp.uint8)
    absmax = (jax.random.uniform(k2, (n, kp // blocksize)) * 0.03 + 0.005
              ).astype(jnp.float32)
    return QLinear4(packed=packed, absmax=absmax, shape=(n, k),
                    blocksize=blocksize, quant_type="nf4", dtype=dtype)


def random_quantized_params(config, blocksize=64, fuse_projections=True):
    """Fused qkv/gateup layout by default (4 kernels/layer, decode win)."""
    h, hd = config.hidden_size, config.hd
    n_q = config.num_heads * hd
    n_kv = config.num_kv_heads * hd
    if fuse_projections:
        shapes = {
            "qkv_proj": (n_q + 2 * n_kv, h),
            "o_proj": (h, n_q),
            "gateup_proj": (2 * config.intermediate_size, h),
            "down_proj": (h, config.intermediate_size),
        }
    else:
        shapes = {
            "q_proj": (n_q, h), "k_proj": (n_kv, h), "v_proj": (n_kv, h),
            "o_proj": (h, n_q),
            "gate_proj": (config.intermediate_size, h),
            "up_proj": (config.intermediate_size, h),
            "down_proj": (h, config.intermediate_size),
        }
    key = jax.random.PRNGKey(0)
    layers = []
    for li in range(config.num_layers):
        key, *lk = jax.random.split(key, len(shapes) + 1)
        layer = {name: random_qlinear(lk[i], *shapes[name], blocksize,
                                      config.dtype)
                 for i, name in enumerate(shapes)}
        layer["input_norm"] = jnp.ones((h,), config.dtype)
        layer["post_attn_norm"] = jnp.ones((h,), config.dtype)
        layers.append(layer)
    key, k1, k2 = jax.random.split(key, 3)
    return {
        "embed": (jax.random.normal(k1, (config.vocab_size, h)) * 0.02
                  ).astype(config.dtype),
        "layers": layers,
        "final_norm": jnp.ones((h,), config.dtype),
        "lm_head": random_qlinear(k2, config.vocab_size, h, blocksize,
                                  config.dtype),
    }


def bytes_per_token(config, cache, blocksize=64, batch=1):
    """HBM bytes touched per generated token (weights amortize over batch)."""
    h, hd = config.hidden_size, config.hd
    n_q = config.num_heads * hd
    n_kv = config.num_kv_heads * hd
    lin = (n_q * h + 2 * n_kv * h + h * n_q + 3 * h * config.intermediate_size)
    lin_total = config.num_layers * lin + config.vocab_size * h  # + lm_head
    w_bytes = lin_total * 0.5 + lin_total / blocksize * 4.0  # packed + absmax
    embed_bytes = h * 2  # per-token embedding row gather
    kv_bytes = cache.bytes_per_token()  # write; reads grow with context
    ctx = int(np.mean(np.asarray(cache.lengths)))
    kv_read = cache.bytes_per_token() * ctx / max(cache.max_seq, 1)
    return w_bytes / batch + kv_bytes + kv_read + embed_bytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b", choices=["7b", "tiny", "1b"])
    ap.add_argument("--batch", type=int, default=8,
                    help="decode slots (BASELINE config 3: continuous batching)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--context", type=int, default=128)
    ap.add_argument("--max-seq", type=int, default=512)
    args = ap.parse_args()

    if args.model == "7b":
        config = llama.LlamaConfig.llama2_7b()
    elif args.model == "1b":
        config = llama.LlamaConfig(hidden_size=2048, intermediate_size=5504,
                                   num_layers=16, num_heads=16,
                                   num_kv_heads=16)
    else:
        config = llama.LlamaConfig.tiny()

    print(f"building random NF4 {args.model} params...", file=sys.stderr)
    params = random_quantized_params(config)
    first = params["layers"][0]
    jax.block_until_ready(first.get("qkv_proj", first.get("q_proj")).packed)

    cache = KVCache.create(config.num_layers, args.batch, args.max_seq,
                           config.num_kv_heads, config.hd, quantized=True,
                           dtype=config.dtype)
    # pretend a prefilled context so decode attends over real history
    import dataclasses
    cache = dataclasses.replace(
        cache, lengths=jnp.full((args.batch,), args.context, jnp.int32))

    tokens = jnp.zeros((args.batch,), jnp.int32)
    active = jnp.ones((args.batch,), bool)

    print("compiling decode step...", file=sys.stderr)
    t0 = time.time()
    logits, cache = decode_step(params, cache, tokens, active, config)
    jax.block_until_ready(logits)
    print(f"compile+first step: {time.time()-t0:.1f}s", file=sys.stderr)

    # warmup
    for _ in range(2):
        logits, cache = decode_step(params, cache, tokens, active, config)
    jax.block_until_ready(logits)

    argmax = jax.jit(lambda l: jnp.argmax(l, axis=-1).astype(jnp.int32))
    t0 = time.time()
    for _ in range(args.steps):
        logits, cache = decode_step(params, cache, tokens, active, config)
        tokens = argmax(logits)
    jax.block_until_ready(logits)
    dt = (time.time() - t0) / args.steps

    tok_s = args.batch / dt
    bpt = bytes_per_token(config, cache, batch=args.batch)
    roofline = HBM_BW / bpt
    print(f"step {dt*1e3:.2f}ms  bytes/token {bpt/1e9:.3f}GB  "
          f"roofline {roofline:.0f} tok/s/chip", file=sys.stderr)
    print(json.dumps({
        "metric": f"llama2_{args.model}_nf4_decode_tokens_per_sec_per_chip",
        "value": round(tok_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tok_s / roofline, 4),
    }))


if __name__ == "__main__":
    main()
