"""Per-HLO-op device-time breakdown of the prefill forward (VERDICT r3 #4).

The README prefill row (S=4096 B=8, 7B) runs at 48% of the bf16 MXU
roofline; this probe traces one jitted `llama.forward(last_only=True)` and
dumps the top ops (kbench.fusion_breakdown's grouper), so the missing 52%
gets attributed — matmul efficiency vs flash-attention scan overhead vs
relayout copies.

Run: python -m kbench.prefill_breakdown [--batch 8] [--seq 4096]
"""

import argparse
import shutil
import sys

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from kbench.fusion_breakdown import dump
from tpu_bitsandbytes.models import llama


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--runtime-cache", default="int8")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()
    fmt = None if args.runtime_cache == "none" else args.runtime_cache

    config = llama.LlamaConfig.llama2_7b()
    print("building params...", file=sys.stderr)
    params = B.random_quantized_params(config, runtime_cache=fmt)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, config.vocab_size,
                                          (args.batch, args.seq)), jnp.int32)
    fwd = jax.jit(lambda p, t: llama.forward(p, t, config, last_only=True))
    np.asarray(fwd(params, tokens))          # compile + settle

    log_dir = "/tmp/tbnb_prefill_trace"
    shutil.rmtree(log_dir, ignore_errors=True)
    with jax.profiler.trace(log_dir):
        for _ in range(args.iters):
            out = fwd(params, tokens)
        np.asarray(out)
    # n_steps=iters: numbers print as ms per whole forward
    dump(log_dir, args.iters, args.top)


if __name__ == "__main__":
    main()
