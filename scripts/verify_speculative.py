"""Verify-skill probe: speculative engine on the real TPU backend."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_bitsandbytes.models import llama
from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams

print("backend:", jax.default_backend(), jax.devices())

cfg = llama.LlamaConfig(vocab_size=512, hidden_size=256,
                        intermediate_size=512, num_layers=2, num_heads=4,
                        num_kv_heads=2, max_seq_len=256, dtype=jnp.float32)
params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
rng = np.random.default_rng(7)
pat = list(map(int, rng.integers(0, cfg.vocab_size, 4)))
prompts = [pat * 4, list(map(int, rng.integers(0, cfg.vocab_size, 12)))]
sp = SamplingParams(max_new_tokens=16)

ref = DecodeEngine(params, cfg, max_batch=2, max_seq=256,
                   quantized_kv=False).generate(prompts, sp)
eng = DecodeEngine(params, cfg, max_batch=2, max_seq=256,
                   quantized_kv=False, speculative="ngram", spec_gamma=4)
out = eng.generate(prompts, sp)
print("spec stats:", eng.spec_stats)
assert out == ref, f"MISMATCH\nref={ref}\nspec={out}"
assert eng.spec_stats["verify_steps"] > 0
print("OK: speculative output token-identical to greedy on TPU; "
      f"accepted {eng.spec_stats['accepted']}/{eng.spec_stats['drafted']} drafts")

# quantized-KV variant (the production path)
ref_q = DecodeEngine(params, cfg, max_batch=2, max_seq=256,
                     quantized_kv=True).generate(prompts, sp)
eng_q = DecodeEngine(params, cfg, max_batch=2, max_seq=256,
                     quantized_kv=True, speculative="ngram", spec_gamma=4)
out_q = eng_q.generate(prompts, sp)
print("quantized-KV spec stats:", eng_q.spec_stats)
assert out_q == ref_q, f"MISMATCH (quantized KV)\nref={ref_q}\nspec={out_q}"
print("OK: quantized-KV speculative output token-identical on TPU")

# bf16 + execution-cache matrix (round 5): the bench's 7B random weights
# make greedy gaps noise-level, so exactness is gated HERE, on real-scaled
# weights, across the production cache formats.
for cache in (None, "int8", "int4"):
    p2 = (llama.quantize_params(params, blocksize=64, dtype=jnp.float32)
          if cache else params)
    cfgb = cfg
    kw = dict(max_batch=2, max_seq=256)
    if cache:
        kw["runtime_cache"] = cache
    ref_b = DecodeEngine(p2, cfgb, **kw).generate(prompts, sp)
    eng_b = DecodeEngine(p2, cfgb, speculative="ngram", spec_gamma=4, **kw)
    out_b = eng_b.generate(prompts, sp)
    if cache == "int4":
        # int4's FP4-class requantization coarsens logits into tie
        # territory (the emitted tokens oscillate among a few ids); the
        # S=gamma+1 verify program's different reduction order then flips
        # near-ties — divergence deep into the stream is tie-class, an
        # off-by-one in accept/bonus would hit position 0/1.
        div = [next((i for i, (a, b_) in enumerate(zip(o, r)) if a != b_),
                    len(r)) for o, r in zip(out_b, ref_b)]
        assert min(div) >= 4, f"early divergence {div}\n{ref_b}\n{out_b}"
        print(f"OK: int4-cache speculative matches greedy to position "
              f"{min(div)}+ per slot (tie-class beyond; "
              f"{eng_b.spec_stats['accepted']}/"
              f"{eng_b.spec_stats['drafted']} accepted)")
    else:
        assert out_b == ref_b, f"MISMATCH cache={cache}\n{ref_b}\n{out_b}"
        print(f"OK: speculative token-identical on TPU with runtime_cache="
              f"{cache} ({eng_b.spec_stats['accepted']}/"
              f"{eng_b.spec_stats['drafted']} accepted)")
