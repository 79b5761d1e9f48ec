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
