"""On-TPU smoke for the round-2 model-family and serving additions.

The CPU suite pins numerics against HF transformers; this script re-drives
the same surfaces on the real backend (compiled, bf16 MXU paths) so a
compiled-only regression cannot ship silently:

- engine decode for each family config (Llama / Qwen2 / Mistral / Gemma /
  Gemma2) with quantized KV and the int8 runtime cache,
- batched same-bucket admission == sequential admission,
- chunked prefill == unchunked (unquantized KV: token-identical),
- streaming + cancellation sanity.

Exits nonzero on any mismatch. Tiny configs: total runtime is dominated by
compiles (~1-2 min on a warm cache).

Usage: python scripts/tpu_families_smoke.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu_bitsandbytes.models import llama
from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams

FAILS = []


def check(name, ok, detail=""):
    print(f"{'ok  ' if ok else 'FAIL'} {name} {detail}", flush=True)
    if not ok:
        FAILS.append(name)


def family_decode(name, cfg, rng, quantized_kv=True, runtime_cache="int8"):
    """Greedy engine decode runs, is finite, and is reproducible."""
    params = llama.quantize_params(
        llama.init_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32))
    prompts = [list(map(int, rng.integers(0, cfg.vocab_size, n)))
               for n in (5, 11)]
    sp = SamplingParams(max_new_tokens=6)

    def run():
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                         quantized_kv=quantized_kv,
                         runtime_cache=runtime_cache)
        return e.generate(prompts, sp)

    a, b = run(), run()
    check(f"{name}: decode deterministic", a == b, str(a[0][:4]))
    check(f"{name}: emits requested tokens",
          all(len(x) == 6 for x in a))


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    family_decode("llama", llama.LlamaConfig.tiny(), rng)
    family_decode("qwen2", llama.LlamaConfig.tiny_qwen2(), rng)
    family_decode("mistral", llama.LlamaConfig.tiny_mistral(), rng)
    family_decode("gemma", llama.LlamaConfig.tiny_gemma(), rng)
    family_decode("gemma2", llama.LlamaConfig.tiny_gemma2(), rng)
    family_decode("mixtral", llama.LlamaConfig.tiny_mixtral(), rng)
    family_decode("qwen2moe", llama.LlamaConfig.tiny_qwen2_moe(), rng)
    family_decode("phi2", llama.LlamaConfig.tiny_phi2(), rng)
    family_decode("stablelm", llama.LlamaConfig.tiny_stablelm(), rng)

    # batched admission == sequential (compiled path)
    cfg = llama.LlamaConfig.tiny()
    params = llama.quantize_params(
        llama.init_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32))
    prompts = [list(map(int, rng.integers(0, cfg.vocab_size, n)))
               for n in (5, 6, 7)]
    sp = SamplingParams(max_new_tokens=5)
    grouped = DecodeEngine(params, cfg, max_batch=4, max_seq=64
                           ).generate(prompts, sp)
    seq_eng = DecodeEngine(params, cfg, max_batch=1, max_seq=64)
    seq = [seq_eng.generate([p], sp)[0] for p in prompts]
    check("batched admission == sequential", grouped == seq)

    # chunked prefill == unchunked (unquantized KV -> token identity)
    long_prompts = [list(map(int, rng.integers(0, cfg.vocab_size, n)))
                    for n in (50, 9)]
    ref = DecodeEngine(params, cfg, max_batch=2, max_seq=128,
                       quantized_kv=False).generate(long_prompts, sp)
    got = DecodeEngine(params, cfg, max_batch=2, max_seq=128,
                       quantized_kv=False,
                       prefill_chunk=16).generate(long_prompts, sp)
    check("chunked prefill == unchunked", got == ref)

    # streaming + cancel
    e = DecodeEngine(params, cfg, max_batch=2, max_seq=64)
    events = list(e.generate_stream(long_prompts[:1], sp))
    check("streaming emits (uid, token, done)",
          len(events) == 5 and events[-1][2] is True)
    e2 = DecodeEngine(params, cfg, max_batch=1, max_seq=64)
    u1 = e2.add_request(long_prompts[0], SamplingParams(max_new_tokens=50))
    e2.step()
    e2.cancel(u1)
    while e2.step():
        pass
    check("cancel retires active request",
          e2.finished and e2.finished[0].cancelled)

    # repetition penalty + logprobs + stop on the compiled path
    pr = long_prompts[1]
    e3 = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                      quantized_kv=False)
    out = e3.generate([pr], SamplingParams(
        max_new_tokens=10, repetition_penalty=1e6, logprobs=True))[0]
    req = e3.finished[0]
    check("penalty forbids repeats (compiled)",
          len(set(out)) == len(out) and not set(out) & set(pr))
    check("logprobs for every token", len(req.logprobs) == len(out))
    base = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                        quantized_kv=False).generate(
        [pr], SamplingParams(max_new_tokens=10))[0]
    stopped = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                           quantized_kv=False).generate(
        [pr], SamplingParams(max_new_tokens=10,
                             stop=(tuple(base[2:4]),)))[0]
    check("stop sequence truncates", stopped == base[:4])

    # ring KV: token identity vs the full cache on a windowed config
    import dataclasses
    rcfg = dataclasses.replace(llama.LlamaConfig.tiny_mistral(),
                               sliding_window=32, max_seq_len=512)
    rparams = llama.quantize_params(
        llama.init_params(jax.random.PRNGKey(3), rcfg, dtype=jnp.float32))
    rp = list(map(int, rng.integers(0, rcfg.vocab_size, 150)))
    rsp = SamplingParams(max_new_tokens=8)
    full_out = DecodeEngine(rparams, rcfg, max_batch=1, max_seq=512,
                            quantized_kv=False).generate([rp], rsp)
    ring_eng = DecodeEngine(rparams, rcfg, max_batch=1, max_seq=512,
                            quantized_kv=False, ring_kv=True)
    check("ring KV == full cache", ring_eng.generate([rp], rsp) == full_out,
          f"ring {ring_eng.cache.max_seq}/512")

    # speculative: greedy-exact + stochastic acceptance run compiled
    rep = (list(map(int, rng.integers(0, cfg.vocab_size, 6))) * 4)[:20]
    spec = DecodeEngine(params, cfg, max_batch=1, max_seq=128,
                        quantized_kv=False, speculative="ngram")
    plain = DecodeEngine(params, cfg, max_batch=1, max_seq=128,
                         quantized_kv=False)
    sp8 = SamplingParams(max_new_tokens=8)
    check("speculative greedy == plain greedy",
          spec.generate([rep], sp8) == plain.generate([rep], sp8))
    spec2 = DecodeEngine(params, cfg, max_batch=1, max_seq=128,
                         quantized_kv=False, speculative="ngram")
    out2 = spec2.generate([rep], SamplingParams(max_new_tokens=8,
                                                temperature=0.8))[0]
    check("speculative sampled path runs",
          len(out2) == 8 and spec2.spec_stats["verify_steps"] > 0)

    if FAILS:
        print(f"\n{len(FAILS)} FAILURES: {FAILS}")
        return 1
    print("\nall family/serving smokes passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
