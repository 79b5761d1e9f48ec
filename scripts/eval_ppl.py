"""BASELINE config 2: quantization perplexity gate, ASSERTED.

With a local HF GPT-2 checkpoint + a text file this evaluates real
perplexity. Without one it trains the calibrated proxy
(tpu_bitsandbytes/utils/proxy.py) — a tiny Llama on a structured Zipf
corpus — and gates NF4 / double-quant / int8-runtime-cache / quantized-KV
perplexity deltas against the reference-calibrated bound (0.1 absolute at
ppl 5.68 ≈ 1.8 % relative; asserted at 2 %). Exits nonzero on violation.

Usage:
  python scripts/eval_ppl.py [--model /path/to/gpt2] [--text file.txt]
                             [--gate 0.02]
"""

import argparse
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tpu_bitsandbytes as tbnb
from tpu_bitsandbytes.models import gpt2
from tpu_bitsandbytes.nn.embedding import Embedding4bit
from tpu_bitsandbytes.nn.linear import Embedding


def proxy_gate(gate: float) -> None:
    """Trained-proxy ppl gate (no checkpoint available)."""
    from tpu_bitsandbytes.models import llama
    from tpu_bitsandbytes.utils import proxy

    cfg = llama.LlamaConfig(vocab_size=256, hidden_size=192,
                            intermediate_size=384, num_layers=2, num_heads=4,
                            num_kv_heads=4, max_seq_len=128,
                            dtype=jnp.float32)
    corpus = proxy.make_corpus(0, cfg.vocab_size, 24000)
    print("training proxy LM on structured Zipf corpus...", file=sys.stderr)
    params, train_ppl = proxy.train_proxy_lm(cfg, corpus[:20000], steps=250,
                                             batch=16, seq=48)
    ev = proxy.eval_batches(corpus[20000:], batch=8, seq=48)
    ppl_fp = proxy.teacher_forced_ppl(params, cfg, ev)
    print(f"proxy fp32 ppl {ppl_fp:.3f} (uniform = {cfg.vocab_size})")
    assert ppl_fp < cfg.vocab_size / 5, "proxy failed to learn; gate void"

    failures = []
    for name, build in [
        ("nf4", lambda: llama.quantize_params(
            params, blocksize=64, dtype=jnp.float32)),
        ("nf4+dq", lambda: llama.quantize_params(
            params, blocksize=64, dtype=jnp.float32,
            compress_statistics=True)),
        ("nf4+int8cache", lambda: llama.build_runtime_cache(
            llama.quantize_params(params, blocksize=64, dtype=jnp.float32),
            "int8")),
    ]:
        ppl_q = proxy.teacher_forced_ppl(build(), cfg, ev)
        rel = ppl_q / ppl_fp - 1
        ok = abs(rel) <= gate
        print(f"{name:15s} ppl {ppl_q:.3f}  delta {rel*100:+.3f}%  "
              f"{'ok' if ok else 'FAIL'}")
        if not ok:
            failures.append(name)

    q = llama.quantize_params(params, blocksize=64, dtype=jnp.float32)
    p_fp = proxy.decode_ppl(q, cfg, ev[:, :33], quantized_kv=False)
    p_i8 = proxy.decode_ppl(q, cfg, ev[:, :33], quantized_kv=True)
    rel = p_i8 / p_fp - 1
    ok = abs(rel) <= gate
    print(f"{'int8 KV decode':15s} ppl {p_i8:.3f}  delta {rel*100:+.3f}%  "
          f"{'ok' if ok else 'FAIL'}")
    if not ok:
        failures.append("int8-kv")
    if failures:
        print(f"PPL GATE FAILED: {failures}", file=sys.stderr)
        sys.exit(1)
    print("ppl gate passed")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--text", default=None)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--gate", type=float, default=0.02,
                    help="max |relative ppl delta| (reference: 0.1/5.68)")
    args = ap.parse_args()

    if not args.model:
        proxy_gate(args.gate)
        return

    if args.model:
        import transformers
        from tpu_bitsandbytes.utils import gpt2_params_from_state_dict
        hf = transformers.AutoModelForCausalLM.from_pretrained(
            args.model, local_files_only=True)
        cfg = gpt2.GPT2Config(
            vocab_size=hf.config.vocab_size,
            n_positions=hf.config.n_positions, n_embd=hf.config.n_embd,
            n_layer=hf.config.n_layer, n_head=hf.config.n_head,
            dtype=jnp.float32)
        model = gpt2_params_from_state_dict(hf.state_dict(), cfg,
                                            dtype=jnp.float32)
        tok = transformers.AutoTokenizer.from_pretrained(
            args.model, local_files_only=True)
        text = open(args.text).read() if args.text else (
            "The quick brown fox jumps over the lazy dog. " * 200)
        ids = tok(text)["input_ids"]
    else:
        print("no --model: random GPT-2-124M-shaped weights", file=sys.stderr)
        cfg = gpt2.GPT2Config(vocab_size=2048, n_positions=256, n_embd=256,
                              n_layer=4, n_head=8, dtype=jnp.float32)
        model = gpt2.GPT2LMHeadModel(cfg, jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        ids = list(rng.integers(0, cfg.vocab_size,
                                args.batches * args.seq + 1))

    batches = []
    for i in range(args.batches):
        chunk = ids[i * args.seq:(i + 1) * args.seq + 1]
        if len(chunk) < args.seq + 1:
            break
        batches.append(np.asarray(chunk)[None, :])

    ppl_fp = gpt2.perplexity(model, batches)
    print(f"fp32 perplexity: {ppl_fp:.4f}")

    qcfg = tbnb.BitsAndBytesConfig(load_in_4bit=True,
                                   bnb_4bit_compute_dtype=jnp.float32)
    qmodel = tbnb.quantize_model(model, qcfg)
    # quantize embeddings too (full config-2: NF4 + Embedding4bit)
    if isinstance(qmodel.wte, Embedding) and qmodel.wte.embedding_dim % 2 == 0:
        qmodel.wte = Embedding4bit.from_embedding(qmodel.wte)
    ppl_q = gpt2.perplexity(qmodel, batches)
    print(f"nf4  perplexity: {ppl_q:.4f}")
    delta = ppl_q - ppl_fp
    print(f"ppl delta: {delta:+.4f}  ({delta / ppl_fp * 100:+.2f}%)")
    # greedy-decode sanity
    out = qmodel.generate_greedy(jnp.asarray(batches[0][:, :8]),
                                 max_new_tokens=8)
    print(f"greedy decode ok: {out.shape}")


if __name__ == "__main__":
    main()
