"""BASELINE config 2: GPT-2-124M fully quantized via quantize_model,
greedy-decode + perplexity-delta check (fp vs NF4, incl. Embedding4bit).

With a local HF GPT-2 checkpoint + a text file this evaluates real
perplexity; without one it runs the same pipeline on random weights and
reports the quantization-induced ppl delta (which must stay small either
way — the ppl-delta gate, BASELINE.md).

Usage:
  python scripts/eval_ppl.py [--model /path/to/gpt2] [--text file.txt]
"""

import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import tpu_bitsandbytes as tbnb
from tpu_bitsandbytes.models import gpt2
from tpu_bitsandbytes.nn.embedding import Embedding4bit
from tpu_bitsandbytes.nn.linear import Embedding


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--text", default=None)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

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
