"""Interactive chat demo on the NF4 decode engine (reference: demo/chat.py).

With a local HF checkpoint directory it loads + quantizes the real model —
any supported family (Llama/Llama-3, Qwen2/2.5, Mistral, Gemma, Gemma2; the
conversion reads the family off the HF config). Without one it falls back to
a random-weight tiny Llama so the engine loop is demonstrable in any
environment (this sandbox has no network). Tokens stream as they decode.

Usage:
  python demo/chat.py [--model /path/to/hf/checkpoint] [--max-new 64]
"""

import argparse
import os
import sys

# runnable as `python demo/chat.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="local HF checkpoint directory "
                         "(Llama/Qwen2/Mistral/Gemma/Gemma2)")
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    args = ap.parse_args()

    from tpu_bitsandbytes.models import llama
    from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams

    tokenizer = None
    if args.model:
        from transformers import AutoTokenizer
        from tpu_bitsandbytes.utils import load_llama_from_pretrained
        print(f"loading + NF4-quantizing {args.model} ...")
        config, params = load_llama_from_pretrained(args.model, quantize=True)
        tokenizer = AutoTokenizer.from_pretrained(args.model,
                                                  local_files_only=True)
    else:
        print("no --model given: using a random tiny Llama (engine demo only)")
        config = llama.LlamaConfig(
            vocab_size=1024, hidden_size=256, intermediate_size=512,
            num_layers=2, num_heads=4, num_kv_heads=4, max_seq_len=512)
        params = llama.quantize_params(
            llama.init_params(jax.random.PRNGKey(0), config))

    engine = DecodeEngine(params, config, max_batch=1,
                          max_seq=min(config.max_seq_len, 2048))
    sp = SamplingParams(
        temperature=args.temperature, max_new_tokens=args.max_new,
        eos_token_id=(tokenizer.eos_token_id if tokenizer else None))

    print("type a prompt (empty line to exit)")
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            break
        if tokenizer:
            ids = tokenizer(line)["input_ids"]
        else:
            ids = [ord(c) % 1024 for c in line]
        # stream tokens as decode chunks complete
        out, shown = [], 0
        for _, tok, _done in engine.generate_stream([ids], sp):
            out.append(tok)
            if tokenizer:
                text = tokenizer.decode(out, skip_special_tokens=True)
                print(text[shown:], end="", flush=True)
                shown = len(text)
        if tokenizer:
            print()
        else:
            print(f"(random-model tokens) {out}")


if __name__ == "__main__":
    main()
