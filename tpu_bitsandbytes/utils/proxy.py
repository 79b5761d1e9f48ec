"""Calibrated proxy for quantization-accuracy gates.

No pretrained checkpoints exist in this environment, and a random-init
model is a useless ppl oracle (its logits are near-uniform, so quantization
error barely moves NLL). This module builds the strongest stand-in that can
be constructed hermetically:

1. a **structured synthetic corpus** — Zipfian unigram marginals plus a
   local copy/bigram process, so there is real signal to learn;
2. a **tiny Llama trained on it** for a few hundred AdamW steps — trained
   weights have the anisotropic, heavy-tailed per-tensor spectra that make
   quantization error visible (random init does not);
3. **teacher-forced NLL** evaluators for the full forward and for the
   decode path through the (optionally int8-quantized) KV cache.

The ppl gate itself (reference BASELINE: |Δppl| ≤ 0.1 at ppl ≈ 5.68, i.e.
≈ 1.8 % relative) is asserted in tests/test_ppl_gate.py and
scripts/eval_ppl.py against this proxy.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama


def make_corpus(seed: int, vocab: int, length: int,
                alpha: float = 1.15, copy_p: float = 0.35,
                copy_back: int = 8) -> np.ndarray:
    """Token stream with Zipf(alpha) marginals + local copy structure.

    With probability ``copy_p`` a token repeats the one ``copy_back``
    positions earlier (learnable long-range structure); otherwise it is an
    independent Zipf draw. Both components are things a small LM actually
    learns, so trained-model NLL sits well below uniform.
    """
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = ranks ** (-alpha)
    probs /= probs.sum()
    base = rng.choice(vocab, size=length, p=probs)
    out = base.copy()
    copies = rng.random(length) < copy_p
    for i in range(copy_back, length):
        if copies[i]:
            out[i] = out[i - copy_back]
    return out.astype(np.int32)


def _loss_fn(params, tokens, config):
    logits = llama.forward(params, tokens, config).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def train_proxy_lm(config: llama.LlamaConfig, corpus: np.ndarray,
                   steps: int = 300, batch: int = 16, seq: int = 64,
                   lr: float = 1e-3, seed: int = 0):
    """Train a tiny Llama on the corpus; returns (params, final ppl)."""
    import optax
    params = llama.init_params(jax.random.PRNGKey(seed), config,
                               dtype=jnp.float32)
    opt = optax.adamw(lr, weight_decay=0.01)
    opt_state = opt.init(params)

    n_windows = len(corpus) - seq - 1

    @jax.jit
    def step(params, opt_state, key):
        starts = jax.random.randint(key, (batch,), 0, n_windows)
        toks = jax.vmap(
            lambda s: jax.lax.dynamic_slice(corpus_dev, (s,), (seq + 1,))
        )(starts)
        loss, grads = jax.value_and_grad(_loss_fn)(params, toks, config)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    corpus_dev = jnp.asarray(corpus)
    key = jax.random.PRNGKey(seed + 1)
    loss = jnp.inf
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
    return params, float(jnp.exp(loss))


def teacher_forced_ppl(params, config: llama.LlamaConfig,
                       tokens: np.ndarray) -> float:
    """Corpus perplexity via the full forward. tokens [B, S+1]."""
    return float(np.exp(_loss_fn(params, jnp.asarray(tokens), config)))


def decode_ppl(params, config: llama.LlamaConfig, tokens: np.ndarray,
               quantized_kv: bool) -> float:
    """Teacher-forced perplexity through the decode path + KV cache.

    Feeds each token through the engine's cached ``decode_step`` and scores
    the next token, so KV-cache quantization error (engine/kvcache.py
    ``_quant``) shows up in the number — the forward-only ppl cannot see it.
    """
    from ..engine import KVCache
    from ..engine.engine import decode_step
    toks = jnp.asarray(tokens)
    b, s1 = toks.shape
    s = s1 - 1
    cache = KVCache.create(config.num_layers, b, s1, config.num_kv_heads,
                           config.hd, quantized=quantized_kv,
                           dtype=jnp.float32 if config.dtype == jnp.float32
                           else config.dtype)
    active = jnp.ones((b,), bool)
    total = 0.0
    for t in range(s):
        logits, cache = decode_step(params, cache, toks[:, t], active, config)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        total += float(jnp.mean(
            -jnp.take_along_axis(logp, toks[:, t + 1][:, None], axis=-1)))
    return float(np.exp(total / s))


def eval_batches(corpus: np.ndarray, batch: int, seq: int,
                 offset: int = 0) -> np.ndarray:
    """Deterministic eval windows [batch, seq+1] from the corpus tail."""
    rows = []
    for i in range(batch):
        start = offset + i * (seq + 1)
        rows.append(corpus[start:start + seq + 1])
    return np.stack(rows)
