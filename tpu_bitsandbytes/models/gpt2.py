"""GPT-2-class model built from nn.Module — the `quantize_model` test vehicle.

BASELINE.json config 2: "GPT-2-124M fully quantized via quantize_model
(NF4 + Embedding4bit), greedy-decode perplexity check". This model uses the
module system so the L4 surgery path (integration.py) applies to it exactly
like the reference applies to HF torch models.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.base import Module
from ..nn.linear import Embedding, Linear
from .layers import layer_norm


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @staticmethod
    def gpt2_124m() -> "GPT2Config":
        return GPT2Config()

    @staticmethod
    def tiny() -> "GPT2Config":
        return GPT2Config(vocab_size=256, n_positions=64, n_embd=64,
                          n_layer=2, n_head=4)


class LayerNorm(Module):
    def __init__(self, dim: int, eps: float = 1e-5, dtype=jnp.bfloat16):
        self.eps = float(eps)
        self.weight = jnp.ones((dim,), dtype)
        self.bias = jnp.zeros((dim,), dtype)

    def forward(self, x):
        return layer_norm(x, self.weight, self.bias, self.eps)


class GPT2Attention(Module):
    def __init__(self, config: GPT2Config, key):
        k1, k2 = jax.random.split(key)
        self.n_head = config.n_head
        self.n_embd = config.n_embd
        self.c_attn = Linear(config.n_embd, 3 * config.n_embd,
                             dtype=config.dtype, key=k1)
        self.c_proj = Linear(config.n_embd, config.n_embd,
                             dtype=config.dtype, key=k2)

    def forward(self, x):
        b, s, e = x.shape
        hd = e // self.n_head
        qkv = self.c_attn(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.n_head, hd)
        k = k.reshape(b, s, self.n_head, hd)
        v = v.reshape(b, s, self.n_head, hd)
        logits = jnp.einsum("bshd,bthd->bhst", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / np.sqrt(hd)
        mask = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(mask[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhst,bthd->bshd", probs, v.astype(jnp.float32))
        return self.c_proj(out.reshape(b, s, e).astype(x.dtype))


class GPT2MLP(Module):
    def __init__(self, config: GPT2Config, key):
        k1, k2 = jax.random.split(key)
        self.c_fc = Linear(config.n_embd, 4 * config.n_embd,
                           dtype=config.dtype, key=k1)
        self.c_proj = Linear(4 * config.n_embd, config.n_embd,
                             dtype=config.dtype, key=k2)

    def forward(self, x):
        return self.c_proj(jax.nn.gelu(self.c_fc(x)))


class GPT2Block(Module):
    def __init__(self, config: GPT2Config, key):
        k1, k2 = jax.random.split(key)
        self.ln_1 = LayerNorm(config.n_embd, config.layer_norm_eps, config.dtype)
        self.attn = GPT2Attention(config, k1)
        self.ln_2 = LayerNorm(config.n_embd, config.layer_norm_eps, config.dtype)
        self.mlp = GPT2MLP(config, k2)

    def forward(self, x):
        x = x + self.attn(self.ln_1(x))
        x = x + self.mlp(self.ln_2(x))
        return x


class GPT2LMHeadModel(Module):
    """Decoder-only LM: wte/wpe + blocks + tied lm_head."""

    def __init__(self, config: GPT2Config, key: Optional[jax.Array] = None):
        key = key if key is not None else jax.random.PRNGKey(0)
        keys = jax.random.split(key, config.n_layer + 3)
        self.config_vocab = config.vocab_size
        self.n_positions = config.n_positions
        self.wte = Embedding(config.vocab_size, config.n_embd,
                             dtype=config.dtype, key=keys[-1])
        self.wpe = Embedding(config.n_positions, config.n_embd,
                             dtype=config.dtype, key=keys[-2])
        self.h = [GPT2Block(config, keys[i]) for i in range(config.n_layer)]
        self.ln_f = LayerNorm(config.n_embd, config.layer_norm_eps, config.dtype)
        self.lm_head = Linear(config.n_embd, config.vocab_size, bias=False,
                              dtype=config.dtype, key=keys[-3])

    def forward(self, input_ids):
        b, s = input_ids.shape
        pos = jnp.arange(s)[None, :]
        x = self.wte(input_ids) + self.wpe(pos)
        for block in self.h:
            x = block(x)
        x = self.ln_f(x)
        return self.lm_head(x)

    def generate_greedy(self, input_ids, max_new_tokens: int = 16):
        """Simple greedy decode (re-runs the prefix — the fast cached decode
        path lives in the engine, this is the parity demo)."""
        ids = jnp.asarray(input_ids)
        for _ in range(max_new_tokens):
            logits = self(ids)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1)[:, None]
            ids = jnp.concatenate([ids, nxt], axis=1)
        return ids


def perplexity(model, token_batches) -> float:
    """Mean token perplexity of a module-based LM over [B, S] batches."""
    total_nll, total_tok = 0.0, 0
    for ids in token_batches:
        ids = jnp.asarray(ids)
        logits = model(ids).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        total_nll += float(jnp.sum(nll))
        total_tok += int(tgt.size)
    return float(np.exp(total_nll / max(total_tok, 1)))
