"""Speculative decoding: prompt-lookup drafts + a greedy-exact verify step.

Draft-model-free speculation (the reference engine decodes strictly one
token per forward — demo/chat.py drives HF ``generate``): drafts come from
an n-gram lookup in the slot's own token history ("prompt lookup
decoding"), and one jitted **verify step** scores all gamma+1 positions in
a single forward. Greedy acceptance keeps the output *token-identical* to
ordinary greedy decoding (tests/test_speculative.py proves it at f32;
at bf16 the S=gamma+1 program rounds differently from the S=1 program, so
argmaxes tied within ~1e-3 can flip — the batch-size-numerics caveat every
batched serving engine carries) while a verify step costs barely more than
a single-token step — the decode-step cost is the weight stream, which
S = gamma+1 genuine query rows amortize (the KERNEL_NOTES "multi-token
decode" item).

Mechanics: the drafts' KV is written up front (one scatter per layer,
KVCache.write_decode with [B, S] positions); rejected positions hold stale
entries that the per-query causal mask keeps unattended until they are
overwritten — the same garbage-KV contract prefill already relies on.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from ..models import llama
from ..models.layers import linear_apply, rms_norm
from .kvcache import KVCache


def propose_ngram(history: List[int], gamma: int, n: int = 3) -> List[int]:
    """Prompt-lookup proposal: find the most recent earlier occurrence of
    the trailing ``n``-gram and return up to ``gamma`` tokens that followed
    it. Empty when the history has no repeat to exploit."""
    if len(history) < n + 1 or gamma <= 0:
        return []
    key = history[-n:]
    for start in range(len(history) - n - 1, -1, -1):
        if history[start:start + n] == key:
            cont = history[start + n:start + n + gamma]
            if cont:
                return [int(t) for t in cont]
    return []


def _verify_impl(params, cache: KVCache, tokens, active,
                 config: llama.LlamaConfig, attn_span=None):
    b, g1 = tokens.shape
    base = cache.lengths
    positions = base[:, None] + jnp.arange(g1)[None, :]
    x, cos, sin = llama.decode_embed_and_rope(params, tokens, positions,
                                              config)
    for li, layer in enumerate(params["layers"]):
        x, cache = llama.decode_layer(
            layer, x, cos, sin, positions, cache, li, config,
            n_heads=config.num_heads, n_kv=config.num_kv_heads,
            attn_span=attn_span)
    x = rms_norm(x, params["final_norm"], config.rms_eps,
                 config.rms_weight_offset)
    logits = llama.head_logits(params, x, config)            # [B, G1, V]
    preds = jnp.argmax(logits, axis=-1
                       ).astype(jnp.int32)                   # greedy targets
    # accepted drafts: longest prefix where the model's greedy choice after
    # consuming tokens[:, :j+1] equals the draft tokens[:, j+1]
    match = preds[:, :-1] == tokens[:, 1:]                   # [B, G]
    n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
    bonus = jnp.take_along_axis(preds, n_acc[:, None], axis=1)   # [B, 1]
    j = jnp.arange(g1)[None, :]
    shifted = jnp.concatenate(
        [tokens[:, 1:], jnp.zeros((b, 1), jnp.int32)], axis=1)
    emitted = jnp.where(j < n_acc[:, None], shifted,
                        jnp.where(j == n_acc[:, None], bonus, 0))
    counts = jnp.where(active, n_acc + 1, 0).astype(jnp.int32)
    cache = dataclasses.replace(cache, lengths=base + counts)
    return emitted, counts, cache


@partial(jax.jit, static_argnames=("config", "attn_span"),
         donate_argnums=(1,))
def verify_step(params, cache: KVCache, tokens: jnp.ndarray,
                active: jnp.ndarray, config: llama.LlamaConfig,
                attn_span: Optional[int] = None):
    """One speculative verify: tokens [B, gamma+1] = [last emitted, drafts].

    Returns (emitted [B, gamma+1], counts [B], cache). Per active slot the
    first ``counts`` entries of ``emitted`` are the accepted drafts followed
    by the model's bonus token (counts >= 1 always — zero accepted drafts
    degenerates into an ordinary greedy decode step). ``attn_span`` must
    cover every active slot's length + gamma + 1.
    """
    return _verify_impl(params, cache, tokens, active, config, attn_span)
