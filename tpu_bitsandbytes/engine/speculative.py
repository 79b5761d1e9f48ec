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


def accept_and_emit(logits, tokens, key, samp):
    """Point-mass-draft speculative acceptance (pure function, unit-tested
    against the speculative-sampling theorem in tests/test_speculative.py).

    logits [B, G1, V] — raw model logits after consuming tokens[:, :j+1];
    tokens [B, G1] = [last emitted, G drafts]; ``samp`` per-slot
    SamplingArrays. Greedy rows (temperature<=0) accept by exact argmax
    match (token-identical to plain greedy decoding). Sampled rows accept
    draft d at position j with probability p_j(d) where p_j is the row's
    temperature/top-k/top-p-processed distribution; the boundary token is
    drawn from the residual norm(p_j with d masked) on rejection and from
    p_G on full acceptance — exactly the autoregressive sampling
    distribution (speculative sampling with a deterministic proposal).

    Returns (emitted [B, G1], n_acc [B]).
    """
    b, g1 = tokens.shape
    g = g1 - 1
    logits = logits.astype(jnp.float32)
    v = logits.shape[-1]
    from .sampler import filter_logits
    flat = filter_logits(logits.reshape(b * g1, v),
                         jnp.repeat(samp.temperature, g1),
                         jnp.repeat(samp.top_k, g1),
                         jnp.repeat(samp.top_p, g1)).reshape(b, g1, v)
    probs = jax.nn.softmax(flat, axis=-1)
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)    # greedy targets
    drafts = tokens[:, 1:]                                   # [B, G]
    greedy_row = samp.temperature <= 0.0                     # [B]

    key, k_u, k_r = jax.random.split(key, 3)
    p_draft = jnp.take_along_axis(probs[:, :-1], drafts[..., None],
                                  axis=-1)[..., 0]           # [B, G]
    u = jax.random.uniform(k_u, (b, g))
    acc = jnp.where(greedy_row[:, None], preds[:, :-1] == drafts,
                    u < p_draft)
    n_acc = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)

    # boundary token: residual sample on rejection, plain sample on full
    # acceptance (n_acc == G); greedy rows take the argmax either way
    f_b = jnp.take_along_axis(flat, n_acc[:, None, None], axis=1)[:, 0]
    d_b = jnp.take_along_axis(drafts, jnp.clip(n_acc, 0, g - 1)[:, None],
                              axis=1)[:, 0]                  # rejected draft
    is_reject = n_acc < g
    resid = jnp.where(
        is_reject[:, None] & (jnp.arange(v)[None, :] == d_b[:, None]),
        -jnp.inf, f_b)
    sampled_b = jax.random.categorical(k_r, resid, axis=-1).astype(jnp.int32)
    greedy_b = jnp.take_along_axis(preds, n_acc[:, None], axis=1)[:, 0]
    bonus = jnp.where(greedy_row, greedy_b, sampled_b)[:, None]

    j = jnp.arange(g1)[None, :]
    shifted = jnp.concatenate(
        [drafts, jnp.zeros((b, 1), jnp.int32)], axis=1)
    emitted = jnp.where(j < n_acc[:, None], shifted,
                        jnp.where(j == n_acc[:, None], bonus, 0))
    return emitted, n_acc


def _verify_impl(params, cache: KVCache, tokens, active, key, samp,
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
    x = llama._norm(x, params["final_norm"], config)
    logits = llama.head_logits(params, x, config)            # [B, G1, V]
    emitted, n_acc = accept_and_emit(logits, tokens, key, samp)
    counts = jnp.where(active, n_acc + 1, 0).astype(jnp.int32)
    cache = dataclasses.replace(cache, lengths=base + counts)
    return emitted, counts, cache


@partial(jax.jit, static_argnames=("config", "attn_span"),
         donate_argnums=(1,))
def verify_step(params, cache: KVCache, tokens: jnp.ndarray,
                active: jnp.ndarray, key: jax.Array, samp,
                config: llama.LlamaConfig,
                attn_span: Optional[int] = None):
    """One speculative verify: tokens [B, gamma+1] = [last emitted, drafts].

    Returns (emitted [B, gamma+1], counts [B], cache). Per active slot the
    first ``counts`` entries of ``emitted`` are the accepted drafts followed
    by the boundary token (counts >= 1 always — zero accepted drafts
    degenerates into an ordinary decode step). Greedy slots accept by exact
    match (token-identical to plain greedy); sampled slots use rejection
    acceptance that preserves the exact sampling distribution (see
    accept_and_emit). ``attn_span`` must cover every active slot's
    length + gamma + 1.
    """
    return _verify_impl(params, cache, tokens, active, key, samp, config,
                        attn_span)
