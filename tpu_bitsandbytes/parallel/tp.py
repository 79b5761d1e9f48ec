"""Explicit tensor-parallel decode step via shard_map.

Megatron-style TP over a ``(dp, tp)`` mesh with packed 4-bit weights: every
device holds a column shard of q/k/v/gate/up (packed rows + their absmax
rows), a row shard of o/down, and the kv-head shard of the cache. The only
collectives on the decode path are one psum after o_proj and one after
down_proj per layer (riding ICI), plus one all_gather of the lm_head logits —
the fused dequant-matmul runs purely on local shards, so compute and
communication partition exactly as SURVEY §7 prescribes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..engine.kvcache import KVCache
from ..models import llama
from ..models.layers import QLinear4, linear_apply, rms_norm
from .sharding import kv_cache_spec, llama_param_specs, spec_tree


def _localize(w, strip_bias: bool = False, tp: int = 1,
              row: bool = False):
    """Fix static shape metadata of a QLinear4 shard to its local arrays.

    ``strip_bias``: row-parallel linears must not add their bias per shard —
    the psum would multiply it by tp. The caller re-adds it once after the
    reduction.

    ``tp``/``row``: cache-only int4 shards (packed dropped) carry grid-tile
    padding in ``w_cache``, so the logical local dims derive from the
    global ``shape`` instead (build_sharded_int4_cache pads each tp shard
    uniformly); ``n_out`` then slices the pad rows off in int4_matmul.
    """
    if isinstance(w, QLinear4):
        if w.packed is not None:
            n, k = w.packed.shape[0], 2 * w.packed.shape[1]
        elif w.w_cache.dtype == jnp.int4:
            gn, gk = w.shape
            n, k = (gn, gk // tp) if row else (gn // tp, gk)
        else:
            n, k = w.w_cache.shape
        st = w.absmax_state
        if st is not None:
            # Per-row nested layout: blocksize tracks the local blocks/row
            # (the per-row scale is exact on any column subset).
            n_l, nb_l = w.absmax_q.shape
            st = dataclasses.replace(st, shape=(n_l, nb_l), blocksize=nb_l)
        lw = dataclasses.replace(w, shape=(n, k), absmax_state=st,
                                 bias=None if strip_bias else w.bias)
        if row and tp > 1 and w.w_cache is not None \
                and w.w_cache.dtype == jnp.int4:
            # int4 A8 kernel on a row-parallel shard: mark the tp axis so
            # the activation row-max is pmax'd (int4cache._make_int4_mm) —
            # per-shard scales would diverge from the single-device engine
            object.__setattr__(lw, "_tp_axis", "tp")
        return lw
    if isinstance(w, dict) and strip_bias:        # fp {'w','b'} leaf
        return {"w": w["w"], "b": None}
    return w


def _row_bias(w):
    if isinstance(w, QLinear4):
        return w.bias
    if isinstance(w, dict):
        return w.get("b")
    return None


def _tp_decode_impl(params, cache: KVCache, tokens, active,
                    config: llama.LlamaConfig, tp_axis: str = "tp",
                    attn_span=None, attn_start: int = 0):
    """Per-device body (inside shard_map). tokens/active are dp-local."""
    b = tokens.shape[0]
    tp = jax.lax.psum(1, tp_axis)
    hd = config.hd
    n_heads = config.num_heads // tp
    n_kv = config.num_kv_heads // tp

    positions = cache.lengths
    x, cos, sin = llama.decode_embed_and_rope(params, tokens, positions,
                                              config)

    def wrap(w, row=False):
        # localize shard metadata; row-parallel biases are stripped here and
        # re-added once after the psum (else they'd be summed tp times)
        return _localize(w, strip_bias=row, tp=tp, row=row)

    def reduce_fn(partial, w):
        full = jax.lax.psum(partial, tp_axis)
        bias = _row_bias(w)
        return full if bias is None else full + bias.astype(full.dtype)

    for li, layer in enumerate(params["layers"]):
        x, cache = llama.decode_layer(
            layer, x, cos, sin, positions, cache, li, config,
            n_heads=n_heads, n_kv=n_kv, wrap=wrap, reduce_fn=reduce_fn,
            attn_span=attn_span, attn_start=attn_start)

    x = llama._norm(x, params["final_norm"], config)
    head = params.get("lm_head", None)
    if head is None:
        logits = x[:, 0] @ params["embed"].T.astype(x.dtype)
    else:
        local = linear_apply(_localize(head, tp=tp), x[:, 0])   # [B, V/tp]
        logits = jax.lax.all_gather(local, tp_axis, axis=1, tiled=True)
    # epilogue applied AFTER assembling the full logits (all_gather)
    logits = llama.finish_logits(logits, config)
    cache = dataclasses.replace(
        cache, lengths=cache.lengths + active.astype(jnp.int32))
    cache = cache.advance_stage()
    return logits, cache


def _tp_decode_chunk_impl(params, cache: KVCache, tokens, active, key, samp,
                          seen_mask, config: llama.LlamaConfig,
                          n_steps: int = 8,
                          all_greedy: bool = False, attn_span=None,
                          attn_start: int = 0,
                          want_logprobs: bool = False,
                          window_stage: bool = True,
                          tp_axis: str = "tp", dp_axis: str = "dp"):
    """n_steps TP decode steps + on-device sampling in one shard_map body —
    the mesh counterpart of engine.decode_chunk (one dispatch per chunk
    instead of one per token, with the same EOS/dead-slot semantics).
    tokens/active/samp/seen_mask are dp-local; ``key`` is replicated and
    folded with the dp index so each dp group draws an independent stream
    (greedy output is key-independent, keeping mesh == single-device
    tokens). ``seen_mask`` [B_local, V] drives the repetition penalty (an
    all-False mask is a no-op — the mesh chunk always threads it so one
    compiled program serves both); per-token model logprobs are emitted
    like engine.decode_chunk's."""
    max_seq = cache.max_positions or cache.max_seq   # absolute room bound
    b = tokens.shape[0]
    key = jax.random.fold_in(key, jax.lax.axis_index(dp_axis))

    def body(carry, _):
        cache, tokens, active, key, seen = carry
        logits, cache = _tp_decode_impl(params, cache, tokens, active,
                                        config, tp_axis, attn_span,
                                        attn_start)
        key, sub = jax.random.split(key)
        from ..engine.sampler import apply_repetition_penalty, sample_batched
        pen_logits = apply_repetition_penalty(logits, seen, samp.rep_pen)
        if all_greedy:
            toks = jnp.argmax(pen_logits, axis=-1).astype(jnp.int32)
        else:
            toks = sample_batched(pen_logits, sub, samp)
        toks = jnp.where(active, toks, tokens)
        if want_logprobs:   # static: skip the [B, V] log_softmax when unused
            lp_full = jax.nn.log_softmax(logits, axis=-1)
            lp = jnp.take_along_axis(lp_full, toks[:, None], axis=-1)[:, 0]
        else:
            lp = jnp.zeros((b,), jnp.float32)
        rows = jnp.arange(b)
        seen = seen.at[rows, toks].set(seen[rows, toks] | active)
        emitted_by = active
        hit_eos = active & (toks == samp.eos_id)
        active = active & ~hit_eos & (cache.lengths < max_seq - 1)
        return (cache, toks, active, key, seen), (toks, emitted_by, lp)

    cache = cache.begin_stage(n_steps, span=attn_span, start=attn_start,
                              window=window_stage)
    if cache.stage is not None:
        # keep the immutable KV planes out of the scan carry (same
        # full-buffer-copy avoidance as engine.decode_chunk)
        base = cache

        def body_staged(carry, _):
            stage, lengths, tokens, active, key, seen = carry
            cache_t = dataclasses.replace(base, stage=stage,
                                          lengths=lengths)
            (cache_t, toks, active, key, seen), outs = body(
                (cache_t, tokens, active, key, seen), _)
            return ((cache_t.stage, cache_t.lengths, toks, active, key,
                     seen), outs)

        ((stage, lengths, tokens, active, key, seen_mask),
         (toks_seq, act_seq, lp_seq)) = jax.lax.scan(
            body_staged,
            (cache.stage, cache.lengths, tokens, active, key, seen_mask),
            None, length=n_steps)
        cache = dataclasses.replace(base, stage=stage, lengths=lengths)
    else:
        (cache, tokens, active, key, seen_mask), \
            (toks_seq, act_seq, lp_seq) = jax.lax.scan(
                body, (cache, tokens, active, key, seen_mask), None,
                length=n_steps)
    cache = cache.flush_stage()
    return toks_seq, act_seq, cache, tokens, active, lp_seq, seen_mask


def _tp_verify_impl(params, cache: KVCache, tokens, active, key, samp,
                    config: llama.LlamaConfig, attn_span=None,
                    tp_axis: str = "tp", dp_axis: str = "dp"):
    """Per-device speculative-verify body (inside shard_map).

    The verify step is just an S=gamma+1 decode (VERDICT r3 #8 / the
    single-device engine.speculative._verify_impl) run on local TP shards:
    tokens [B_local, G1] = [last emitted, G drafts] per dp-local slot, the
    same per-layer psum schedule as _tp_decode_impl, the lm_head all_gather
    over ALL G1 positions, then the pure acceptance rule
    (speculative.accept_and_emit — greedy rows token-identical to plain
    greedy; sampled rows rejection-accepted). ``key`` is replicated and
    dp-folded so sampled rows draw independent streams per dp group.
    """
    b, g1 = tokens.shape
    tp = jax.lax.psum(1, tp_axis)
    n_heads = config.num_heads // tp
    n_kv = config.num_kv_heads // tp
    key = jax.random.fold_in(key, jax.lax.axis_index(dp_axis))

    base = cache.lengths
    positions = base[:, None] + jnp.arange(g1)[None, :]
    x, cos, sin = llama.decode_embed_and_rope(params, tokens, positions,
                                              config)

    def wrap(w, row=False):
        return _localize(w, strip_bias=row, tp=tp, row=row)

    def reduce_fn(part, w):
        full = jax.lax.psum(part, tp_axis)
        bias = _row_bias(w)
        return full if bias is None else full + bias.astype(full.dtype)

    for li, layer in enumerate(params["layers"]):
        x, cache = llama.decode_layer(
            layer, x, cos, sin, positions, cache, li, config,
            n_heads=n_heads, n_kv=n_kv, wrap=wrap, reduce_fn=reduce_fn,
            attn_span=attn_span)

    x = llama._norm(x, params["final_norm"], config)
    head = params.get("lm_head", None)
    if head is None:
        logits = x @ params["embed"].T.astype(x.dtype)     # [B, G1, V]
    else:
        local = linear_apply(_localize(head, tp=tp), x)           # [B, G1, V/tp]
        logits = jax.lax.all_gather(local, tp_axis, axis=2, tiled=True)
    logits = llama.finish_logits(logits, config)

    from ..engine.speculative import accept_and_emit
    emitted, n_acc = accept_and_emit(logits, tokens, key, samp)
    counts = jnp.where(active, n_acc + 1, 0).astype(jnp.int32)
    cache = dataclasses.replace(cache, lengths=base + counts)
    return emitted, counts, cache


def make_tp_verify_step(mesh: Mesh, params, config: llama.LlamaConfig,
                        cache: KVCache):
    """Build the jitted shard_map'ed speculative verify step (mesh mode).

    Returns ``fn(params, cache, tokens [B, G1], active [B], key, samp,
    attn_span=...)`` → (emitted [B, G1], counts [B], cache) with the same
    contract as engine.speculative.verify_step; tokens/active/samp are
    dp-sharded, emitted/counts come back dp-sharded (engine._host_read
    gathers them under multi-process meshes).
    """
    from ..engine.sampler import SamplingArrays
    pspecs = llama_param_specs(params)
    cspec = kv_cache_spec(cache)
    samp_spec = SamplingArrays(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"))

    @partial(jax.jit, static_argnames=("attn_span",), donate_argnums=(1,))
    def step(params, cache, tokens, active, key, samp, attn_span=None):
        fn = shard_map(
            partial(_tp_verify_impl, config=config, attn_span=attn_span),
            mesh=mesh,
            in_specs=(pspecs, cspec, P("dp", None), P("dp"), P(),
                      samp_spec),
            out_specs=(P("dp", None), P("dp"), cspec),
            check_vma=False,
        )
        return fn(params, cache, tokens, active, key, samp)

    return step


def _tp_prefill_impl(params, cache: KVCache, tokens, slot, true_len,
                     config: llama.LlamaConfig, tp_axis: str = "tp",
                     dp_axis: str = "dp"):
    """Per-device prefill body (inside shard_map).

    tokens [1, S_pad] replicated; every device runs the same forward on its
    weight shards (fused Pallas kernels run on local shards — no GSPMD
    custom-call limitation), and only the dp group owning ``slot`` commits
    the KV write (masked at the slice level, see KVCache.write_prefill).
    """
    tp = jax.lax.psum(1, tp_axis)
    n_heads = config.num_heads // tp
    n_kv = config.num_kv_heads // tp
    b, s = tokens.shape

    slots_per = cache.lengths.shape[0]          # dp-local slot count
    dp_idx = jax.lax.axis_index(dp_axis)
    own = (slot // slots_per) == dp_idx
    local_slot = slot % slots_per

    positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    from ..models.layers import rope_table
    cos_full, sin_full = rope_table(config.hd, config.max_seq_len,
                                    config.rope_theta, config.rope_scaling)
    cos = jnp.take(cos_full, positions, axis=0)
    sin = jnp.take(sin_full, positions, axis=0)
    x = llama._embed_tokens(params, tokens, config)

    def wrap(w, row=False):
        return _localize(w, strip_bias=row, tp=tp, row=row)

    def reduce_fn(partial, w):
        full = jax.lax.psum(partial, tp_axis)
        bias = _row_bias(w)
        return full if bias is None else full + bias.astype(full.dtype)

    for li, layer in enumerate(params["layers"]):
        x, (k, v) = llama.prefill_layer(
            layer, x, cos, sin, config, n_heads=n_heads, n_kv=n_kv,
            wrap=wrap, reduce_fn=reduce_fn, li=li)
        # valid_len: required in ring mode (padding past true_len would wrap
        # onto real earlier entries); harmless for the plain cache
        cache = cache.write_prefill(li, local_slot, k[0], v[0], 0, own=own,
                                    valid_len=true_len)

    cur = cache.lengths[local_slot]
    cache = dataclasses.replace(
        cache, lengths=cache.lengths.at[local_slot].set(
            jnp.where(own, true_len, cur)))

    x = llama._norm(x, params["final_norm"], config)
    # last real token only: [1, H] through the head instead of all S_pad rows
    x_last = jnp.take_along_axis(
        x[0], (true_len - 1)[None, None], axis=0)
    head = params.get("lm_head", None)
    if head is None:
        logits = x_last @ params["embed"].T.astype(x_last.dtype)
    else:
        local = linear_apply(_localize(head, tp=tp), x_last)   # [1, V/tp]
        logits = jax.lax.all_gather(local, tp_axis, axis=1, tiled=True)
    # epilogue applied AFTER assembling the full logits (all_gather)
    logits = llama.finish_logits(logits, config)
    return logits[0], cache


def make_tp_prefill_step(mesh: Mesh, params, config: llama.LlamaConfig,
                         cache: KVCache):
    """Build the jitted shard_map'ed prefill for sharded params/cache.

    Unlike the GSPMD prefill (engine.prefill_step_spmd), the fused Pallas
    dequant-matmul stays enabled: inside shard_map every kernel call sees
    plain local arrays (VERDICT r1: mesh prefill materialized dequantized
    weights). Recompiles per S_pad bucket like the single-device prefill.
    """
    pspecs = llama_param_specs(params)
    cspec = kv_cache_spec(cache)
    fn = shard_map(
        partial(_tp_prefill_impl, config=config),
        mesh=mesh,
        in_specs=(pspecs, cspec, P(None, None), P(), P()),
        out_specs=(P(), cspec),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(1,))


def make_tp_decode_chunk(mesh: Mesh, params, config: llama.LlamaConfig,
                         cache: KVCache, n_steps: int = 8):
    """Build the jitted shard_map'ed decode *chunk* (n_steps tokens per
    dispatch, sampling on device) for sharded params/cache.

    Returns ``fn(params, cache, tokens, active, key, samp, seen_mask,
    all_greedy=..., attn_span=...)`` → (toks_seq [n, B], act_seq [n, B],
    cache, last_tokens [B], active [B], lp_seq [n, B], seen_mask [B, V]).
    The RNG key is NOT returned (its evolved value is dp-group-local inside
    the shard_map); callers split a fresh key per dispatch like
    DecodeEngine.step does.
    """
    from ..engine.sampler import SamplingArrays
    pspecs = llama_param_specs(params)
    cspec = kv_cache_spec(cache)
    samp_spec = SamplingArrays(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"))

    @partial(jax.jit, static_argnames=("all_greedy", "attn_span",
                                       "attn_start", "want_logprobs",
                                       "window_stage"),
             donate_argnums=(1,))
    def chunk(params, cache, tokens, active, key, samp, seen_mask,
              all_greedy=False, attn_span=None, attn_start=0,
              want_logprobs=False, window_stage=True):
        fn = shard_map(
            partial(_tp_decode_chunk_impl, config=config, n_steps=n_steps,
                    all_greedy=all_greedy, attn_span=attn_span,
                    attn_start=attn_start, want_logprobs=want_logprobs,
                    window_stage=window_stage),
            mesh=mesh,
            in_specs=(pspecs, cspec, P("dp"), P("dp"), P(), samp_spec,
                      P("dp", None)),
            out_specs=(P(None, "dp"), P(None, "dp"), cspec, P("dp"),
                       P("dp"), P(None, "dp"), P("dp", None)),
            check_vma=False,
        )
        return fn(params, cache, tokens, active, key, samp, seen_mask)

    return chunk


def _tp_prefill_chunk_impl(params, cache: KVCache, tokens, slot, start,
                           new_len, config: llama.LlamaConfig,
                           attn_span=None, attn_start: int = 0,
                           tp_axis: str = "tp", dp_axis: str = "dp"):
    """Per-device body of one chunked-prefill step (inside shard_map).

    The mesh counterpart of engine.prefill_chunk_step: tokens [1, C]
    (replicated) are written into the dp-local shard of cache slot ``slot``
    at positions [start, start+C); the chunk's queries attend only to that
    slot's own history. dp ownership is enforced at the scatter level: the
    non-owning groups write through an out-of-bounds slot index (dropped,
    the same mechanism ring writes use to drop padding) and their attention
    reads garbage history — their hidden states are discarded by the
    owner-masked psum at the end, so every dp group returns the owner's x.
    """
    tp = jax.lax.psum(1, tp_axis)
    n_heads = config.num_heads // tp
    n_kv = config.num_kv_heads // tp
    c = tokens.shape[1]

    slots_per = cache.lengths.shape[0]          # dp-local slot count
    dp_idx = jax.lax.axis_index(dp_axis)
    own = (slot // slots_per) == dp_idx
    # out-of-bounds local slot for non-owners: scatter writes drop, the
    # dynamic_slice read clamps (garbage history, masked out below)
    local_slot = jnp.where(own, slot % slots_per, slots_per)

    positions = start + jnp.arange(c, dtype=jnp.int32)[None, :]
    x, cos, sin = llama.decode_embed_and_rope(params, tokens, positions,
                                              config)

    def wrap(w, row=False):
        return _localize(w, strip_bias=row, tp=tp, row=row)

    def reduce_fn(partial, w):
        full = jax.lax.psum(partial, tp_axis)
        bias = _row_bias(w)
        return full if bias is None else full + bias.astype(full.dtype)

    for li, layer in enumerate(params["layers"]):
        x, cache = llama.decode_layer(
            layer, x, cos, sin, positions, cache, li, config,
            n_heads=n_heads, n_kv=n_kv, wrap=wrap, reduce_fn=reduce_fn,
            attn_span=attn_span, slot=local_slot, attn_start=attn_start)

    # owner-masked length update (lengths[slot] tracks the prefill frontier
    # — load-bearing, see engine.prefill_chunk_step)
    ls = jnp.clip(local_slot, 0, slots_per - 1)
    cur = cache.lengths[ls]
    cache = dataclasses.replace(
        cache, lengths=cache.lengths.at[ls].set(
            jnp.where(own, new_len, cur)))
    # broadcast the owner's hidden states to every dp group (one [1,C,H]
    # psum per chunk; non-owners attended to garbage history)
    x = jax.lax.psum(jnp.where(own, x, jnp.zeros_like(x)), dp_axis)
    return x, cache


def make_tp_prefill_chunk(mesh: Mesh, params, config: llama.LlamaConfig,
                          cache: KVCache):
    """Build the jitted shard_map'ed chunked-prefill step (mesh mode).

    Returns ``fn(params, cache, tokens [1,C], slot, start, new_len,
    attn_span=..., attn_start=...)`` → (hidden [1, C, H] replicated, cache).
    Feed the final chunk's hidden to the builder from
    :func:`make_tp_final_logits`.
    """
    pspecs = llama_param_specs(params)
    cspec = kv_cache_spec(cache)

    @partial(jax.jit, static_argnames=("attn_span", "attn_start"),
             donate_argnums=(1,))
    def chunk(params, cache, tokens, slot, start, new_len,
              attn_span=None, attn_start=0):
        fn = shard_map(
            partial(_tp_prefill_chunk_impl, config=config,
                    attn_span=attn_span, attn_start=attn_start),
            mesh=mesh,
            in_specs=(pspecs, cspec, P(None, None), P(), P(), P()),
            out_specs=(P(), cspec),
            check_vma=False,
        )
        return fn(params, cache, tokens, slot, start, new_len)

    return chunk


def _tp_final_logits_impl(params, x, idx, config: llama.LlamaConfig,
                          tp_axis: str = "tp"):
    """Last-token logits from a final prefill chunk's hidden states
    (inside shard_map): local lm_head shard → [1, V/tp] → all_gather."""
    tp = jax.lax.psum(1, tp_axis)
    xl = jnp.take_along_axis(
        x, jnp.broadcast_to(idx[None, None, None], (1, 1, x.shape[-1])),
        axis=1)[:, 0]                                   # [1, H]
    xl = llama._norm(xl, params["final_norm"], config)
    head = params.get("lm_head", None)
    if head is None:
        logits = xl @ params["embed"].T.astype(xl.dtype)
    else:
        local = linear_apply(_localize(head, tp=tp), xl)       # [1, V/tp]
        logits = jax.lax.all_gather(local, tp_axis, axis=1, tiled=True)
    logits = llama.finish_logits(logits, config)
    return logits[0]


def make_tp_final_logits(mesh: Mesh, params, config: llama.LlamaConfig):
    """Build the jitted shard_map'ed lm_head for chunked-prefill final
    logits: ``fn(params, x [1,C,H], idx)`` → [V] (replicated). The head
    streams once per admission, not per chunk — same contract as
    engine.prefill_final_logits."""
    pspecs = llama_param_specs(params)
    fn = shard_map(
        partial(_tp_final_logits_impl, config=config),
        mesh=mesh,
        in_specs=(pspecs, P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def make_tp_decode_step(mesh: Mesh, params, config: llama.LlamaConfig,
                        cache: KVCache):
    """Build the jitted shard_map'ed decode step for sharded params/cache.

    Row-parallel shards require clean divisibility: hidden and intermediate
    dims (and their 4-bit block counts) must divide by the tp size.
    """
    pspecs = llama_param_specs(params)
    cspec = kv_cache_spec(cache)
    fn = shard_map(
        partial(_tp_decode_impl, config=config),
        mesh=mesh,
        in_specs=(pspecs, cspec, P("dp"), P("dp")),
        out_specs=(P("dp", None), cspec),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(1,))
