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
from ..models.layers import (
    QLinear4, apply_rope, gqa_attention, linear_apply, rms_norm, rope_table,
)
from .sharding import kv_cache_spec, llama_param_specs, spec_tree


def _localize(w):
    """Fix static shape metadata of a QLinear4 shard to its local arrays."""
    if isinstance(w, QLinear4):
        n, k2 = w.packed.shape
        return dataclasses.replace(w, shape=(n, 2 * k2))
    return w


def _tp_decode_impl(params, cache: KVCache, tokens, active,
                    config: llama.LlamaConfig, tp_axis: str = "tp"):
    """Per-device body (inside shard_map). tokens/active are dp-local."""
    b = tokens.shape[0]
    tp = jax.lax.psum(1, tp_axis)
    hd = config.hd
    n_heads = config.num_heads // tp
    n_kv = config.num_kv_heads // tp

    positions = cache.lengths
    cos_full, sin_full = rope_table(hd, config.max_seq_len, config.rope_theta)
    cos = jnp.take(cos_full, positions, axis=0)[:, None]
    sin = jnp.take(sin_full, positions, axis=0)[:, None]

    x = jnp.take(params["embed"], tokens, axis=0
                 ).astype(config.dtype)[:, None, :]
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_norm"], config.rms_eps)
        q = linear_apply(_localize(layer["q_proj"]), h).reshape(b, 1, n_heads, hd)
        k = linear_apply(_localize(layer["k_proj"]), h).reshape(b, 1, n_kv, hd)
        v = linear_apply(_localize(layer["v_proj"]), h).reshape(b, 1, n_kv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        cache = cache.write_decode(li, k, v, positions)
        k_all, v_all = cache.read(li)
        attn = gqa_attention(q, k_all, v_all, causal_offset=positions[:, None])
        # o_proj is row-parallel over the local heads: partial sums + psum.
        o_part = linear_apply(_localize(layer["o_proj"]),
                              attn.reshape(b, 1, -1))
        x = x + jax.lax.psum(o_part, tp_axis)
        h = rms_norm(x, layer["post_attn_norm"], config.rms_eps)
        gate = linear_apply(_localize(layer["gate_proj"]), h)
        up = linear_apply(_localize(layer["up_proj"]), h)
        d_part = linear_apply(_localize(layer["down_proj"]),
                              jax.nn.silu(gate) * up)
        x = x + jax.lax.psum(d_part, tp_axis)

    x = rms_norm(x, params["final_norm"], config.rms_eps)
    head = params.get("lm_head", None)
    if head is None:
        logits = x[:, 0] @ params["embed"].T.astype(x.dtype)
    else:
        local = linear_apply(_localize(head), x[:, 0])   # [B, V/tp]
        logits = jax.lax.all_gather(local, tp_axis, axis=1, tiled=True)
    cache = dataclasses.replace(
        cache, lengths=cache.lengths + active.astype(jnp.int32))
    return logits.astype(jnp.float32), cache


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
