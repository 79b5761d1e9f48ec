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


def _localize(w, strip_bias: bool = False):
    """Fix static shape metadata of a QLinear4 shard to its local arrays.

    ``strip_bias``: row-parallel linears must not add their bias per shard —
    the psum would multiply it by tp. The caller re-adds it once after the
    reduction.
    """
    if isinstance(w, QLinear4):
        if w.packed is not None:
            n, k = w.packed.shape[0], 2 * w.packed.shape[1]
        else:
            n, k = w.w_cache.shape
        return dataclasses.replace(w, shape=(n, k),
                                   bias=None if strip_bias else w.bias)
    return w


def _row_bias(w):
    return w.bias if isinstance(w, QLinear4) else None


def _tp_decode_impl(params, cache: KVCache, tokens, active,
                    config: llama.LlamaConfig, tp_axis: str = "tp"):
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
        return _localize(w, strip_bias=row)

    def reduce_fn(partial, w):
        full = jax.lax.psum(partial, tp_axis)
        bias = _row_bias(w)
        return full if bias is None else full + bias.astype(full.dtype)

    for li, layer in enumerate(params["layers"]):
        x, cache = llama.decode_layer(
            layer, x, cos, sin, positions, cache, li, config,
            n_heads=n_heads, n_kv=n_kv, wrap=wrap, reduce_fn=reduce_fn)

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
