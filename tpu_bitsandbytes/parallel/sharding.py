"""Sharding rules for quantized Llama-family params and the KV cache.

Megatron-style tensor parallelism, adapted to packed 4-bit storage
(SURVEY §2.3 / §7): a column-parallel linear shards output rows — for a
:class:`QLinear4` that is dim 0 of BOTH ``packed`` [N, K2] and ``absmax``
[N, blocks] (each row's scales travel with its codes); a row-parallel linear
shards the contraction — dim 1 of both, which stays consistent because
``blocksize/2`` divides the per-device K2 shard. The KV cache shards its
kv-head axis over tp and its slot axis over dp.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.layers import QLinear4
from ..models import llama

# column-parallel: shard N (dim 0). row-parallel: shard K (dim 1).
# Fused projections (models/llama.py quantize_params(fuse_projections=True,
# tp=T)) are column-parallel too: their rows are laid out shard-interleaved
# so a dim-0 shard holds exactly (q_i;k_i;v_i) / (gate_i;up_i).
_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
        "qkv_proj", "gateup_proj")
_ROW = ("o_proj", "down_proj")


def _linear_spec(w, col: bool):
    """Spec mirroring the weight leaf structure (None fields stay None)."""
    if isinstance(w, QLinear4):
        two_d = P("tp", None) if col else P(None, "tp")
        nested_spec = None
        if w.absmax_state is not None:
            # Per-row nested layout (QLinear4.quantize): absmax_q [N, nb]
            # shards like absmax; its per-row fp32 scale shards with the
            # rows for column-parallel and is replicated for row-parallel
            # (elementwise dequant commutes with column slicing).
            if w.absmax_state.blocksize != w.absmax_q.shape[1]:
                raise NotImplementedError(
                    "TP sharding needs the per-row nested absmax layout "
                    "(QLinear4.quantize); flat blockwise nested states "
                    "(quantize_4bit compress_statistics) are not shardable")
            nested_spec = dataclasses.replace(
                w.absmax_state, absmax=(P("tp") if col else P()))
        if w.cache_scale is None:
            scale_spec = None
        elif w.cache_scale.ndim == 2:
            # int4 cache: scales are [K_pad/bs, N_pad] — the N axis shards
            # with the cache rows (column-parallel), the K-block axis with
            # the contraction (row-parallel)
            scale_spec = P(None, "tp") if col else P("tp", None)
        else:
            # int8 cache: per-row f32 [N] — column-sharded with its rows,
            # replicated for row-parallel (commutes with the K-psum)
            scale_spec = P("tp") if col else P()
        return QLinear4(
            packed=None if w.packed is None else two_d,
            absmax=None if w.absmax is None else two_d,
            shape=w.shape, blocksize=w.blocksize, quant_type=w.quant_type,
            dtype=w.dtype,
            bias=None if w.bias is None else (P("tp") if col else P()),
            absmax_q=None if w.absmax_q is None else two_d,
            absmax_state=nested_spec,
            # runtime exec cache shards like a dense [N, K] weight
            w_cache=None if w.w_cache is None else two_d,
            cache_scale=scale_spec)
    if isinstance(w, dict):                       # fp {'w','b'} leaf
        spec = {"w": P("tp", None) if col else P(None, "tp")}
        if w.get("b") is not None:
            spec["b"] = P("tp") if col else P()
        return spec
    return P("tp", None) if col else P(None, "tp")


def llama_param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching a (possibly quantized) llama param tree."""
    specs: Dict[str, Any] = {
        "embed": P(),              # replicated (vocab gather stays local)
        "final_norm": P(),
    }
    layer_specs = []
    for layer in params["layers"]:
        ls = {}
        for name, w in layer.items():
            if name == "moe":
                # each expert shards like the dense MLP (gate/up columns,
                # down rows); the tiny router/shared gate are replicated
                ms = {
                    "router": P(),
                    "experts": [
                        {k: _linear_spec(v, col=(k != "down_proj"))
                         for k, v in e.items()}
                        for e in w["experts"]],
                }
                if "shared_expert" in w:
                    ms["shared_expert"] = {
                        k: _linear_spec(v, col=(k != "down_proj"))
                        for k, v in w["shared_expert"].items()}
                    ms["shared_gate"] = P()
                ls[name] = ms
            elif name in _COL:
                ls[name] = _linear_spec(w, col=True)
            elif name in _ROW:
                ls[name] = _linear_spec(w, col=False)
            else:
                ls[name] = P()          # norms and other replicated leaves
        layer_specs.append(ls)
    specs["layers"] = layer_specs
    if "lm_head" in params:
        specs["lm_head"] = _linear_spec(params["lm_head"], col=True)
    return specs


def _spec_leaves(params, specs):
    """Pair param leaves with spec leaves (specs mirror structure; QLinear4
    spec objects carry per-field specs)."""
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_s = jax.tree_util.tree_flatten(
        specs, is_leaf=lambda x: isinstance(x, P))[0]
    return flat_p, flat_s, treedef


def shard_params(params, mesh: Mesh, specs=None):
    """device_put every leaf with its NamedSharding."""
    if specs is None:
        specs = llama_param_specs(params)
    flat_p, flat_s, treedef = _spec_leaves(params, specs)
    assert len(flat_p) == len(flat_s), (len(flat_p), len(flat_s))
    out = [jax.device_put(p, NamedSharding(mesh, s))
           for p, s in zip(flat_p, flat_s)]
    return treedef.unflatten(out)


def _walk_qlin(p, s, fn):
    """Apply ``fn(qlinear, spec)`` over matched (params, specs) trees at
    QLinear4 granularity (specs mirror structure — llama_param_specs)."""
    if isinstance(p, QLinear4):
        return fn(p, s)
    if isinstance(p, dict):
        return {k: _walk_qlin(v, s[k], fn) for k, v in p.items()}
    if isinstance(p, (list, tuple)):
        return type(p)(_walk_qlin(v, sv, fn) for v, sv in zip(p, s))
    return p


def build_sharded_int4_cache(params, mesh: Mesh, specs=None,
                             drop_packed: bool = True):
    """Per-device int4 execution cache for NF4-sharded params (VERDICT r4 #2).

    jax 0.9 cannot device_put S4 arrays under a NamedSharding (the layout
    reconcile recursion documented in ops/int4cache.py), so the mesh cache
    is never built or moved globally: each device dequantizes ITS OWN
    already-sharded NF4 piece and requantizes it to S4 locally
    (quantize_int4 with the device-pinned S4 Format), and the global arrays
    are assembled from the committed per-device pieces with
    jax.make_array_from_single_device_arrays — no cross-device S4 transfer
    ever happens. On multi-host meshes each process only touches its
    addressable shards, which is exactly what the assembly API expects.

    Per-shard grid-tile padding is uniform (every tp shard has the same
    local [N/tp, K] dims), so the assembled [tp*N_pad_local, K] (column) /
    [N_pad, tp*K_local] (row) caches shard exactly with P('tp', None) /
    P(None, 'tp'); parallel.tp._localize derives the logical local dims
    from the global ``QLinear4.shape`` and tp, and int4_matmul's ``n_out``
    slices each shard's padding rows back off inside the shard_map body.

    ``drop_packed`` strips the NF4 storage leaves afterwards (serving
    mode). dp replicas each build their own copy — a one-time load cost.
    """
    from ..functional import dequantize_4bit
    from ..ops.int4cache import quantize_int4
    import jax.numpy as jnp

    if specs is None:
        specs = llama_param_specs(params)
    tp = mesh.shape["tp"]
    on_tpu = jax.default_backend() == "tpu"

    def leaf(w: QLinear4, s: QLinear4):
        if w.packed is None or w.w_cache is not None:
            return w
        col = s.packed == P("tp", None)
        n_g, k_g = w.shape
        n_l = n_g // tp if col else n_g
        k_l = k_g if col else k_g // tp
        dev_packed = {sh.device: sh.data
                      for sh in w.packed.addressable_shards}
        dev_absmax = ({sh.device: sh.data
                       for sh in w.absmax.addressable_shards}
                      if w.absmax is not None else None)
        dev_aq = ({sh.device: sh.data
                   for sh in w.absmax_q.addressable_shards}
                  if w.absmax_q is not None else None)
        dev_stam = ({sh.device: sh.data
                     for sh in w.absmax_state.absmax.addressable_shards}
                    if w.absmax_state is not None else None)
        caches, scales = [], []
        for dev, pk in dev_packed.items():
            st = w.absmax_state
            aq = dev_aq[dev] if dev_aq is not None else None
            if st is not None:
                n_loc, nb_loc = aq.shape
                st = dataclasses.replace(st, absmax=dev_stam[dev],
                                         shape=(n_loc, nb_loc),
                                         blocksize=nb_loc)
            local = dataclasses.replace(
                w, packed=pk,
                absmax=dev_absmax[dev] if dev_absmax is not None else None,
                absmax_q=aq, absmax_state=st, shape=(n_l, k_l),
                bias=None, w_cache=None, cache_scale=None)
            qs = dataclasses.replace(local.quant_state(), dtype=jnp.float32)
            wfp = dequantize_4bit(local.packed.reshape(-1), qs)
            q4, sc = quantize_int4(wfp, device=dev if on_tpu else None)
            if not on_tpu:
                q4 = jax.device_put(q4, dev)
                sc = jax.device_put(sc, dev)
            caches.append(q4)
            scales.append(sc)
        n_p, k_p = caches[0].shape          # local padded dims (uniform)
        nb_l = scales[0].shape[0]
        if col:
            cshape, cspec = (tp * n_p, k_p), P("tp", None)
            sshape, sspec = (nb_l, tp * n_p), P(None, "tp")
        else:
            cshape, cspec = (n_p, tp * k_p), P(None, "tp")
            sshape, sspec = (tp * nb_l, n_p), P("tp", None)
        cache = jax.make_array_from_single_device_arrays(
            cshape, NamedSharding(mesh, cspec), caches)
        scale = jax.make_array_from_single_device_arrays(
            sshape, NamedSharding(mesh, sspec), scales)
        return dataclasses.replace(
            w, w_cache=cache, cache_scale=scale,
            packed=None if drop_packed else w.packed,
            absmax=None if drop_packed else w.absmax,
            absmax_q=None if drop_packed else w.absmax_q,
            absmax_state=None if drop_packed else w.absmax_state)

    return _walk_qlin(params, specs, leaf)


def kv_cache_spec(cache=None):
    """KV cache [L, B, H_kv, S, D] (head-major): heads over tp, slots over dp.

    Pass the actual cache so the spec pytree's static aux (quantized, dtype)
    matches — required for structure matching in shard_map/jit shardings.
    """
    from ..engine.kvcache import KVCache
    quantized = True if cache is None else cache.quantized
    dtype = None if cache is None else cache.dtype
    # static aux (ring flags) must match the real cache's for pytree
    # structure matching in shard_map/jit shardings
    ring = False if cache is None else cache.ring
    max_positions = None if cache is None else cache.max_positions
    scale_spec = P(None, "dp", "tp", None) if quantized else None
    return KVCache(
        k=P(None, "dp", "tp", None, None),
        v=P(None, "dp", "tp", None, None),
        k_scale=scale_spec,
        v_scale=scale_spec,
        lengths=P("dp"),
        quantized=quantized, dtype=dtype,
        ring=ring, max_positions=max_positions)


def spec_tree(params, specs=None):
    """Specs as a flat-matched pytree usable for jit in_shardings/shard_map."""
    if specs is None:
        specs = llama_param_specs(params)
    flat_p, flat_s, treedef = _spec_leaves(params, specs)
    return treedef.unflatten(flat_s)
