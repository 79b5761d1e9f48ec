"""Single-host decode engine: jit decode step + continuous batching.

This is the subsystem the reference lacks entirely (SURVEY §3.5: demo/chat.py
drives HF's Python ``generate`` loop token by token). TPU-native design:

* one jit-compiled **decode step** advances every active slot one token
  against the slot-addressed quantized KV cache (static shapes, donated
  buffers — no host↔device chatter beyond the sampled tokens);
* **prefill** runs per admitted request at power-of-two bucketed lengths
  (bounded compile count) and writes the slot's KV span;
* a host-side **continuous-batching scheduler** admits queued requests into
  free slots as others finish — the slot pool never drains to do so.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from ..models.layers import linear_apply, rms_norm
from .kvcache import KVCache
from .sampler import SamplingArrays, SamplingParams, sample, sample_batched


# ---------------------------------------------------------------------------
# jitted model steps
# ---------------------------------------------------------------------------


def _decode_step_impl(params, cache: KVCache, tokens, active,
                      config: llama.LlamaConfig, attn_span=None,
                      attn_start=0):
    positions = cache.lengths  # write position for this step
    x, cos, sin = llama.decode_embed_and_rope(params, tokens, positions,
                                              config)
    for li, layer in enumerate(params["layers"]):
        x, cache = llama.decode_layer(
            layer, x, cos, sin, positions, cache, li, config,
            n_heads=config.num_heads, n_kv=config.num_kv_heads,
            attn_span=attn_span, attn_start=attn_start)

    x = llama._norm(x, params["final_norm"], config)
    logits = llama.head_logits(params, x[:, 0], config)
    cache = dataclasses.replace(
        cache, lengths=cache.lengths + active.astype(jnp.int32))
    cache = cache.advance_stage()
    return logits, cache


@partial(jax.jit, static_argnames=("config", "attn_span", "attn_start"),
         donate_argnums=(1,))
def decode_step(params, cache: KVCache, tokens: jnp.ndarray, active: jnp.ndarray,
                config: llama.LlamaConfig, attn_span: Optional[int] = None,
                attn_start: int = 0):
    """Advance every slot one token. tokens [B] int32, active [B] bool.

    ``attn_span`` (static): bound the KV read/attention to the first
    ``attn_span`` positions; must cover every active slot's length + 1.
    Returns (logits [B, V], new cache with lengths advanced for active slots).
    """
    return _decode_step_impl(params, cache, tokens, active, config,
                             attn_span, attn_start)


@partial(jax.jit,
         static_argnames=("config", "n_steps", "all_greedy", "attn_span",
                          "want_logprobs", "attn_start", "window_stage"),
         donate_argnums=(1,))
def decode_chunk(params, cache: KVCache, tokens: jnp.ndarray,
                 active: jnp.ndarray, key: jax.Array, samp,
                 config: llama.LlamaConfig, n_steps: int = 8,
                 all_greedy: bool = False,
                 attn_span: Optional[int] = None,
                 seen_mask: Optional[jnp.ndarray] = None,
                 want_logprobs: bool = False,
                 attn_start: int = 0,
                 window_stage: bool = True):
    """Advance every slot up to ``n_steps`` tokens in ONE jit call.

    Sampling (per-slot :class:`SamplingArrays`) and EOS handling run on
    device inside a ``lax.scan``, so the host pays dispatch overhead once per
    chunk instead of once per token — on the tunneled chip one decode-step
    dispatch costs ~2-3x the 7B device step itself (kbench/profile_decode).
    A slot that hits its EOS mid-chunk goes inactive on device; its later
    emissions carry ``active=False`` and are discarded by the scheduler.

    ``seen_mask`` [B, V] bool (optional): per-slot seen-token mask enabling
    the repetition penalty (applies to greedy rows too — it reshapes the
    argmax); the mask is updated on device as tokens are emitted and
    returned for chaining across chunks.

    Returns (tokens_seq [n_steps, B], active_seq [n_steps, B], cache,
    last_tokens [B], active [B], key, logprobs_seq [n_steps, B], seen_mask).
    ``logprobs_seq`` is the model log-softmax at each emitted token
    (pre-penalty, pre-temperature — the serving-API convention).
    """
    max_seq = cache.max_positions or cache.max_seq   # absolute room bound
    b = tokens.shape[0]

    def body(carry, _):
        cache, tokens, active, key, seen = carry
        logits, cache = _decode_step_impl(params, cache, tokens, active,
                                          config, attn_span, attn_start)
        key, sub = jax.random.split(key)
        if seen is not None:
            from .sampler import apply_repetition_penalty
            pen_logits = apply_repetition_penalty(logits, seen, samp.rep_pen)
        else:
            pen_logits = logits
        if all_greedy:
            toks = jnp.argmax(pen_logits, axis=-1).astype(jnp.int32)
        else:
            toks = sample_batched(pen_logits, sub, samp)
        toks = jnp.where(active, toks, tokens)
        if want_logprobs:   # static: no [B, V] log_softmax when unused
            lp_full = jax.nn.log_softmax(logits, axis=-1)
            lp = jnp.take_along_axis(lp_full, toks[:, None], axis=-1)[:, 0]
        else:
            lp = jnp.zeros((b,), jnp.float32)
        if seen is not None:
            rows = jnp.arange(b)
            seen = seen.at[rows, toks].set(seen[rows, toks] | active)
        emitted_by = active
        hit_eos = active & (toks == samp.eos_id)
        active = active & ~hit_eos & (cache.lengths < max_seq - 1)
        return (cache, toks, active, key, seen), (toks, emitted_by, lp)

    cache = cache.begin_stage(n_steps, span=attn_span, start=attn_start,
                              window=window_stage)
    if cache.stage is not None:
        # Staged chunks never mutate the main KV planes inside the scan
        # (writes go to the stage buffers) — keep k/v/scales OUT of the
        # scan carry by closing over them. Carried-but-unmodified 536 MB
        # planes cost one full-buffer copy each per chunk at 7B
        # (kbench/fusion_breakdown: 4 x s8[L,B,H,S,D]-class copies,
        # 0.24 ms/step).
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
    cache = cache.flush_stage(pin_layout=True)   # single-device path
    return (toks_seq, act_seq, cache, tokens, active, key, lp_seq,
            seen_mask)


def _prefill_impl(params, cache: KVCache, tokens, slot, true_len,
                  config: llama.LlamaConfig):
    logits, new_kv = llama.forward(params, tokens, config, return_kv=True)
    for li, (k, v) in enumerate(new_kv):
        cache = cache.write_prefill(li, slot, k[0], v[0], 0,
                                    valid_len=true_len)
    cache = dataclasses.replace(
        cache, lengths=cache.lengths.at[slot].set(true_len))
    last = jnp.take_along_axis(
        logits[0], (true_len - 1)[None, None], axis=0)[0]
    return last.astype(jnp.float32), cache


@partial(jax.jit, static_argnames=("config",), donate_argnums=(1,))
def prefill_step(params, cache: KVCache, tokens: jnp.ndarray, slot: jnp.ndarray,
                 true_len: jnp.ndarray, config: llama.LlamaConfig):
    """Prefill one request of (padded) shape [1, S_pad] into ``slot``.

    Positions beyond ``true_len`` write garbage KV, but decode overwrites
    position p before attending past it, so the garbage is never read.
    Returns (last-token logits [V], cache with slot length = true_len).
    """
    return _prefill_impl(params, cache, tokens, slot, true_len, config)


@partial(jax.jit, static_argnames=("config",), donate_argnums=(1,))
def prefill_batch(params, cache: KVCache, tokens: jnp.ndarray,
                  slots: jnp.ndarray, true_lens: jnp.ndarray, key: jax.Array,
                  samp, config: llama.LlamaConfig, seen_mask=None):
    """Prefill R same-bucket requests in ONE forward: tokens [R, S_pad],
    slots [R] (target cache slots), true_lens [R].

    One [R, S_pad] forward streams the quantized weights once for all R
    admissions (R separate [1, S_pad] prefills stream them R times — the
    same amortization batching gives decode). Rows are scattered into their
    slots; duplicate slots must be identical rows (the engine pads groups
    to power-of-two R with copies of row 0, making colliding scatter
    writes value-identical, hence order-independent). Positions beyond a
    row's true_len write garbage KV under the standard contract (decode
    overwrites position p before attending past it).

    ``seen_mask`` [R, V] (optional) applies per-row repetition penalties
    over the prompts when sampling the first tokens.

    Returns (first_tokens [R] sampled per-row with ``samp``, cache).
    """
    logits, new_kv = llama.forward(params, tokens, config, return_kv=True)
    pos = jnp.broadcast_to(jnp.arange(tokens.shape[1])[None, :], tokens.shape)
    for li, (k, v) in enumerate(new_kv):
        cache = cache.write_decode(li, k, v, pos, slots=slots)
    cache = dataclasses.replace(
        cache, lengths=cache.lengths.at[slots].set(true_lens))
    last = jnp.take_along_axis(
        logits, (true_lens - 1)[:, None, None], axis=1)[:, 0]   # [R, V]
    firsts = sample_batched(last.astype(jnp.float32), key, samp,
                            seen_mask=seen_mask)
    return firsts, cache


@partial(jax.jit, static_argnames=("config", "attn_span", "attn_start"),
         donate_argnums=(1,))
def prefill_chunk_step(params, cache: KVCache, tokens: jnp.ndarray,
                       slot: jnp.ndarray, start: jnp.ndarray,
                       new_len: jnp.ndarray, config: llama.LlamaConfig,
                       attn_span: Optional[int] = None,
                       attn_start: int = 0):
    """One chunk of a chunked prefill: tokens [1, C] written into ``slot``
    at positions [start, start+C); the chunk's queries attend to the slot's
    own history (slot-targeted decode_layer — O(span) attention, not
    O(B*span)).

    Splitting a long prompt into C-token chunks bounds how long a single
    admission dispatch can block decode: the scheduler interleaves one chunk
    per engine step with the running decode chunks (vLLM-style chunked
    prefill). Final-chunk padding beyond the prompt writes garbage KV under
    the standard overwrite contract.

    ``new_len``: the slot's length after this chunk (its prefill progress).
    Keeping ``lengths[slot]`` current is load-bearing, not cosmetic: decode
    chunks running for OTHER slots scatter a garbage token into every slot
    at ``lengths[slot]`` each step. With the length tracking the prefill
    frontier, that garbage lands exactly where the NEXT chunk (or the
    slot's first decode step) writes real KV before anything attends to it
    — the standard overwrite contract. Left at 0 it would corrupt position
    0 of the already-written history (tests: chunked == unchunked).

    Returns (hidden [1, C, H], cache); feed the final chunk's hidden to
    :func:`prefill_final_logits`.
    """
    c = tokens.shape[1]
    positions = start + jnp.arange(c, dtype=jnp.int32)[None, :]
    x, cos, sin = llama.decode_embed_and_rope(params, tokens, positions,
                                              config)
    for li, layer in enumerate(params["layers"]):
        x, cache = llama.decode_layer(
            layer, x, cos, sin, positions, cache, li, config,
            n_heads=config.num_heads, n_kv=config.num_kv_heads,
            attn_span=attn_span, slot=slot, attn_start=attn_start)
    cache = dataclasses.replace(
        cache, lengths=cache.lengths.at[slot].set(new_len))
    return x, cache


@partial(jax.jit, static_argnames=("config",))
def prefill_final_logits(params, x: jnp.ndarray, idx: jnp.ndarray,
                         config: llama.LlamaConfig):
    """Logits for the prompt's last token: x [1, C, H] from the final
    prefill chunk, ``idx`` its in-chunk index. The lm_head streams once per
    admission (not per chunk). Returns [V] fp32."""
    xl = jnp.take_along_axis(
        x, jnp.broadcast_to(idx[None, None, None], (1, 1, x.shape[-1])),
        axis=1)[:, 0]                                   # [1, H]
    xl = llama._norm(xl, params["final_norm"], config)
    return llama.head_logits(params, xl, config)[0]


@jax.jit
def _token_logprob(logits: jnp.ndarray, tok: jnp.ndarray) -> jnp.ndarray:
    """Model log-softmax of ``tok`` under raw logits [V] (device scalar)."""
    return jax.nn.log_softmax(logits.astype(jnp.float32))[tok]


@partial(jax.jit, static_argnames=("config",), donate_argnums=(1,))
def prefill_step_spmd(params, cache: KVCache, tokens: jnp.ndarray,
                      slot: jnp.ndarray, true_len: jnp.ndarray,
                      config: llama.LlamaConfig):
    """Prefill over GSPMD-sharded params/cache (mesh mode).

    The fused Pallas matmul is GSPMD-partitionable via
    ``jax.experimental.custom_partitioning`` (ops/matmul4bit.py
    ``_make_partitioned``), so this trace needs no special-casing: small-M
    prefills run the fused kernel per shard, large-M prefills take the
    measured-faster XLA dequant+GEMM crossover — same dispatch as
    single-device (functional.matmul_4bit)."""
    return _prefill_impl(params, cache, tokens, slot, true_len, config)


# ---------------------------------------------------------------------------
# continuous batching
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Request:
    uid: int
    prompt: List[int]
    params: SamplingParams
    generated: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None
    done: bool = False
    # first token produced by prefill: a device scalar until _host_inputs
    # (or save_state) reads it — admission never blocks on the device
    pending_first: Optional[Any] = None
    # streaming: called as on_token(uid, token, done) for every emission
    # (host-side, at chunk-collection granularity). Not serialized by
    # save_state — re-register after load_state.
    on_token: Optional[Any] = None
    cancelled: bool = False
    # chunked prefill progress: tokens of the prompt already written to the
    # slot's KV. A request with prefilling=True occupies its slot but is not
    # decodable until the final chunk samples its first token.
    prefilling: bool = False
    prefill_pos: int = 0
    # per-token model logprobs (filled when params.logprobs)
    logprobs: List[float] = dataclasses.field(default_factory=list)
    # first token's logprob from prefill (device scalar until consumed)
    pending_first_lp: Optional[Any] = None


def _bucket(n: int, max_seq: int) -> int:
    b = 16
    while b < n:
        b *= 2
    return min(b, max_seq)


def _span_bucket(need: int, max_seq: int) -> int:
    """Attention-span bucket: ``need`` rounded up to a multiple of 128,
    clamped to [128, max_seq] (bounded compile count: max_seq/128 spans)."""
    return min(max_seq, max(128, -(-need // 128) * 128))


def _chunk_span_bucket(need: int, max_seq: int) -> int:
    """Attention-span bucket for CHUNKED-PREFILL steps: 128-multiples up to
    2048, then powers of two.

    A long prompt walks ``start`` through every chunk boundary, so with the
    plain 128-bucketing each chunk position is its own compiled (span, start)
    signature — max_seq 32k / chunk 512 is ~64 compiles per admission path
    (VERDICT r2 Weak #5). Geometric buckets above 2048 cap the span set at
    16 + log2(max_seq/2048) entries; the cost is reading up to 2x the needed
    KV span per chunk (masked, bandwidth-only), which chunked prefill
    amortizes over C tokens."""
    b = _span_bucket(need, max_seq)
    if b <= 2048:
        return b
    p = 4096
    while p < b:
        p *= 2
    return min(p, max_seq)


class DecodeEngine:
    """Slot-based continuous-batching decode engine over a Llama-family model.

    ``params`` may be full-precision or NF4-quantized
    (:func:`tpu_bitsandbytes.models.llama.quantize_params`).
    """

    def __init__(self, params, config: llama.LlamaConfig, *,
                 max_batch: int = 8, max_seq: Optional[int] = None,
                 quantized_kv: bool = True, seed: int = 0, mesh=None,
                 steps_per_sync: int = 8, runtime_cache: Optional[str] = None,
                 speculative: Optional[str] = None, spec_gamma: int = 4,
                 prefill_chunk: Optional[int] = None,
                 ring_kv: bool = False,
                 drop_packed="auto"):
        """``mesh``: a (dp, tp) Mesh for multi-chip serving. Params are
        tp/dp-sharded (column/row-parallel packed weights, head-sharded KV
        cache); decode runs the shard_map TP step, prefill runs under GSPMD.
        Requires max_batch % dp == 0 and head/ffn dims divisible by tp.

        ``steps_per_sync``: decode tokens generated per host round-trip (the
        device runs that many steps in one jitted chunk; admission of queued
        requests happens between chunks). 1 restores per-token stepping.
        ``runtime_cache``: "int8"/"int4"/"bf16" builds the execution cache
        on the quantized params (see models.llama.build_runtime_cache);
        "auto" picks int8 when it fits the chip's HBM alongside KV +
        activations (drop_packed serving mode counts), otherwise int4 when
        THAT fits (0.5 B/param S4 cache at ~720 GB/s — ~2x int8-cache
        decode throughput, measured proxy-ppl +0.18% vs int8's +0.34% at
        the production 128-block, tests/test_ppl_gate.py; 13B serves at
        625 vs ~100 tok/s this way), and only past both budgets serves
        off the packed NF4 bytes — where QLinear4 dispatches
        decode-shaped matmuls to the exact-NF4-class W4A8 packed-bytes
        kernel (ops/w4a8.py). Callers needing bit-exact NF4 numerics
        should pass runtime_cache=None explicitly. Under a mesh the int4
        cache is built per shard (parallel.sharding.
        build_sharded_int4_cache).
        ``speculative``: "ngram" enables prompt-lookup speculative decoding
        (engine/speculative.py) for all-greedy batches on single-device
        meshes; output stays token-identical to plain greedy decoding.
        ``spec_gamma``: drafts proposed per verify step.
        ``prefill_chunk``: chunked prefill — prompts longer than this are
        written to the KV cache ``prefill_chunk`` tokens per engine step,
        interleaved with decode chunks, so one long admission cannot stall
        every running stream for a full-prompt forward. Works single-device
        and under a mesh (the shard_map chunk step, parallel/tp.py).
        ``ring_kv``: rolling KV buffer for fully-sliding-window models
        (every layer windowed, Mistral-class): cache memory and decode
        attention cost become O(window) instead of O(max_seq). The ring is
        sized window + in-flight positions (steps_per_sync/spec_gamma) so
        every in-window entry is unambiguous.
        ``drop_packed``: with ``runtime_cache``, free the packed NF4 codes
        after building the execution cache. "auto" (default) drops them
        only when the HBM budget requires it — packed + cache + KV + a
        serving activation estimate must fit the chip's HBM (see
        :meth:`footprint`); True/False force either way."""
        self.config = config
        self.max_batch = max_batch
        self.max_seq = max_seq or config.max_seq_len
        self.mesh = mesh
        self.steps_per_sync = max(1, int(steps_per_sync))
        if speculative not in (None, "ngram"):
            raise ValueError(f"unknown speculative mode: {speculative!r}")
        self.speculative = speculative
        self.spec_gamma = int(spec_gamma)
        if prefill_chunk is not None and prefill_chunk < 16:
            raise ValueError("prefill_chunk must be >= 16")
        self.prefill_chunk = prefill_chunk
        w = config.sliding_window
        self._fully_windowed = (
            w is not None and config.sliding_window_pattern is None
            and (config.sliding_window_layers is None
                 or all(config.sliding_window_layers)))
        if ring_kv and not self._fully_windowed:
            raise ValueError("ring_kv requires a fully-sliding-window "
                             "config (every layer windowed)")
        slack = max(self.steps_per_sync, int(spec_gamma) + 1,
                    prefill_chunk or 0) + 1
        self.ring_size = (-(-(w + slack) // 128) * 128) if ring_kv else None
        if ring_kv and self.ring_size >= self.max_seq:
            raise ValueError(
                f"ring_kv is inert: ring {self.ring_size} >= max_seq "
                f"{self.max_seq} (window + in-flight slack leaves nothing "
                f"to roll) — drop ring_kv= or raise max_seq")
        self.spec_stats = {"verify_steps": 0, "drafted": 0, "accepted": 0}
        if runtime_cache == "auto":
            # exec-format-per-HBM-budget (VERDICT r3 #2, re-gated r5): int8
            # (fastest-known accuracy floor, 1 B/param) when it fits with
            # drop_packed; else int4 (0.5 B/param, ~2x decode throughput,
            # measured proxy ppl +0.18% — BETTER than int8's +0.34%,
            # tests/test_ppl_gate.py) when that fits; only past both
            # budgets serve straight off the packed NF4 bytes — QLinear4
            # routes decode-shaped matmuls to the W4A8 kernel (ops/w4a8.py).
            def _cache_only_total(fmt):
                est = self._footprint_est(params, fmt, quantized_kv)
                est["total"] = sum(v for k, v in est.items()
                                   if k in ("exec_cache", "fp", "kv",
                                            "activations_est"))
                return est
            est8 = _cache_only_total("int8")
            if est8["total"] <= 0.92 * est8["budget"]:
                runtime_cache = "int8"
            else:
                est4 = _cache_only_total("int4")
                if est4["total"] <= 0.92 * est4["budget"]:
                    import warnings
                    warnings.warn(
                        "tpu-bitsandbytes: int8 execution cache does not "
                        f"fit HBM ({est8['total'] / 2**30:.1f} GiB > "
                        f"{0.92 * est8['budget'] / 2**30:.1f} GiB with "
                        "drop_packed) — using the int4 execution cache "
                        "(FP4-class int4-linear requantization, measured "
                        "proxy ppl +0.18%; pass runtime_cache=None for "
                        "bit-exact NF4 via the W4A8 kernel)")
                    runtime_cache = "int4"
                else:
                    import warnings
                    warnings.warn(
                        "tpu-bitsandbytes: no execution cache fits HBM "
                        f"({est4['total'] / 2**30:.1f} GiB int4 > "
                        f"{0.92 * est4['budget'] / 2**30:.1f} GiB) — "
                        "serving off packed NF4 bytes (W4A8 decode kernel)")
                    runtime_cache = None
        int4_mesh = mesh is not None and runtime_cache == "int4"
        if runtime_cache:
            dp_flag = drop_packed
            if dp_flag == "auto":
                # decide from the HYPOTHETICAL footprint, before the cache
                # is materialized (building both formats and then dropping
                # would transiently double peak HBM)
                est = self._footprint_est(params, runtime_cache,
                                          quantized_kv)
                dp_flag = not est["fits"]
                if dp_flag:
                    import warnings
                    warnings.warn(
                        "tpu-bitsandbytes: dropping packed NF4 codes — "
                        f"retaining them needs {est['total'] / 2**30:.1f} "
                        f"GiB > {0.92 * est['budget'] / 2**30:.1f} GiB HBM "
                        "budget (pass drop_packed=False to force-retain; "
                        "a dropped engine cannot re-checkpoint NF4)")
            if not int4_mesh:
                params = llama.build_runtime_cache(params, runtime_cache,
                                                   drop_packed=bool(dp_flag))
            # int4 under a mesh is built per shard AFTER sharding (jax 0.9
            # cannot device_put S4 under a NamedSharding —
            # parallel.sharding.build_sharded_int4_cache)
        cache = KVCache.create(
            config.num_layers, max_batch, self.max_seq, config.num_kv_heads,
            config.hd, quantized=quantized_kv, dtype=config.dtype,
            ring_size=self.ring_size)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel import (shard_params, kv_cache_spec,
                                    make_tp_decode_chunk,
                                    make_tp_prefill_step,
                                    make_tp_prefill_chunk,
                                    make_tp_final_logits)
            dp = mesh.shape["dp"]
            if max_batch % dp != 0:
                raise ValueError(f"max_batch {max_batch} must divide by "
                                 f"dp={dp}")
            self.params = shard_params(params, mesh)
            if int4_mesh:
                from ..parallel.sharding import build_sharded_int4_cache
                self.params = build_sharded_int4_cache(
                    self.params, mesh, drop_packed=bool(dp_flag))
            cache = jax.device_put(
                cache, jax.tree_util.tree_map(
                    lambda s: NamedSharding(mesh, s), kv_cache_spec(cache),
                    is_leaf=lambda x: isinstance(x, P)))
            self._tp_decode = make_tp_decode_chunk(
                mesh, self.params, config, cache,
                n_steps=self.steps_per_sync)
            self._tp_prefill = make_tp_prefill_step(mesh, self.params, config,
                                                    cache)
            self._tp_prefill_chunk = make_tp_prefill_chunk(
                mesh, self.params, config, cache)
            self._tp_final = make_tp_final_logits(mesh, self.params, config)
            if speculative is not None:
                from ..parallel.tp import make_tp_verify_step
                self._tp_verify = make_tp_verify_step(mesh, self.params,
                                                      config, cache)
            else:
                self._tp_verify = None
        else:
            self.params = params
            self._tp_decode = None
            self._tp_prefill = None
            self._tp_prefill_chunk = None
            self._tp_final = None
            self._tp_verify = None
        self.cache = cache
        # compact-window staged decode: built round 5, measured SLOWER in
        # situ (7.28 vs 6.50 ms/step at 7B B=8 bench despite winning
        # 30.0-vs-51.2 us/layer in the unrolled probe chain — in the real
        # scan XLA fuses the two-block path into 4 big convert+dot fusions
        # while the single-block window splits softmax into ~0.5 ms/step
        # of small fusions and pays ~0.25 ms/step of window-build copies;
        # kbench/fd_probe + fusion_breakdown --window, KERNEL_NOTES r5).
        # Kept as an opt-in (TBNB_WINDOW_STAGE=1) with the same budget
        # gate; default OFF per the measurement.
        self._window_stage = (cache.quantized and not cache.ring
                              and os.environ.get("TBNB_WINDOW_STAGE", "0")
                              == "1")
        if self._window_stage:
            est = self.footprint()
            win = est["kv"] * (self.max_seq + self.steps_per_sync
                               ) / self.max_seq
            self._window_stage = (est["total"] + win
                                  <= 0.92 * est["budget"])
        self.key = jax.random.PRNGKey(seed)
        self._samp_key = None       # SamplingArrays H2D cache (see below)
        self._samp_val = None
        self._uid = 0
        self.waiting: List[Request] = []
        self.active: Dict[int, Request] = {}   # slot -> request
        self.finished: List[Request] = []
        from ..utils.metrics import MetricsLogger
        self.metrics = MetricsLogger()
        self._replicate = None      # lazy multi-process readback gather

    # -- HBM budget accounting --------------------------------------------
    def _footprint_from(self, pf: dict, quantized_kv: bool,
                        kv_bytes_actual: Optional[int] = None) -> dict:
        """Assemble the per-chip footprint table from param-category bytes.

        Under a mesh, weights are tp-sharded (dp-replicated) and the KV
        cache is (dp, tp)-sharded; fp leaves (embed/norms) are replicated.
        """
        from ..utils.metrics import (kv_cache_bytes, serving_act_bytes,
                                     CHIP_SPECS, detect_chip)
        tp = self.mesh.shape["tp"] if self.mesh is not None else 1
        dp = self.mesh.shape["dp"] if self.mesh is not None else 1
        if kv_bytes_actual is None:
            s_axis = min(self.ring_size or self.max_seq, self.max_seq)
            kv = kv_cache_bytes(self.config.num_layers, self.max_batch,
                                s_axis, self.config.num_kv_heads,
                                self.config.hd, quantized_kv)
        else:
            kv = kv_bytes_actual
        act = serving_act_bytes(self.config, self.max_batch,
                                _bucket(self.max_seq - 1, self.max_seq),
                                self.steps_per_sync)
        out = {"packed": pf["packed"] // tp,
               "exec_cache": pf["exec_cache"] // tp,
               "fp": pf["fp"], "kv": kv // (tp * dp),
               "activations_est": act}
        out["total"] = sum(out.values())
        out["budget"] = CHIP_SPECS[detect_chip()]["hbm_gib"] * 1024 ** 3
        out["fits"] = out["total"] <= 0.92 * out["budget"]
        return out

    def _footprint_est(self, params, runtime_cache: Optional[str],
                       quantized_kv: bool) -> dict:
        """Hypothetical footprint BEFORE the runtime cache is materialized
        (drives the drop_packed="auto" decision)."""
        from ..utils.metrics import param_footprint
        return self._footprint_from(
            param_footprint(params, runtime_cache=runtime_cache),
            quantized_kv)

    def footprint(self) -> dict:
        """Per-chip HBM footprint: packed NF4, execution cache, fp params,
        KV cache (actual allocation), and a serving activation estimate —
        bytes, plus total/budget/fits. Render with
        :func:`tpu_bitsandbytes.utils.metrics.format_footprint`."""
        import numpy as np
        from ..utils.metrics import param_footprint
        pf = param_footprint(self.params)
        kv = sum(l.size * np.dtype(l.dtype).itemsize
                 for l in jax.tree_util.tree_leaves(
                     (self.cache.k, self.cache.v,
                      self.cache.k_scale, self.cache.v_scale)))
        return self._footprint_from(pf, self.cache.quantized,
                                    kv_bytes_actual=kv)

    # -- request management ---------------------------------------------
    def add_request(self, prompt_tokens, sampling: Optional[SamplingParams] = None,
                    on_token=None) -> int:
        """Queue a prompt. ``on_token(uid, token, done)`` streams emissions
        to the caller as chunks are collected (see :meth:`generate_stream`)."""
        sp = sampling or SamplingParams()
        self._uid += 1
        self.waiting.append(Request(self._uid, list(map(int, prompt_tokens)),
                                    sp, on_token=on_token))
        return self._uid

    def cancel(self, uid: int) -> bool:
        """Cancel a request by uid (serving: client disconnect).

        Waiting requests never run; active requests are retired host-side —
        the device may keep decoding that slot until the current chunk
        drains, and those emissions are discarded by the ``req is None``
        guard in ``_collect_chunk`` (the same mid-flight retirement contract
        as max_new_tokens). The slot's KV is garbage until the next prefill
        overwrites it. Returns True if the uid was found unfinished."""
        for i, req in enumerate(self.waiting):
            if req.uid == uid:
                req.done = req.cancelled = True
                self.finished.append(self.waiting.pop(i))
                return True
        for slot, req in list(self.active.items()):
            if req.uid == uid:
                req.done = req.cancelled = True
                req.pending_first = None
                del self.active[slot]
                self.finished.append(req)
                return True
        return False

    def _free_slots(self) -> List[int]:
        return [s for s in range(self.max_batch) if s not in self.active]

    # -- engine steps -----------------------------------------------------
    def _admit(self):
        free = self._free_slots()
        if not (free and self.waiting):
            return
        taken = []
        while free and self.waiting:
            slot = free.pop(0)
            req = self.waiting.pop(0)
            req.slot = slot
            if len(req.prompt) >= self.max_seq:
                # keep the most recent context that still leaves room to decode
                req.prompt = req.prompt[-(self.max_seq - 1):]
            taken.append((slot, req))
        if self._tp_prefill is not None:
            # mesh path: per-request shard_map prefill (dp-ownership-masked
            # KV writes don't batch across slots owned by different groups)
            for slot, req in taken:
                self._admit_one(slot, req)
            return
        # single-device: group same-bucket admissions into ONE forward —
        # R requests stream the quantized weights once instead of R times.
        # logprobs requests admit singly (prefill_batch returns sampled
        # tokens only, not their logprobs); prompts above the chunking
        # threshold admit singly too, so a burst of long prompts still
        # streams chunk-by-chunk instead of one giant grouped forward.
        groups: Dict[int, list] = {}
        for slot, req in taken:
            if req.params.logprobs or (
                    self.prefill_chunk is not None
                    and len(req.prompt) > self.prefill_chunk) or (
                    self.cache.ring
                    and _bucket(len(req.prompt), self.max_seq)
                    > self.cache.max_seq):
                self._admit_one(slot, req)
                continue
            groups.setdefault(_bucket(len(req.prompt), self.max_seq),
                              []).append((slot, req))
        for s_pad, grp in sorted(groups.items()):
            if len(grp) == 1:
                self._admit_one(*grp[0])
                continue
            self._admit_group(s_pad, grp)

    def _admit_one(self, slot: int, req: Request):
        s = len(req.prompt)
        if self.prefill_chunk is not None and s > self.prefill_chunk:
            # chunked admission: occupy the slot now, stream the prompt into
            # the KV cache one chunk per engine step (_advance_prefill)
            req.prefilling = True
            req.prefill_pos = 0
            self.active[slot] = req
            return
        s_pad = _bucket(s, self.max_seq)
        toks = np.zeros((1, s_pad), np.int32)
        toks[0, :s] = req.prompt
        if self._tp_prefill is not None:
            last_logits, self.cache = self._tp_prefill(
                self.params, self.cache, jnp.asarray(toks),
                jnp.int32(slot), jnp.int32(s))
        else:
            last_logits, self.cache = prefill_step(
                self.params, self.cache, jnp.asarray(toks),
                jnp.int32(slot), jnp.int32(s), self.config)
        # device scalar — the host sync is deferred to _host_inputs so
        # back-to-back admissions pipeline their prefill dispatches
        req.pending_first = self._sample_first(last_logits, req)
        self.active[slot] = req

    def _admit_group(self, s_pad: int, grp: list):
        """Prefill a same-bucket admission group in one dispatch. R is
        padded to a power of two (bounded compile count) with copies of
        row 0 — duplicate rows make the colliding scatter writes
        value-identical, so no masking is needed."""
        r = len(grp)
        r_pad = 1
        while r_pad < r:
            r_pad *= 2
        toks = np.zeros((r_pad, s_pad), np.int32)
        slots = np.zeros((r_pad,), np.int32)
        lens = np.ones((r_pad,), np.int32)
        t = np.zeros((r_pad,), np.float32)
        k = np.zeros((r_pad,), np.int32)
        p = np.ones((r_pad,), np.float32)
        e = np.full((r_pad,), -1, np.int32)
        for i, (slot, req) in enumerate(grp):
            toks[i, :len(req.prompt)] = req.prompt
            slots[i] = slot
            lens[i] = len(req.prompt)
            sp = req.params
            t[i], k[i], p[i] = sp.temperature, sp.top_k, sp.top_p
            e[i] = -1 if sp.eos_token_id is None else sp.eos_token_id
        for i in range(r, r_pad):       # pad rows duplicate row 0
            toks[i], slots[i], lens[i] = toks[0], slots[0], lens[0]
            t[i], k[i], p[i], e[i] = t[0], k[0], p[0], e[0]
        # pad rows duplicate row 0 (the scatter-collision contract)
        r_pen = np.asarray(
            [grp[i if i < r else 0][1].params.repetition_penalty
             for i in range(r_pad)], np.float32)
        samp = SamplingArrays(jnp.asarray(t), jnp.asarray(k),
                              jnp.asarray(p), jnp.asarray(e),
                              jnp.asarray(r_pen))
        mask = None
        if np.any(r_pen != 1.0):
            m = np.zeros((r_pad, self.config.vocab_size), bool)
            for i in range(r_pad):
                _, rq = grp[i] if i < r else grp[0]
                m[i, rq.prompt] = True
            mask = jnp.asarray(m)
        self.key, sub = jax.random.split(self.key)
        firsts, self.cache = prefill_batch(
            self.params, self.cache, jnp.asarray(toks), jnp.asarray(slots),
            jnp.asarray(lens), sub, samp, self.config, mask)
        for i, (slot, req) in enumerate(grp):
            req.pending_first = firsts[i]       # device scalar, lazy sync
            self.active[slot] = req

    def _mesh_seen_mask(self):
        """Mesh chunks always thread a mask (one compiled program); an
        all-False mask is a no-op penalty."""
        if self._needs_seen_mask():
            return self._seen_mask()
        return jnp.zeros((self.max_batch, self.config.vocab_size), bool)

    def _needs_seen_mask(self) -> bool:
        return any(r.params.repetition_penalty != 1.0
                   for r in self.active.values())

    def _seen_mask(self):
        """[B, V] bool: tokens in each active slot's prompt+generated
        (the repetition-penalty history). Rebuilt per dispatch from host
        bookkeeping; chained on device within pipelined chunk chains."""
        m = np.zeros((self.max_batch, self.config.vocab_size), bool)
        for slot, req in self.active.items():
            if req.prefilling:
                continue
            m[slot, req.prompt] = True
            if req.generated:
                m[slot, req.generated] = True
        return jnp.asarray(m)

    def _sample_first(self, logits, req: Request):
        """Sample a request's first token from prefill logits [V], applying
        its repetition penalty over the prompt history. Stores the token's
        model logprob lazily when the request asks for logprobs."""
        self.key, sub = jax.random.split(self.key)
        if req.params.repetition_penalty != 1.0:
            m = np.zeros((1, self.config.vocab_size), bool)
            m[0, req.prompt] = True
            tok = sample(logits[None, :], sub, req.params, jnp.asarray(m))[0]
        else:
            tok = sample(logits[None, :], sub, req.params)[0]
        if req.params.logprobs:
            req.pending_first_lp = _token_logprob(logits, tok)
        return tok

    def _advance_prefill(self) -> bool:
        """Advance chunked prefills by ONE chunk (oldest request first).

        Returns True if a chunk was dispatched. The final chunk computes the
        prompt's last-token logits (lm_head streams once per admission),
        samples the first token, and flips the request to decodable."""
        pre = [(slot, r) for slot, r in self.active.items() if r.prefilling]
        if not pre:
            return False
        slot, req = min(pre, key=lambda sr: sr[1].uid)
        c = self.prefill_chunk
        n = len(req.prompt)
        start = req.prefill_pos
        end = min(start + c, n)
        toks = np.zeros((1, c), np.int32)
        toks[0, :end - start] = req.prompt[start:end]
        if self.cache.ring:
            span, a_start = None, 0
        else:
            span = _chunk_span_bucket(start + c, self.max_seq)
            a_start = self._win_start(start)
        if self._tp_prefill_chunk is not None:
            x, self.cache = self._tp_prefill_chunk(
                self.params, self.cache, jnp.asarray(toks), jnp.int32(slot),
                jnp.int32(start), jnp.int32(min(end, n)),
                attn_span=span, attn_start=a_start)
        else:
            x, self.cache = prefill_chunk_step(
                self.params, self.cache, jnp.asarray(toks), jnp.int32(slot),
                jnp.int32(start), jnp.int32(min(end, n)), self.config,
                attn_span=span, attn_start=a_start)
        req.prefill_pos = end
        if end >= n:
            if self._tp_final is not None:
                logits = self._tp_final(self.params, x,
                                        jnp.int32(n - 1 - start))
            else:
                logits = prefill_final_logits(self.params, x,
                                              jnp.int32(n - 1 - start),
                                              self.config)
            req.pending_first = self._sample_first(logits, req)
            req.prefilling = False
        return True

    def _win_start(self, upto: int) -> int:
        """Lower KV-read bound for a query at absolute position ``upto`` in
        a fully-windowed model, bucketed at 1024 so the (start, span) static
        pair stays a small compile set (ring_kv collapses it to ONE compile
        and is the preferred mode; this is the non-ring fallback)."""
        if not self._fully_windowed:
            return 0
        return max(0, (upto - self.config.sliding_window) // 1024 * 1024)

    def _attn_window(self, extra_steps: int = 0) -> "tuple[int, int]":
        """(attn_start, attn_span) for the next decode chunk.

        For fully-windowed models (every layer sliding — Mistral-class) the
        KV read is bounded from below too: start tracks (shortest active
        position - window), so long-context decode streams O(window +
        1024-bucket) KV instead of O(context) (the mask would discard the
        prefix anyway). Mixed-window models (Gemma2/Qwen2 per-layer splits)
        keep start=0 — their global layers need the full prefix."""
        if self.cache.ring:
            # rolling buffer: the read is always the whole ring; spans are
            # meaningless (and would only multiply compiles)
            return 0, None
        span = self._attn_span(extra_steps)
        shortest = min((len(r.prompt) + len(r.generated)
                        for r in self.active.values() if not r.prefilling),
                       default=0)
        return self._win_start(shortest), span

    def _attn_span(self, extra_steps: int = 0) -> int:
        """Static attention-span bucket for the next decode chunk.

        Decode attends over the first ``span`` cache positions only, so its
        cost tracks the longest *active* sequence instead of ``max_seq``
        (VERDICT r1: decode cost was O(max_seq) regardless of occupancy).
        The bucket covers every active slot's current write position plus
        the chunk, rounded up to a multiple of 128 (bounded compile count:
        max_seq/128 variants). ``extra_steps``: steps already dispatched but
        not yet collected (pipelined loop) — host bookkeeping lags the device
        by that many positions.
        """
        longest = max((len(r.prompt) + len(r.generated)
                       for r in self.active.values() if not r.prefilling),
                      default=0)
        return _span_bucket(longest + extra_steps + self.steps_per_sync,
                            self.max_seq)

    def _host_inputs(self):
        """Build this dispatch's (tokens [B], active_mask [B]) from host
        bookkeeping, consuming any ``pending_first`` tokens produced by
        prefill (they become the decode input and the request's first
        emission)."""
        tokens = np.zeros((self.max_batch,), np.int32)
        active_mask = np.zeros((self.max_batch,), bool)
        for slot, req in list(self.active.items()):
            if req.prefilling:
                continue
            if req.pending_first is not None:
                first = int(req.pending_first)
                lp = (None if req.pending_first_lp is None
                      else float(req.pending_first_lp))
                self._collect(slot, req, first, lp)
                last = first
                req.pending_first = None
                req.pending_first_lp = None
                if req.done:
                    continue
            else:
                last = req.generated[-1]
            tokens[slot] = last
            active_mask[slot] = True
        return tokens, active_mask

    def _host_read(self, x):
        """Chunk-output readback. Under a multi-PROCESS mesh the chunk's
        dp-sharded outputs ([steps, B] tokens/actives) are not fully
        addressable from any one host — replicate them first (a jitted
        identity whose out_sharding is P(); XLA lowers it to a tiny
        all-gather over the dp axis, DCN in a real pod). Single-process
        meshes and plain arrays read back directly."""
        if x is None:
            return None
        if (isinstance(x, jax.Array) and self.mesh is not None
                and not x.is_fully_addressable):
            if self._replicate is None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                self._replicate = jax.jit(
                    lambda a: a,
                    out_shardings=NamedSharding(self.mesh, P()))
            x = self._replicate(x)
        return np.asarray(x)

    def _collect_chunk(self, toks_seq, act_seq,
                       lp_seq=None) -> "tuple[int, bool]":
        """Pull one chunk's emissions to the host and feed the bookkeeping.

        Emissions for slots whose request already finished (device keeps
        decoding a slot the host retired mid-pipeline) are discarded by the
        ``req is None`` guard. Returns (n_emitted, any_request_finished)."""
        toks_seq = self._host_read(toks_seq)
        act_seq = self._host_read(act_seq)
        if lp_seq is not None:
            lp_seq = self._host_read(lp_seq)
        finished_before = len(self.finished)
        emitted = 0
        for i in range(toks_seq.shape[0]):
            for slot in list(self.active.keys()):
                req = self.active.get(slot)
                if req is None or not act_seq[i, slot]:
                    continue
                self._collect(slot, req, int(toks_seq[i, slot]),
                              None if lp_seq is None else lp_seq[i, slot])
                emitted += 1
        return emitted, len(self.finished) > finished_before

    def _collect(self, slot: int, req: Request, token: int, lp=None):
        req.generated.append(token)
        sp = req.params
        if sp.logprobs and lp is not None:
            req.logprobs.append(float(lp))
        out_of_room = (len(req.prompt) + len(req.generated)
                       >= self.max_seq - 1)
        gen = req.generated
        hit_stop = any(
            len(gen) >= len(st) and tuple(gen[-len(st):]) == tuple(st)
            for st in sp.stop)
        if ((sp.eos_token_id is not None and token == sp.eos_token_id)
                or len(gen) >= sp.max_new_tokens or out_of_room or hit_stop):
            req.done = True
            self.finished.append(req)
            del self.active[slot]
        if req.on_token is not None:
            req.on_token(req.uid, token, req.done)

    def step(self) -> bool:
        """One engine iteration: admit, then one batched decode step.

        Returns False when no work remains.
        """
        self._admit()
        if not self.active:
            return bool(self.waiting)
        # one chunk of any in-progress chunked prefill interleaves with the
        # decode chunk below (vLLM-style chunked prefill scheduling)
        self._advance_prefill()

        # First tokens produced by prefill are consumed as this step's input.
        tokens, active_mask = self._host_inputs()

        if not active_mask.any():
            return bool(self.waiting or self.active)

        import time as _time
        t0 = _time.perf_counter()
        all_greedy = all(self.active[s].params.temperature <= 0
                         for s in self.active)

        # speculative path (single-device AND mesh — the verify step is an
        # S=gamma+1 decode; under a mesh it runs through the shard_map
        # verify, see parallel.tp.make_tp_verify_step): one verify step
        # scores gamma drafts + 1 bonus token per slot in a single forward.
        # Greedy slots accept by exact match (token-identical to plain
        # greedy); sampled slots use distribution-preserving rejection
        # acceptance. Falls back to the chunked path for penalty/logprobs
        # or without sequence headroom.
        if (self.speculative == "ngram"
                and not self._needs_seen_mask()
                and not any(r.params.logprobs
                            for r in self.active.values())
                and not any(r.prefilling for r in self.active.values())
                and max(len(r.prompt) + len(r.generated)
                        for r in self.active.values())
                + self.spec_gamma + 1 < self.max_seq - 1):
            emitted, counts = self._speculative_step(tokens, active_mask)
            n_emit = 0
            for slot in list(self.active.keys()):
                if not active_mask[slot]:
                    continue
                for j in range(int(counts[slot])):
                    req = self.active.get(slot)
                    if req is None:
                        break
                    self._collect(slot, req, int(emitted[slot, j]))
                    n_emit += 1
            self.metrics.record(n_emit, _time.perf_counter() - t0)
            return bool(self.waiting or self.active)

        if self._tp_decode is not None:
            # mesh path: chunked shard_map decode, sampling on device
            samp = self._samp_arrays()
            want_lp = any(r.params.logprobs for r in self.active.values())
            self.key, sub = jax.random.split(self.key)
            a_start, span = self._attn_window()
            toks_seq, act_seq, self.cache, _, _, lp_seq, _ = self._tp_decode(
                self.params, self.cache, jnp.asarray(tokens),
                jnp.asarray(active_mask), sub, samp, self._mesh_seen_mask(),
                all_greedy=all_greedy, attn_span=span, attn_start=a_start,
                want_logprobs=want_lp, window_stage=self._window_stage)
            emitted, _ = self._collect_chunk(toks_seq, act_seq,
                                             lp_seq if want_lp else None)
            self.metrics.record(emitted, _time.perf_counter() - t0)
            return bool(self.waiting or self.active)

        # single-device path: n steps per host sync, sampling on device
        samp = self._samp_arrays()
        seen = self._seen_mask() if self._needs_seen_mask() else None
        want_lp = any(r.params.logprobs for r in self.active.values())
        self.key, sub = jax.random.split(self.key)
        a_start, a_span = self._attn_window()
        toks_seq, act_seq, self.cache, _, _, _, lp_seq, _ = decode_chunk(
            self.params, self.cache, jnp.asarray(tokens),
            jnp.asarray(active_mask), sub, samp, self.config,
            n_steps=self.steps_per_sync, all_greedy=all_greedy,
            attn_span=a_span, seen_mask=seen,
            want_logprobs=want_lp, attn_start=a_start,
            window_stage=self._window_stage)
        emitted, _ = self._collect_chunk(toks_seq, act_seq,
                                         lp_seq if want_lp else None)
        self.metrics.record(emitted, _time.perf_counter() - t0)
        return bool(self.waiting or self.active)

    def _samp_arrays(self):
        """SamplingArrays for the current active set, cached across steps.

        Each build ships ~5 small arrays host→device; on the tunneled chip
        one tiny transfer costs ~28 ms (measured round 5), which dominated
        the per-verify-step speculative loop (~10 transfers x 28 ms >> the
        S=gamma+1 forward's device time). Keyed by VALUE of the per-slot
        SamplingParams (dataclass equality), so any admit/finish/param
        change rebuilds."""
        from .sampler import SamplingArrays
        key = [(s, r.params) for s, r in sorted(self.active.items())]
        if key != self._samp_key:
            self._samp_val = SamplingArrays.build(
                {s: r.params for s, r in self.active.items()},
                self.max_batch)
            self._samp_key = key
        return self._samp_val

    def _speculative_step(self, tokens, active_mask):
        """One prompt-lookup verify: propose drafts per slot on the host,
        score them in a single jitted forward, return (emitted, counts).
        Under a mesh the forward is the shard_map verify step
        (parallel.tp.make_tp_verify_step) — same acceptance rule, drafts
        proposed on the host exactly as single-device."""
        from .speculative import propose_ngram, verify_step
        g = self.spec_gamma
        drafts = np.zeros((self.max_batch, g), np.int32)
        for slot, req in self.active.items():
            hist = req.prompt + req.generated
            prop = propose_ngram(hist, g)
            # pad with self-repeats: cheap to reject, keeps shapes static
            # (padding counts as drafted — it is fed to the verifier and
            # can be accepted, so accepted <= drafted holds)
            self.spec_stats["drafted"] += g
            drafts[slot] = prop + [hist[-1]] * (g - len(prop))
        toks = np.concatenate([tokens[:, None], drafts], axis=1)
        longest = max(len(r.prompt) + len(r.generated)
                      for r in self.active.values())
        span = (None if self.cache.ring
                else _span_bucket(longest + g + 1, self.max_seq))
        samp = self._samp_arrays()
        self.key, sub = jax.random.split(self.key)
        if self._tp_verify is not None:
            emitted, counts, self.cache = self._tp_verify(
                self.params, self.cache, jnp.asarray(toks.astype(np.int32)),
                jnp.asarray(active_mask), sub, samp, attn_span=span)
        else:
            emitted, counts, self.cache = verify_step(
                self.params, self.cache, jnp.asarray(toks.astype(np.int32)),
                jnp.asarray(active_mask), sub, samp, self.config,
                attn_span=span)
        emitted = self._host_read(emitted)
        counts = self._host_read(counts)
        self.spec_stats["verify_steps"] += 1
        self.spec_stats["accepted"] += int(np.clip(counts - 1, 0, None).sum())
        return emitted, counts

    def warmup_plan(self, prompt_lengths: Optional[List[int]] = None,
                    group_sizes: "tuple" = (),
                    features: "tuple" = ()) -> dict:
        """The static compile signatures :meth:`warmup` will hit.

        Returns {"prefill_buckets", "group_sizes", "chunk_pairs",
        "decode_windows", "variants", "n_compiles"} — ``n_compiles`` is the
        exact number of distinct XLA programs warmup dispatches, so callers
        can bound warm-up cost before paying it. The chunked-prefill pair
        set is itself bounded: chunk spans bucket geometrically above 2048
        (:func:`_chunk_span_bucket`), so a max_seq-32k/chunk-512 engine
        compiles ~20 chunk signatures instead of ~64 (VERDICT r2 Weak #5).
        """
        buckets = sorted({_bucket(s, self.max_seq)
                          for s in (prompt_lengths
                                    or [16, self.max_seq - 1])})
        plan = {"prefill_buckets": buckets,
                "group_sizes": tuple(group_sizes)}
        if self.prefill_chunk is not None:
            c = self.prefill_chunk
            if self.cache.ring:
                pairs = {(None, 0)}
            else:
                pairs = {(_chunk_span_bucket(st + c, self.max_seq),
                          self._win_start(st))
                         for b in buckets for st in range(0, b, c)}
            plan["chunk_pairs"] = sorted(pairs,
                                         key=lambda p: (p[0] or 0, p[1]))
        else:
            plan["chunk_pairs"] = []
        if self.cache.ring:
            plan["decode_windows"] = [(0, None)]
        else:
            plan["decode_windows"] = sorted(
                {(self._win_start(b),
                  _span_bucket(b + self.steps_per_sync, self.max_seq))
                 for b in buckets} | {(0, 128)})
        variants = [dict(all_greedy=True)]
        if "sampled" in features:
            variants.append(dict(all_greedy=False))
        if "logprobs" in features:
            variants.append(dict(all_greedy=True, want_logprobs=True))
        if "penalty" in features and self._tp_decode is None:
            variants.append(dict(all_greedy=True, seen_mask="mask"))
        plan["variants"] = variants
        plan["n_compiles"] = (
            len(buckets) * (1 + len(group_sizes))
            + len(plan["chunk_pairs"])
            + (1 if self.prefill_chunk is not None else 0)  # final logits
            + len(plan["decode_windows"]) * len(variants))
        return plan

    def warmup(self, prompt_lengths: Optional[List[int]] = None,
               group_sizes: "tuple" = (),
               features: "tuple" = ()) -> None:
        """Pre-compile the decode step and prefill buckets (serving helper).

        Avoids first-request compile latency: compiles the batched decode
        step and the prefill computation for each bucket that the given
        prompt lengths (default: all power-of-two buckets up to max_seq)
        would hit.

        ``group_sizes``: padded group sizes (powers of two) to precompile
        the batched-admission ``prefill_batch`` at — a warmed engine that
        will see request bursts should list them (e.g. (2, 4)).
        ``features``: subset of {"penalty", "sampled", "logprobs"} — each
        requested feature compiles its decode-chunk variant (seen-mask
        array / all_greedy=False / want_logprobs=True are distinct static
        signatures). Chunked-prefill engines also precompile the chunk
        steps automatically. The exact compile set (and its size) is
        :meth:`warmup_plan`.

        Returns the plan with ``"seconds"`` (measured warm-up wall time)
        added, so serving setups can log/alert on compile cost.
        """
        import numpy as np
        import time as _time
        _t0 = _time.perf_counter()
        plan = self.warmup_plan(prompt_lengths, group_sizes, features)
        buckets = plan["prefill_buckets"]
        scratch = KVCache.create(
            self.config.num_layers, self.max_batch, self.max_seq,
            self.config.num_kv_heads, self.config.hd,
            quantized=self.cache.quantized, dtype=self.cache.dtype,
            ring_size=self.ring_size)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel import kv_cache_spec
            scratch = jax.device_put(
                scratch, jax.tree_util.tree_map(
                    lambda s: NamedSharding(self.mesh, s),
                    kv_cache_spec(scratch),
                    is_leaf=lambda x: isinstance(x, P)))
        for b in buckets:
            toks = jnp.zeros((1, b), jnp.int32)
            if self._tp_prefill is not None:
                _, scratch = self._tp_prefill(self.params, scratch, toks,
                                              jnp.int32(0), jnp.int32(min(b, 1)))
            else:
                _, scratch = prefill_step(self.params, scratch, toks,
                                          jnp.int32(0), jnp.int32(min(b, 1)),
                                          self.config)
            for r_pad in group_sizes:       # batched-admission variants
                gs = SamplingArrays.build({}, r_pad)
                gt = jnp.zeros((r_pad, b), jnp.int32)
                _, scratch = prefill_batch(
                    self.params, scratch, gt, jnp.zeros((r_pad,), jnp.int32),
                    jnp.ones((r_pad,), jnp.int32), jax.random.PRNGKey(0),
                    gs, self.config)
        if self.prefill_chunk is not None:
            # chunk steps at every (span, start) pair a chunked admission of
            # the given prompt lengths reaches (ring engines have one;
            # non-ring spans bucket geometrically above 2048 — see
            # warmup_plan / _chunk_span_bucket)
            c = self.prefill_chunk
            for span, a_start in plan["chunk_pairs"]:
                if self._tp_prefill_chunk is not None:
                    x, scratch = self._tp_prefill_chunk(
                        self.params, scratch, jnp.zeros((1, c), jnp.int32),
                        jnp.int32(0), jnp.int32(0), jnp.int32(1),
                        attn_span=span, attn_start=a_start)
                else:
                    x, scratch = prefill_chunk_step(
                        self.params, scratch, jnp.zeros((1, c), jnp.int32),
                        jnp.int32(0), jnp.int32(0), jnp.int32(1), self.config,
                        attn_span=span, attn_start=a_start)
            if self._tp_final is not None:
                self._tp_final(self.params, x, jnp.int32(0))
            else:
                prefill_final_logits(self.params, x, jnp.int32(0),
                                     self.config)
        # warm the decode *chunk* serving actually dispatches (greedy static
        # variant), at every attention-span bucket the given prompt lengths
        # reach — span is a static argname, so each bucket is its own compile
        samp = SamplingArrays.build({}, self.max_batch)
        zero_toks = jnp.zeros((self.max_batch,), jnp.int32)
        all_active = jnp.ones((self.max_batch,), bool)
        mask = jnp.zeros((self.max_batch, self.config.vocab_size), bool)
        # the mesh chunk always threads the mask; single-device has a
        # distinct masked signature (warmup_plan marks it "mask")
        variants = [dict(v, seen_mask=mask) if v.get("seen_mask") == "mask"
                    else dict(v) for v in plan["variants"]]
        for a_start, span in plan["decode_windows"]:
            for var in variants:
                if self._tp_decode is not None:
                    toks_seq, _, scratch, *_ = self._tp_decode(
                        self.params, scratch, zero_toks, all_active,
                        jax.random.PRNGKey(0), samp, mask,
                        attn_span=span, attn_start=a_start,
                        window_stage=self._window_stage, **var)
                else:
                    toks_seq, _, scratch, *_ = decode_chunk(
                        self.params, scratch, zero_toks, all_active,
                        jax.random.PRNGKey(0), samp, self.config,
                        n_steps=self.steps_per_sync,
                        attn_span=span, attn_start=a_start,
                        window_stage=self._window_stage, **var)
            jax.block_until_ready(toks_seq)
        plan["seconds"] = _time.perf_counter() - _t0
        return plan

    # -- failure recovery: deterministic snapshot / restart ---------------
    def save_state(self, path: str) -> None:
        """Snapshot everything needed for a deterministic restart: KV cache,
        RNG key, and full request bookkeeping (SURVEY §5 failure/restart;
        the reference has no engine, so no analogue exists there). Params
        are NOT included — re-load them from their own checkpoint; a
        restored engine continues emitting exactly the tokens the original
        would have (tests/test_engine.py::TestSnapshotRestart).
        """
        from ..utils.checkpoint import save_checkpoint

        def enc_req(r: Request) -> dict:
            return {"uid": r.uid, "prompt": list(r.prompt),
                    "sampling": dataclasses.asdict(r.params),
                    "generated": list(r.generated), "slot": r.slot,
                    "done": r.done, "cancelled": r.cancelled,
                    "prefilling": r.prefilling, "prefill_pos": r.prefill_pos,
                    "logprobs": list(r.logprobs),
                    "pending_first": None if r.pending_first is None
                    else int(r.pending_first),
                    "pending_first_lp": None if r.pending_first_lp is None
                    else float(r.pending_first_lp)}

        save_checkpoint(path, {
            "cache": {"k": self.cache.k, "v": self.cache.v,
                      "k_scale": self.cache.k_scale,
                      "v_scale": self.cache.v_scale,
                      "lengths": self.cache.lengths,
                      "quantized": self.cache.quantized,
                      "ring": self.cache.ring,
                      "max_positions": self.cache.max_positions,
                      "dtype": jnp.dtype(self.cache.dtype).name},
            "key": self.key, "uid": self._uid,
            "waiting": [enc_req(r) for r in self.waiting],
            "active": {str(s): enc_req(r) for s, r in self.active.items()},
            "finished": [enc_req(r) for r in self.finished],
        })

    def load_state(self, path: str) -> None:
        """Restore a :meth:`save_state` snapshot into this engine (same
        model/config/mesh). Decoding resumes token-identically."""
        from ..utils.checkpoint import load_checkpoint

        def dec_req(d: dict) -> Request:
            sd = dict(d["sampling"])
            # tuples round-trip as lists; SamplingParams must stay hashable
            sd["stop"] = tuple(tuple(st) for st in sd.get("stop", ()))
            return Request(uid=int(d["uid"]), prompt=list(d["prompt"]),
                           params=SamplingParams(**sd),
                           generated=list(d["generated"]), slot=d["slot"],
                           done=bool(d["done"]),
                           cancelled=bool(d.get("cancelled", False)),
                           prefilling=bool(d.get("prefilling", False)),
                           prefill_pos=int(d.get("prefill_pos", 0)),
                           logprobs=list(d.get("logprobs", [])),
                           pending_first=d["pending_first"],
                           pending_first_lp=d.get("pending_first_lp"))

        st = load_checkpoint(path)
        c = st["cache"]
        mp = c.get("max_positions")
        cache = KVCache(k=jnp.asarray(c["k"]), v=jnp.asarray(c["v"]),
                        k_scale=None if c["k_scale"] is None
                        else jnp.asarray(c["k_scale"]),
                        v_scale=None if c["v_scale"] is None
                        else jnp.asarray(c["v_scale"]),
                        lengths=jnp.asarray(c["lengths"]),
                        quantized=bool(c["quantized"]),
                        ring=bool(c.get("ring", False)),
                        max_positions=None if mp is None else int(mp),
                        dtype=jnp.dtype(c["dtype"]))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel import kv_cache_spec
            cache = jax.device_put(
                cache, jax.tree_util.tree_map(
                    lambda s: NamedSharding(self.mesh, s),
                    kv_cache_spec(cache),
                    is_leaf=lambda x: isinstance(x, P)))
        self.cache = cache
        self.key = jnp.asarray(st["key"])
        self._uid = int(st["uid"])
        self.waiting = [dec_req(d) for d in st["waiting"]]
        self.active = {int(s): dec_req(d) for s, d in st["active"].items()}
        self.finished = [dec_req(d) for d in st["finished"]]

    def run_pipelined(self, depth: int = 2) -> None:
        """Drive all queued work to completion with pipelined chunk dispatch.

        ``step()`` blocks on every decode chunk, so the ~0.3-0.5 ms tunnel
        dispatch latency (plus host bookkeeping) serializes with device
        compute once per chunk. This loop keeps up to ``depth`` chunks in
        flight: chunk k+1 is dispatched from chunk k's *device-side* carry
        (cache/tokens/active/key never come back to the host), then chunk
        k's emissions are collected — the dispatch gap rides under device
        compute exactly as bench.py measures it (~1.4 ms/step reclaimed at
        7B B=8, 12.7 -> 11.2 ms/step).

        The pipeline drains (falls back to per-chunk admission) whenever a
        request finishes while others wait for a slot — admission latency is
        bounded by ``depth`` chunks. A slot whose request the host retires
        mid-flight (max_new_tokens) keeps decoding garbage on the device
        until the drain; its emissions are discarded (``_collect_chunk``)
        and its KV positions are overwritten by the next prefill into that
        slot (the standard garbage-KV contract, tests/test_engine.py).

        Token-identical to ``step()``-looping for greedy requests; sampled
        requests consume the chunk-carried RNG stream instead of a fresh
        host split per chunk (equally valid, different draws).
        """
        if self.speculative:
            # the verify-step path blocks per step by design
            while self.step():
                pass
            return
        import time as _time
        from collections import deque
        while True:
            self._admit()
            if not self.active:
                if not self.waiting:
                    return
                continue
            self._advance_prefill()
            tokens, active_mask = self._host_inputs()
            if not active_mask.any():
                if not (self.waiting or self.active):
                    return
                continue
            samp = SamplingArrays.build(
                {s: r.params for s, r in self.active.items()}, self.max_batch)
            all_greedy = all(self.active[s].params.temperature <= 0
                             for s in self.active)
            carry = (jnp.asarray(tokens), jnp.asarray(active_mask))
            chain_key = None        # single-device path chains the key
            seen = (self._mesh_seen_mask() if self._tp_decode is not None
                    else (self._seen_mask() if self._needs_seen_mask()
                          else None))
            want_lp = any(r.params.logprobs for r in self.active.values())
            inflight: deque = deque()
            dispatched = 0          # steps in flight, uncollected
            t0 = _time.perf_counter()
            while True:
                a_start, span = self._attn_window(extra_steps=dispatched)
                if self._tp_decode is not None:
                    # mesh chunk: fresh host-split key per dispatch (the
                    # dp-folded key never leaves the shard_map)
                    self.key, sub = jax.random.split(self.key)
                    (toks_seq, act_seq, self.cache, tok_d, act_d, lp_seq,
                     seen) = self._tp_decode(
                        self.params, self.cache, *carry, sub, samp, seen,
                        all_greedy=all_greedy, attn_span=span,
                        attn_start=a_start, want_logprobs=want_lp,
                        window_stage=self._window_stage)
                    carry = [tok_d, act_d]
                    inflight.append((toks_seq, act_seq,
                                     lp_seq if want_lp else None))
                else:
                    if chain_key is None:
                        self.key, chain_key = jax.random.split(self.key)
                    (toks_seq, act_seq, self.cache, tok_d, act_d, chain_key,
                     lp_seq, seen) = decode_chunk(
                            self.params, self.cache, *carry, chain_key, samp,
                            self.config, n_steps=self.steps_per_sync,
                            all_greedy=all_greedy, attn_span=span,
                            seen_mask=seen, want_logprobs=want_lp,
                            attn_start=a_start,
                            window_stage=self._window_stage)
                    carry = [tok_d, act_d]
                    inflight.append((toks_seq, act_seq,
                                     lp_seq if want_lp else None))
                dispatched += self.steps_per_sync
                if len(inflight) < depth:
                    continue
                emitted, _ = self._collect_chunk(*inflight.popleft())
                dispatched -= self.steps_per_sync
                self.metrics.record(emitted, _time.perf_counter() - t0)
                t0 = _time.perf_counter()
                # re-admit when a slot is actually free (a request can also
                # retire at _host_inputs time, before any chunk finishes it);
                # also break to advance an in-flight chunked prefill
                if not self.active or (self.waiting and
                                       len(self.active) < self.max_batch):
                    break
                if any(r.prefilling for r in self.active.values()):
                    break
            while inflight:
                emitted, _ = self._collect_chunk(*inflight.popleft())
                self.metrics.record(emitted, _time.perf_counter() - t0)
                t0 = _time.perf_counter()
            if chain_key is not None:
                self.key = chain_key

    # -- convenience ------------------------------------------------------
    @staticmethod
    def _per_request(sampling, n: int):
        """One SamplingParams per prompt: a single instance broadcasts, a
        sequence maps per request."""
        if sampling is None or isinstance(sampling, SamplingParams):
            return [sampling] * n
        if len(sampling) != n:
            raise ValueError(f"{len(sampling)} sampling params for "
                             f"{n} prompts")
        return list(sampling)

    def generate(self, prompts: List[List[int]],
                 sampling=None,
                 pipeline_depth: int = 2) -> List[List[int]]:
        """``sampling``: one SamplingParams for every prompt, or a sequence
        with one per prompt (mixed greedy/sampled/penalized batches)."""
        uids = [self.add_request(p, sp) for p, sp in
                zip(prompts, self._per_request(sampling, len(prompts)))]
        if pipeline_depth > 1:
            self.run_pipelined(pipeline_depth)
        else:
            while self.step():
                pass
        by_uid = {r.uid: r.generated for r in self.finished}
        return [by_uid[u] for u in uids]

    def generate_stream(self, prompts: List[List[int]], sampling=None):
        """Streaming generation: yields ``(uid, token, done)`` tuples in
        emission order as decode chunks complete (token-identical to
        :meth:`generate`; latency granularity is ``steps_per_sync`` steps).
        Returns the uids via StopIteration value when exhausted."""
        events: List[tuple] = []
        uids = [self.add_request(
            p, sp,
            on_token=lambda u, t, d: events.append((u, t, d)))
            for p, sp in zip(prompts,
                             self._per_request(sampling, len(prompts)))]
        while self.step():
            while events:
                yield events.pop(0)
        while events:
            yield events.pop(0)
        return uids

    @property
    def stats(self) -> dict:
        out = {
            "active": len(self.active),
            "waiting": len(self.waiting),
            "finished": len(self.finished),
            "kv_bytes_per_token": self.cache.bytes_per_token(),
            **self.metrics.summary(),
        }
        if self.speculative:
            out["speculative"] = dict(self.spec_stats)
        return out
