"""Quantized KV cache (pytree) for the decode engine.

INT8 per-token-per-head absmax quantization of K and V — the KV-cache analog
of the library's row-wise INT8 (functional.py:607-636). The cache is a pytree
of static-shaped arrays so the whole decode step jits with donated buffers;
per-slot lengths make it a slot-addressed pool for the continuous-batching
scheduler.

Storage layout is **head-major** ``[L, B, H_kv, S, D]`` (scales
``[L, B, H_kv, S]``): the attention contractions batch over (B, H) and
contract D with T free, so the span-sliced codes feed `dot_general` in their
physical layout — with the token-major ``[L, B, S, H, D]`` layout XLA
materialized a transposed copy of every layer's K/V span each step
(~1.7 ms/step at 7B B=8 span 256, measured via kbench/profile_decode:
260 slice-done + 264 copy-done ops/step; head-major removes them). This is
SURVEY §7's "design so cache layout matches the attention kernel's tiling".
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVStage:
    """Per-chunk KV staging buffers (see KVCache.begin_stage).

    Decode-chunk steps write each new token's quantized K/V here at the
    uniform chunk-step index (one dynamic_update_slice — ~0.2 ms/step at 7B
    B=8) instead of scattering into the main cache at per-slot ragged
    positions (~3.1 ms/step, 21% of the decode step — kbench/kv_write_probe).
    The whole buffer is flushed into the main cache once per chunk.

    **Compact-window mode** (``cut > 0``, the round-5 default): the buffers
    additionally carry a contiguous copy of the main cache's attention span
    in front of the staged tail — ``[.., :cut, .]`` is the frozen
    ``[attn_start, attn_span)`` window, ``[.., cut:, .]`` the per-step
    staged tokens. Decode attention then runs as ONE unsliced single-block
    softmax over the whole window (models.layers.gqa_attention_kv_window)
    instead of the two-block staged structure over a strided span slice —
    measured 30.0 vs 51.2 us/layer-step at 7B B=8 bench shapes
    (kbench/fd_probe: the span slice cost ~10 us/layer, the two-block
    staged softmax another ~17). The window copy amortizes over the chunk
    (one contiguous span read+write per layer per chunk, <1% of step time).
    """

    k: jnp.ndarray            # int8 [L, B, H, cut + C, D]
    v: jnp.ndarray
    k_scale: jnp.ndarray      # f32 [L, B, H, cut + C]
    v_scale: jnp.ndarray
    step: jnp.ndarray         # int32 scalar: next write index in [0, C)
    len0: jnp.ndarray         # int32 [B]: per-slot lengths at chunk start
    cut: int = 0              # static: window prefix length (0 = no window)

    def tree_flatten(self):
        return ((self.k, self.v, self.k_scale, self.v_scale, self.step,
                 self.len0), (self.cut,))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = cls.__new__(cls)
        (obj.k, obj.v, obj.k_scale, obj.v_scale, obj.step, obj.len0) = leaves
        obj.cut = aux[0]
        return obj

    @property
    def size(self) -> int:
        """Staged capacity C (chunk steps), excluding the window prefix."""
        return self.k.shape[3] - self.cut


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    k: jnp.ndarray            # int8 [L,B,H,S,D] (or bf16 when not quantized)
    v: jnp.ndarray
    k_scale: Any              # f32 [L,B,H,S] or None
    v_scale: Any
    lengths: jnp.ndarray      # int32 [B]
    quantized: bool = True
    dtype: Any = jnp.bfloat16
    # Ring mode (static): the S axis is a rolling buffer of the last S
    # positions — absolute position p lives at index p % S. Built by
    # create(ring=True) for fully-sliding-window models, where positions
    # older than the window are never attended: KV memory is O(window)
    # instead of O(max_seq). ``lengths`` stay ABSOLUTE positions.
    ring: bool = False
    # absolute sequence bound in ring mode (S < max_seq); plain mode uses S
    max_positions: Optional[int] = None
    # chunk staging (decode_chunk-internal, never crosses a jit boundary)
    stage: Optional[KVStage] = None

    def tree_flatten(self):
        return ((self.k, self.v, self.k_scale, self.v_scale, self.lengths,
                 self.stage),
                (self.quantized, self.dtype, self.ring, self.max_positions))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        k, v, ks, vs, lengths, stage = leaves
        obj = cls.__new__(cls)
        obj.k, obj.v, obj.k_scale, obj.v_scale = k, v, ks, vs
        obj.lengths = lengths
        obj.stage = stage
        obj.quantized, obj.dtype, obj.ring, obj.max_positions = aux
        return obj

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, num_layers: int, batch: int, max_seq: int, num_kv_heads: int,
               head_dim: int, quantized: bool = True, dtype=jnp.bfloat16,
               ring_size: Optional[int] = None) -> "KVCache":
        """``ring_size``: allocate a rolling S axis of this size (must
        exceed the model's sliding window) while ``max_seq`` stays the
        absolute sequence bound; None = plain absolute-position cache."""
        s_axis = max_seq if ring_size is None else min(ring_size, max_seq)
        ring = ring_size is not None and s_axis < max_seq
        shape = (num_layers, batch, num_kv_heads, s_axis, head_dim)
        if quantized:
            k = jnp.zeros(shape, jnp.int8)
            v = jnp.zeros(shape, jnp.int8)
            ks = jnp.ones(shape[:-1], jnp.float32)
            vs = jnp.ones(shape[:-1], jnp.float32)
        else:
            k = jnp.zeros(shape, dtype)
            v = jnp.zeros(shape, dtype)
            ks = vs = None
        return cls(k=k, v=v, k_scale=ks, v_scale=vs,
                   lengths=jnp.zeros((batch,), jnp.int32),
                   quantized=quantized, dtype=jnp.dtype(dtype),
                   ring=ring, max_positions=max_seq if ring else None)

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def num_kv_heads(self) -> int:
        return self.k.shape[2]

    # -- chunk staging --------------------------------------------------
    def begin_stage(self, n_steps: int, span: Optional[int] = None,
                    start: int = 0, window: bool = True) -> "KVCache":
        """Allocate per-chunk staging buffers (decode_chunk calls this
        inside jit, before its scan; flush_stage after). Single-token
        decode writes then go to the stage at the uniform chunk-step index
        instead of scattering into the main cache (kbench/kv_write_probe:
        15x cheaper). No-op for ring or unquantized caches — ring indices
        wrap onto live entries so the tail-garbage contract below does not
        hold, and the unquantized path is the compatibility path.

        ``window=True`` (and ``span``/``start`` from the chunk's static
        attention window): compact-window mode — the stage buffers carry a
        contiguous copy of the main span in front of the staged tail, and
        attention reads the whole window single-block (see KVStage). The
        engine passes ``window=False`` when the window copy does not fit
        the HBM budget (the footprint gate) — attention then falls back to
        the two-block staged formulation over the strided span."""
        if self.ring or not self.quantized or n_steps > self.k.shape[3]:
            return self
        l, b, h, s, d = self.k.shape
        if window:
            hi = span if span is not None else s
            cut = hi - start
            sl = slice(start, hi)
            stage = KVStage(
                k=jnp.concatenate(
                    [self.k[:, :, :, sl],
                     jnp.zeros((l, b, h, n_steps, d), jnp.int8)], axis=3),
                v=jnp.concatenate(
                    [self.v[:, :, :, sl],
                     jnp.zeros((l, b, h, n_steps, d), jnp.int8)], axis=3),
                k_scale=jnp.concatenate(
                    [self.k_scale[:, :, :, sl],
                     jnp.ones((l, b, h, n_steps), jnp.float32)], axis=3),
                v_scale=jnp.concatenate(
                    [self.v_scale[:, :, :, sl],
                     jnp.ones((l, b, h, n_steps), jnp.float32)], axis=3),
                step=jnp.zeros((), jnp.int32),
                len0=self.lengths, cut=cut)
            return dataclasses.replace(self, stage=stage)
        stage = KVStage(
            k=jnp.zeros((l, b, h, n_steps, d), jnp.int8),
            v=jnp.zeros((l, b, h, n_steps, d), jnp.int8),
            k_scale=jnp.ones((l, b, h, n_steps), jnp.float32),
            v_scale=jnp.ones((l, b, h, n_steps), jnp.float32),
            step=jnp.zeros((), jnp.int32),
            len0=self.lengths)
        return dataclasses.replace(self, stage=stage)

    def advance_stage(self) -> "KVCache":
        """Bump the uniform write index — once per decode step (the engine
        does it where it advances ``lengths``)."""
        if self.stage is None:
            return self
        return dataclasses.replace(
            self, stage=dataclasses.replace(self.stage,
                                            step=self.stage.step + 1))

    def read_stage(self, layer: int):
        """Staged codes+scales for a layer: (k [B,H,C,D], k_scale [B,H,C],
        v, v_scale, step). The staged block joins the attention as a second
        KV source (models.layers.gqa_attention_kv_quant staged= operands).
        In compact-window mode this is the window's tail."""
        st = self.stage
        c = st.cut
        return (st.k[layer][:, :, c:], st.k_scale[layer][:, :, c:],
                st.v[layer][:, :, c:], st.v_scale[layer][:, :, c:], st.step)

    def read_window(self, layer: int):
        """Whole compact window for a layer (compact-window staged mode
        only): (k [B,H,W,D], k_scale [B,H,W], v, v_scale) with
        W = cut + C. Feed models.layers.gqa_attention_kv_window."""
        st = self.stage
        return (st.k[layer], st.k_scale[layer], st.v[layer],
                st.v_scale[layer])

    def flush_stage(self, pin_layout: bool = False) -> "KVCache":
        """Write the chunk's staged K/V back into the main cache and drop
        the stage.

        Fast path: one [L,1,H,C,D] dynamic_update_slice per slot at its
        chunk-start length (kbench/kv_write_probe: 2.2 ms/chunk vs 12 ms
        for any scatter formulation). Staged tail entries past a slot's
        final length are garbage from post-EOS steps; they land at
        positions beyond the slot's length, which the causal mask never
        attends and the next prefill overwrites — the same contract as
        prefill padding. The one case where that breaks is a slot whose
        chunk-start length is within C of max_seq (the DUS start would
        clamp and the slab would shift onto valid history); a lax.cond
        routes that rare case to a read-modify-write flush that gathers
        the current contents and overlays only the valid staged entries.
        """
        st = self.stage
        if st is None:
            return self
        c = st.size
        l, b, h, s, d = self.k.shape
        valid = self.lengths - st.len0                       # [B] per-slot
        # Read-modify-write per slot: the DUS start clamps to s - c when a
        # slot's chunk-start length is within C of max_seq, so the slab can
        # cover valid old history — gather the current contents and overlay
        # only the staged entries (entry j' lands at slab index j' + off).
        # In the common case off == 0 and the overlay writes staged entries
        # for j' < valid and keeps current contents for the dead tail.
        # (An earlier lax.cond(plain DUS | RMW) variant made XLA re-layout
        # the whole cache around the branch — always-RMW is branch-free and
        # costs one extra C-slab read per slot, kbench/kv_write_probe.)
        idx_c = jnp.arange(c)
        k, ks, v, vs = self.k, self.k_scale, self.v, self.v_scale

        def pin(x):
            """Pin the default row-major layout through the flush.

            Without this, XLA's layout assignment satisfies the per-slot
            DS/DUS chain below by giving the whole cache an internal
            B-major layout — and then inserts full-cache layout-conversion
            copies at every chunk's jit boundary (0.21 ms/step at 7B B=8,
            and a transient 2x KV footprint that OOMs B=32 at max_seq 512;
            kbench/fusion_breakdown round 3). The constraint needs a
            concrete sharding, so it applies on the single-device TPU path
            only (pin_layout — the mesh flush runs inside shard_map where
            the per-device cache shard is smaller by dp*tp anyway)."""
            if not pin_layout or jax.default_backend() != "tpu":
                return x
            from jax.experimental.layout import (
                with_layout_constraint, Layout)
            return with_layout_constraint(
                x, Layout(major_to_minor=tuple(range(x.ndim))))

        k, v, ks, vs = pin(k), pin(v), pin(ks), pin(vs)

        def overlay(buf, stg, at, take, keep_sh):
            cur = jax.lax.dynamic_slice(
                buf, at, stg.shape[:3] + (c,) + stg.shape[4:])
            new = jnp.where(keep_sh, jnp.take(stg, take, axis=3), cur)
            return jax.lax.dynamic_update_slice(buf, new, at)

        # compact-window mode: the staged entries are the window's tail
        stk, stv = st.k[:, :, :, st.cut:], st.v[:, :, :, st.cut:]
        stks, stvs = (st.k_scale[:, :, :, st.cut:],
                      st.v_scale[:, :, :, st.cut:])
        for bi in range(b):
            start = jnp.minimum(st.len0[bi], s - c)
            off = st.len0[bi] - start
            take = jnp.clip(idx_c - off, 0, c - 1)
            keep = (idx_c >= off) & (idx_c < off + valid[bi])
            at5 = (0, bi, 0, start, 0)
            k = overlay(k, stk[:, bi:bi+1], at5, take,
                        keep[None, None, None, :, None])
            v = overlay(v, stv[:, bi:bi+1], at5, take,
                        keep[None, None, None, :, None])
            ks = overlay(ks, stks[:, bi:bi+1], at5[:4], take,
                         keep[None, None, None, :])
            vs = overlay(vs, stvs[:, bi:bi+1], at5[:4], take,
                         keep[None, None, None, :])
        return dataclasses.replace(self, k=k, v=v, k_scale=ks, v_scale=vs,
                                   stage=None)

    # ------------------------------------------------------------------
    def _quant(self, x):
        """x [..., D] -> (int8 codes, f32 per-[...] scales)."""
        absmax = jnp.clip(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1),
                          min=1e-8)
        q = jnp.clip(jnp.round(x.astype(jnp.float32)
                               * (127.0 / absmax[..., None])), -127, 127
                     ).astype(jnp.int8)
        return q, absmax

    def write_prefill(self, layer: int, slot, k_new, v_new, start: int = 0,
                      own=None, valid_len=None) -> "KVCache":
        """Write [S_p, H, D] k/v for one slot at positions [start, start+S_p).

        ``slot`` may be traced. ``own`` (traced bool, optional) masks the
        write: when False the existing contents are written back unchanged —
        used by the dp-sharded TP prefill, where only the dp group owning the
        slot may mutate its shard (parallel/tp.py). Masking happens on the
        small [H, S_p, D] slice, not the full cache, so non-owners pay one
        slice read instead of a whole-buffer select.

        ``valid_len`` (traced, REQUIRED in ring mode): positions >= valid_len
        are garbage padding. In the plain cache they live harmlessly beyond
        the slot's length, but a ring buffer wraps them onto *earlier real
        entries* (pad position p and real position p - S share an index), so
        ring writes drop them instead. Returns the updated cache
        (functional).
        """
        def upd(buf, new, idx):
            if own is not None:
                cur = jax.lax.dynamic_slice(buf, idx, new.shape)
                new = jnp.where(own, new, cur)
            return jax.lax.dynamic_update_slice(buf, new, idx)

        k_hm = jnp.swapaxes(k_new, 0, 1)        # [H, S_p, D]
        v_hm = jnp.swapaxes(v_new, 0, 1)
        if self.ring:
            # rolling buffer: scatter each position at p % S. Dropped (via
            # the out-of-bounds index S): garbage padding at/after
            # valid_len (it would wrap onto real earlier entries), and
            # positions more than S behind the newest kept one.
            s_ring = self.k.shape[3]
            s_p = k_hm.shape[1]
            pos_abs = start + jnp.arange(s_p)
            last = (start + s_p - 1 if valid_len is None
                    else jnp.minimum(start + s_p - 1, valid_len - 1))
            keep = pos_abs > last - s_ring
            if valid_len is not None:
                keep &= pos_abs < valid_len
            idx = jnp.where(keep, pos_abs % s_ring, s_ring)
            if own is not None:
                idx = jnp.where(own, idx, s_ring)      # non-owners drop all
            h_idx = jnp.arange(self.num_kv_heads)[:, None]
            pos2 = idx[None, :]
            if self.quantized:
                kq, ks = self._quant(k_hm)
                vq, vs = self._quant(v_hm)
                k = self.k.at[layer, slot, h_idx, pos2].set(kq)
                v = self.v.at[layer, slot, h_idx, pos2].set(vq)
                ksc = self.k_scale.at[layer, slot, h_idx, pos2].set(ks)
                vsc = self.v_scale.at[layer, slot, h_idx, pos2].set(vs)
                return dataclasses.replace(self, k=k, v=v, k_scale=ksc,
                                           v_scale=vsc)
            k = self.k.at[layer, slot, h_idx, pos2].set(
                k_hm.astype(self.k.dtype))
            v = self.v.at[layer, slot, h_idx, pos2].set(
                v_hm.astype(self.v.dtype))
            return dataclasses.replace(self, k=k, v=v)
        if self.quantized:
            kq, ks = self._quant(k_hm)          # codes [H,S_p,D], scales [H,S_p]
            vq, vs = self._quant(v_hm)
            k = upd(self.k, kq[None, None], (layer, slot, 0, start, 0))
            v = upd(self.v, vq[None, None], (layer, slot, 0, start, 0))
            ksc = upd(self.k_scale, ks[None, None], (layer, slot, 0, start))
            vsc = upd(self.v_scale, vs[None, None], (layer, slot, 0, start))
            return dataclasses.replace(self, k=k, v=v, k_scale=ksc, v_scale=vsc)
        k = upd(self.k, k_hm.astype(self.k.dtype)[None, None],
                (layer, slot, 0, start, 0))
        v = upd(self.v, v_hm.astype(self.v.dtype)[None, None],
                (layer, slot, 0, start, 0))
        return dataclasses.replace(self, k=k, v=v)

    def write_decode(self, layer: int, k_new, v_new, positions,
                     slots=None) -> "KVCache":
        """Scatter per-slot tokens: k_new/v_new [B, S, H, D] written at
        ``positions`` [B, S] (or the single-token case [B, 1, H, D] with
        positions [B]). S > 1 is the speculative verify step — draft tokens
        write their KV up front; rejected positions hold stale entries that
        the causal mask keeps unattended until they are overwritten (the
        same contract as prefill's padding garbage).

        ``slots`` (int32 [R], optional): scatter row r into cache slot
        ``slots[r]`` instead of slot r — the batched-prefill path, where R
        admitted requests land in arbitrary slots. Duplicate slots must
        carry identical rows (the engine pads admission groups with copies
        of row 0, so colliding writes are value-identical)."""
        if (self.stage is not None and slots is None
                and k_new.shape[1] == 1):
            # chunk-staged write: every slot writes at the SAME chunk-step
            # index, so one dynamic_update_slice replaces the ragged
            # scatter (kbench/kv_write_probe: 0.2 vs 3.1 ms/step at 7B B=8)
            st = self.stage
            kq, ks = self._quant(jnp.swapaxes(k_new, 1, 2))   # [B,H,1,D]
            vq, vs = self._quant(jnp.swapaxes(v_new, 1, 2))
            at = (layer, 0, 0, st.cut + st.step, 0)
            stage = dataclasses.replace(
                st,
                k=jax.lax.dynamic_update_slice(st.k, kq[None], at),
                v=jax.lax.dynamic_update_slice(st.v, vq[None], at),
                k_scale=jax.lax.dynamic_update_slice(st.k_scale, ks[None],
                                                     at[:4]),
                v_scale=jax.lax.dynamic_update_slice(st.v_scale, vs[None],
                                                     at[:4]))
            return dataclasses.replace(self, stage=stage)
        b = k_new.shape[0] if slots is not None else self.batch
        h = self.num_kv_heads
        if positions.ndim == 1:
            positions = positions[:, None]
        if self.ring:
            # rolling buffer: absolute position p lives at index p % S
            positions = positions % self.k.shape[3]
        # head-major scatter indices broadcasting to [B, H, S]
        b_idx = (jnp.arange(b) if slots is None else slots)[:, None, None]
        h_idx = jnp.arange(h)[None, :, None]
        pos = positions[:, None, :]
        k_hm = jnp.swapaxes(k_new, 1, 2)        # [B, H, S, D]
        v_hm = jnp.swapaxes(v_new, 1, 2)
        if self.quantized:
            kq, ks = self._quant(k_hm)          # [B,H,S,D], [B,H,S]
            vq, vs = self._quant(v_hm)
            k = self.k.at[layer, b_idx, h_idx, pos].set(kq)
            v = self.v.at[layer, b_idx, h_idx, pos].set(vq)
            ksc = self.k_scale.at[layer, b_idx, h_idx, pos].set(ks)
            vsc = self.v_scale.at[layer, b_idx, h_idx, pos].set(vs)
            return dataclasses.replace(self, k=k, v=v, k_scale=ksc, v_scale=vsc)
        k = self.k.at[layer, b_idx, h_idx, pos].set(k_hm.astype(self.k.dtype))
        v = self.v.at[layer, b_idx, h_idx, pos].set(v_hm.astype(self.v.dtype))
        return dataclasses.replace(self, k=k, v=v)

    def read(self, layer: int, span: Optional[int] = None, start: int = 0
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Dequantized K/V for a layer: [B, span, H, D] in compute dtype
        (token-major, the gqa_attention operand layout).

        ``span`` (static) restricts the read to the first ``span`` positions —
        the decode cost then tracks actual sequence lengths instead of
        ``S_max`` (the engine passes a bucketed ``max(lengths) + n_steps``).
        Positions ≥ span for *active* slots would be silently unattended, so
        callers must guarantee span covers every active slot's length.

        This is the compatibility path (it transposes out of the head-major
        storage); the decode fast path is :meth:`read_raw` +
        ``gqa_attention_kv_quant``, which consumes the storage layout
        directly.
        """
        sl = slice(start, span)
        if self.quantized:
            k = (self.k[layer, :, :, sl].astype(jnp.float32)
                 * (self.k_scale[layer, :, :, sl][..., None] / 127.0)
                 ).astype(self.dtype)
            v = (self.v[layer, :, :, sl].astype(jnp.float32)
                 * (self.v_scale[layer, :, :, sl][..., None] / 127.0)
                 ).astype(self.dtype)
            return jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
        return (jnp.swapaxes(self.k[layer, :, :, sl], 1, 2),
                jnp.swapaxes(self.v[layer, :, :, sl], 1, 2))

    def read_raw(self, layer: int, span: Optional[int] = None,
                 start: int = 0):
        """Raw codes + scales for a layer: (k, k_scale, v, v_scale), codes
        [B, H, span-start, D] and scales [B, H, span-start] — the storage
        layout, which is exactly the (batch=(B,H), contract=D|T) operand
        layout of the scale-folded attention
        (models.layers.gqa_attention_kv_quant). The slice fuses into the
        attention dots with no materialized copy. ``start`` (static) bounds
        the read from below — the fully-windowed decode path reads only
        [start, span) where start tracks (shortest active position -
        window), so sliding-window attention stops paying O(context) KV
        bandwidth. Scales are None when not quantized.
        """
        sl = slice(start, span)
        if self.quantized:
            return (self.k[layer, :, :, sl], self.k_scale[layer, :, :, sl],
                    self.v[layer, :, :, sl], self.v_scale[layer, :, :, sl])
        return self.k[layer, :, :, sl], None, self.v[layer, :, :, sl], None

    def read_raw_slot(self, layer: int, slot, span: Optional[int] = None,
                      start: int = 0):
        """Raw codes + scales for ONE slot: (k, k_scale, v, v_scale), codes
        [1, H, span, D], scales [1, H, span] (None when unquantized).

        ``slot`` may be traced (lax.dynamic_slice on the slot axis). The
        chunked-prefill path: a prompt chunk's queries attend only to their
        own slot's history, so reading the one slot keeps the attention
        cost O(span) instead of O(B·span)."""
        sl = slice(start, span)

        def one(buf):
            if buf is None:
                return None
            return jax.lax.dynamic_slice_in_dim(buf[layer], slot, 1,
                                                axis=0)[:, :, sl]

        if self.quantized:
            return (one(self.k), one(self.k_scale),
                    one(self.v), one(self.v_scale))
        return one(self.k), None, one(self.v), None

    def reset_slot(self, slot: int) -> "KVCache":
        return dataclasses.replace(
            self, lengths=self.lengths.at[slot].set(0))

    def set_length(self, slot, length) -> "KVCache":
        return dataclasses.replace(
            self, lengths=self.lengths.at[slot].set(length))

    def bytes_per_token(self) -> int:
        l, _, h, _, d = self.k.shape
        per = 2 * h * d * (1 if self.quantized else 2)
        if self.quantized:
            per += 2 * h * 4
        return l * per
