"""Quantized KV cache (pytree) for the decode engine.

INT8 per-token-per-head absmax quantization of K and V — the KV-cache analog
of the library's row-wise INT8 (functional.py:607-636). The cache is a pytree
of static-shaped arrays [L, B, S_max, H_kv, D] so the whole decode step jits
with donated buffers; per-slot lengths make it a slot-addressed pool for the
continuous-batching scheduler.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    k: jnp.ndarray            # int8 [L,B,S,H,D] (or bf16 when not quantized)
    v: jnp.ndarray
    k_scale: Any              # f32 [L,B,S,H] or None
    v_scale: Any
    lengths: jnp.ndarray      # int32 [B]
    quantized: bool = True
    dtype: Any = jnp.bfloat16

    def tree_flatten(self):
        return ((self.k, self.v, self.k_scale, self.v_scale, self.lengths),
                (self.quantized, self.dtype))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        k, v, ks, vs, lengths = leaves
        obj = cls.__new__(cls)
        obj.k, obj.v, obj.k_scale, obj.v_scale = k, v, ks, vs
        obj.lengths = lengths
        obj.quantized, obj.dtype = aux
        return obj

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, num_layers: int, batch: int, max_seq: int, num_kv_heads: int,
               head_dim: int, quantized: bool = True, dtype=jnp.bfloat16
               ) -> "KVCache":
        shape = (num_layers, batch, max_seq, num_kv_heads, head_dim)
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
                   quantized=quantized, dtype=jnp.dtype(dtype))

    @property
    def max_seq(self) -> int:
        return self.k.shape[2]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    # ------------------------------------------------------------------
    def _quant(self, x):
        """x [..., H, D] -> (int8 codes, f32 per-(...,H) scales)."""
        absmax = jnp.clip(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1),
                          min=1e-8)
        q = jnp.clip(jnp.round(x.astype(jnp.float32)
                               * (127.0 / absmax[..., None])), -127, 127
                     ).astype(jnp.int8)
        return q, absmax

    def write_prefill(self, layer: int, slot, k_new, v_new, start: int = 0,
                      own=None) -> "KVCache":
        """Write [S_p, H, D] k/v for one slot at positions [start, start+S_p).

        ``slot`` may be traced. ``own`` (traced bool, optional) masks the
        write: when False the existing contents are written back unchanged —
        used by the dp-sharded TP prefill, where only the dp group owning the
        slot may mutate its shard (parallel/tp.py). Masking happens on the
        small [S_p, H, D] slice, not the full cache, so non-owners pay one
        slice read instead of a whole-buffer select. Returns the updated
        cache (functional).
        """
        def upd(buf, new, idx):
            if own is not None:
                cur = jax.lax.dynamic_slice(buf, idx, new.shape)
                new = jnp.where(own, new, cur)
            return jax.lax.dynamic_update_slice(buf, new, idx)

        if self.quantized:
            kq, ks = self._quant(k_new)
            vq, vs = self._quant(v_new)
            k = upd(self.k, kq[None, None], (layer, slot, start, 0, 0))
            v = upd(self.v, vq[None, None], (layer, slot, start, 0, 0))
            ksc = upd(self.k_scale, ks[None, None], (layer, slot, start, 0))
            vsc = upd(self.v_scale, vs[None, None], (layer, slot, start, 0))
            return dataclasses.replace(self, k=k, v=v, k_scale=ksc, v_scale=vsc)
        k = upd(self.k, k_new.astype(self.k.dtype)[None, None],
                (layer, slot, start, 0, 0))
        v = upd(self.v, v_new.astype(self.v.dtype)[None, None],
                (layer, slot, start, 0, 0))
        return dataclasses.replace(self, k=k, v=v)

    def write_decode(self, layer: int, k_new, v_new, positions) -> "KVCache":
        """Scatter per-slot tokens: k_new/v_new [B, S, H, D] written at
        ``positions`` [B, S] (or the single-token case [B, 1, H, D] with
        positions [B]). S > 1 is the speculative verify step — draft tokens
        write their KV up front; rejected positions hold stale entries that
        the causal mask keeps unattended until they are overwritten (the
        same contract as prefill's padding garbage)."""
        b = self.batch
        if positions.ndim == 1:
            positions = positions[:, None]
        batch_idx = jnp.arange(b)[:, None]
        if self.quantized:
            kq, ks = self._quant(k_new)
            vq, vs = self._quant(v_new)
            k = self.k.at[layer, batch_idx, positions].set(kq)
            v = self.v.at[layer, batch_idx, positions].set(vq)
            ksc = self.k_scale.at[layer, batch_idx, positions].set(ks)
            vsc = self.v_scale.at[layer, batch_idx, positions].set(vs)
            return dataclasses.replace(self, k=k, v=v, k_scale=ksc, v_scale=vsc)
        k = self.k.at[layer, batch_idx, positions].set(
            k_new.astype(self.k.dtype))
        v = self.v.at[layer, batch_idx, positions].set(
            v_new.astype(self.v.dtype))
        return dataclasses.replace(self, k=k, v=v)

    def read(self, layer: int, span: Optional[int] = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Dequantized K/V for a layer: [B, span, H, D] in compute dtype.

        ``span`` (static) restricts the read to the first ``span`` positions —
        the decode cost then tracks actual sequence lengths instead of
        ``S_max`` (the engine passes a bucketed ``max(lengths) + n_steps``).
        Positions ≥ span for *active* slots would be silently unattended, so
        callers must guarantee span covers every active slot's length.

        XLA fuses the int8→bf16 dequant into the attention matmuls, so the
        bf16 tensors are never materialized in HBM — the HBM read is the
        int8 codes + scales (the whole point of a quantized cache).
        """
        sl = slice(None) if span is None else slice(0, span)
        if self.quantized:
            k = (self.k[layer, :, sl].astype(jnp.float32)
                 * (self.k_scale[layer, :, sl][..., None] / 127.0)
                 ).astype(self.dtype)
            v = (self.v[layer, :, sl].astype(jnp.float32)
                 * (self.v_scale[layer, :, sl][..., None] / 127.0)
                 ).astype(self.dtype)
            return k, v
        return self.k[layer, :, sl], self.v[layer, :, sl]

    def read_raw(self, layer: int, span: Optional[int] = None):
        """Raw codes + scales for a layer: (k, k_scale, v, v_scale), each
        sliced to the first ``span`` positions. For a quantized cache this
        is the zero-copy input to the scale-folded attention
        (models.layers.gqa_attention_kv_quant) — no dequantized tensor is
        ever materialized. Scales are None when not quantized.
        """
        sl = slice(None) if span is None else slice(0, span)
        if self.quantized:
            return (self.k[layer, :, sl], self.k_scale[layer, :, sl],
                    self.v[layer, :, sl], self.v_scale[layer, :, sl])
        return self.k[layer, :, sl], None, self.v[layer, :, sl], None

    def reset_slot(self, slot: int) -> "KVCache":
        return dataclasses.replace(
            self, lengths=self.lengths.at[slot].set(0))

    def set_length(self, slot, length) -> "KVCache":
        return dataclasses.replace(
            self, lengths=self.lengths.at[slot].set(length))

    def bytes_per_token(self) -> int:
        l, _, _, h, d = self.k.shape
        per = 2 * h * d * (1 if self.quantized else 2)
        if self.quantized:
            per += 2 * h * 4
        return l * per
