"""Quantized embedding layers (4-bit NF4/FP4 and INT8).

TPU-native rebuild of the reference (mps_bitsandbytes/nn/embedding.py:20-333).
Two deliberate upgrades over the reference:

* ``from_embedding`` quantizes the whole table in one vectorized pass via the
  row-wise 2D path of :func:`quantize_4bit` — the reference loops over rows
  in Python (nn/embedding.py:184-195), a known slow spot called out in
  SURVEY §3.1;
* ``forward`` gathers packed rows and dequantizes them in one fused XLA
  computation (gather → unpack → codebook take → scale), the device-native
  equivalent of the reference's Metal gather kernels (csrc:2309-2427); the
  per-unique-row Python fallback loop (:111-139) has no reason to exist.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .base import Module
from .linear import to_jnp
from ..functional import (
    QuantState,
    _codebook_for,
    codes_to_values,
    _pad_k,
    quantize_4bit,
    quantize_rowwise,
    unpack_nibbles,
)


class Embedding4bit(Module):
    """4-bit quantized embedding: ~75% memory saving vs bf16.

    Storage: ``weight_packed`` [V, D_padded/2] uint8 (row-wise packed
    nibbles), ``weight_absmax`` [V, blocks_per_row] fp32.
    """

    def __init__(self, num_embeddings: int, embedding_dim: int,
                 padding_idx: Optional[int] = None, quant_type: str = "nf4",
                 blocksize: int = 64, device=None, dtype=jnp.bfloat16,
                 logical_dim: Optional[int] = None):
        if quant_type not in ("nf4", "fp4"):
            raise ValueError(f"quant_type must be 'nf4' or 'fp4', got {quant_type}")
        if embedding_dim % 2 != 0:
            raise ValueError(f"embedding_dim must be even, got {embedding_dim}")
        self.num_embeddings = int(num_embeddings)
        self.embedding_dim = int(embedding_dim)    # storage dim (even)
        # output width: odd source dims are stored padded but sliced back on
        # lookup so conversion never changes the layer's output shape
        self.logical_dim = int(logical_dim or embedding_dim)
        self.padding_idx = padding_idx
        self.quant_type = quant_type
        self.blocksize = int(blocksize)
        self.dtype = jnp.dtype(dtype)

        d_padded = _pad_k(embedding_dim, blocksize)
        num_blocks = d_padded // blocksize
        self.weight_packed = jnp.zeros((num_embeddings, d_padded // 2),
                                       dtype=jnp.uint8)
        self.weight_absmax = jnp.ones((num_embeddings, num_blocks),
                                      dtype=jnp.float32)

    @property
    def _d_padded(self) -> int:
        return _pad_k(self.embedding_dim, self.blocksize)

    def forward(self, input):
        ids = jnp.asarray(input)
        flat = ids.reshape(-1)
        packed = jnp.take(self.weight_packed, flat, axis=0)   # [B, Dp/2]
        absmax = jnp.take(self.weight_absmax, flat, axis=0)   # [B, nblocks]
        codes = unpack_nibbles(packed)                        # [B, Dp]
        # 16-way select, NOT a tiny-table gather (1045 us -> ~us at
        # V=256k B=64; kbench/embedding_probe round 3)
        vals = codes_to_values(codes, self.quant_type)
        nb = absmax.shape[1]
        vals = (vals.reshape(-1, nb, self.blocksize)
                * absmax[:, :, None]).reshape(-1, self._d_padded)
        out = vals[:, : self.logical_dim].astype(self.dtype)
        out = out.reshape(*ids.shape, self.logical_dim)
        if self.padding_idx is not None:
            out = jnp.where((ids == self.padding_idx)[..., None],
                            jnp.zeros((), out.dtype), out)
        return out

    @classmethod
    def from_embedding(cls, embedding, quant_type: str = "nf4",
                       blocksize: int = 64, device=None) -> "Embedding4bit":
        weight = to_jnp(embedding.weight)
        dtype = weight.dtype if weight.dtype in (jnp.float16, jnp.bfloat16) \
            else jnp.bfloat16
        logical_dim = embedding_dim = weight.shape[1]
        if embedding_dim % 2 != 0:
            weight = jnp.pad(weight, ((0, 0), (0, 1)))
            embedding_dim += 1
        layer = cls(weight.shape[0], embedding_dim,
                    padding_idx=getattr(embedding, "padding_idx", None),
                    quant_type=quant_type, blocksize=blocksize, dtype=dtype,
                    logical_dim=logical_dim)
        # One vectorized row-wise quantization pass over the whole table.
        packed, state = quantize_4bit(weight, blocksize=blocksize,
                                      quant_type=quant_type)
        d_padded = _pad_k(embedding_dim, blocksize)
        layer.weight_packed = packed.reshape(weight.shape[0], d_padded // 2)
        layer.weight_absmax = state.absmax.reshape(
            weight.shape[0], d_padded // blocksize)
        return layer

    def _requantize(self, weight) -> None:
        """Quantize a full-precision [V, D] table into this layer's buffers
        (odd D stored padded, sliced back on lookup — the from_embedding
        rule). Shared by the re-quantize-on-load checkpoint path."""
        weight = jnp.asarray(weight)
        v, d = weight.shape
        self.logical_dim = d
        if d % 2 != 0:
            weight = jnp.pad(weight, ((0, 0), (0, 1)))
            d += 1
        self.num_embeddings = v
        self.embedding_dim = d
        packed, state = quantize_4bit(weight, blocksize=self.blocksize,
                                      quant_type=self.quant_type)
        d_padded = _pad_k(d, self.blocksize)
        self.weight_packed = packed.reshape(v, d_padded // 2)
        self.weight_absmax = state.absmax.reshape(v, d_padded // self.blocksize)

    # --- checkpointing (the Linear4bit protocol, reference
    # nn/linear4bit.py:245-312, applied to the packed-row table format) ----
    def state_dict(self, prefix: str = "") -> dict:
        return {prefix + "weight_packed": self.weight_packed,
                prefix + "weight_absmax": self.weight_absmax,
                prefix + "quant_meta": {
                    "blocksize": self.blocksize,
                    "quant_type": self.quant_type,
                    "logical_dim": self.logical_dim,
                    "embedding_dim": self.embedding_dim}}

    def load_state_dict(self, state_dict: dict, prefix: str = "") -> None:
        import warnings
        meta = state_dict.get(prefix + "quant_meta")
        if meta is not None:
            loaded_bs = int(meta.get("blocksize", 64))
            if loaded_bs != self.blocksize:
                warnings.warn(
                    f"Embedding4bit blocksize mismatch: layer has blocksize="
                    f"{self.blocksize}, checkpoint has blocksize={loaded_bs}."
                    f" Using checkpoint blocksize.", UserWarning)
                self.blocksize = loaded_bs
            loaded_qt = str(meta.get("quant_type", "nf4"))
            if loaded_qt != self.quant_type:
                warnings.warn(
                    f"Embedding4bit quant_type mismatch: layer has "
                    f"quant_type='{self.quant_type}', checkpoint has "
                    f"quant_type='{loaded_qt}'. Using checkpoint quant_type.",
                    UserWarning)
                self.quant_type = loaded_qt
            self.logical_dim = int(meta.get("logical_dim", self.logical_dim))
            self.embedding_dim = int(meta.get("embedding_dim",
                                              self.embedding_dim))
        w_key = prefix + "weight"
        if w_key in state_dict:
            # Full-precision table: re-quantize on load.
            w = to_jnp(state_dict[w_key])
            if w.dtype not in (jnp.float16, jnp.float32, jnp.bfloat16):
                raise ValueError(
                    f"Embedding4bit: '{w_key}' must be full-precision to "
                    f"re-quantize on load, got {w.dtype}")
            self._requantize(w)
        if prefix + "weight_packed" in state_dict:
            self.weight_packed = to_jnp(
                state_dict[prefix + "weight_packed"]).astype(jnp.uint8)
        if prefix + "weight_absmax" in state_dict:
            self.weight_absmax = to_jnp(
                state_dict[prefix + "weight_absmax"]).astype(jnp.float32)

    def extra_repr(self):
        return (f"{self.num_embeddings}, {self.embedding_dim}, "
                f"padding_idx={self.padding_idx}, quant_type={self.quant_type}, "
                f"blocksize={self.blocksize}")


class Embedding8bit(Module):
    """8-bit row-quantized embedding: ~50% memory saving vs bf16."""

    def __init__(self, num_embeddings: int, embedding_dim: int,
                 padding_idx: Optional[int] = None, device=None,
                 dtype=jnp.bfloat16):
        self.num_embeddings = int(num_embeddings)
        self.embedding_dim = int(embedding_dim)
        self.padding_idx = padding_idx
        self.dtype = jnp.dtype(dtype)
        self.weight_int8 = jnp.zeros((num_embeddings, embedding_dim),
                                     dtype=jnp.int8)
        self.weight_scales = jnp.ones((num_embeddings,), dtype=jnp.float32)

    def forward(self, input):
        ids = jnp.asarray(input)
        rows = jnp.take(self.weight_int8, ids, axis=0)
        scales = jnp.take(self.weight_scales, ids, axis=0)
        out = (rows.astype(jnp.float32) * (scales[..., None] / 127.0)
               ).astype(self.dtype)
        if self.padding_idx is not None:
            out = jnp.where((ids == self.padding_idx)[..., None],
                            jnp.zeros((), out.dtype), out)
        return out

    @classmethod
    def from_embedding(cls, embedding, device=None) -> "Embedding8bit":
        weight = to_jnp(embedding.weight)
        dtype = weight.dtype if weight.dtype in (jnp.float16, jnp.bfloat16) \
            else jnp.bfloat16
        layer = cls(weight.shape[0], weight.shape[1],
                    padding_idx=getattr(embedding, "padding_idx", None),
                    dtype=dtype)
        w_int8, w_scales = quantize_rowwise(weight)
        layer.weight_int8 = w_int8
        layer.weight_scales = w_scales
        return layer

    # --- checkpointing (the Linear4bit protocol, reference
    # nn/linear4bit.py:245-312, applied to the row-wise INT8 table) --------
    def state_dict(self, prefix: str = "") -> dict:
        return {prefix + "weight_int8": self.weight_int8,
                prefix + "weight_scales": self.weight_scales}

    def load_state_dict(self, state_dict: dict, prefix: str = "") -> None:
        w_key = prefix + "weight"
        if w_key in state_dict:
            # Full-precision table: re-quantize on load.
            w = to_jnp(state_dict[w_key])
            if w.dtype not in (jnp.float16, jnp.float32, jnp.bfloat16):
                raise ValueError(
                    f"Embedding8bit: '{w_key}' must be full-precision to "
                    f"re-quantize on load, got {w.dtype}")
            w_int8, w_scales = quantize_rowwise(w)
            self.weight_int8 = w_int8
            self.weight_scales = w_scales.astype(jnp.float32)
            self.num_embeddings, self.embedding_dim = w.shape
        if prefix + "weight_int8" in state_dict:
            self.weight_int8 = to_jnp(
                state_dict[prefix + "weight_int8"]).astype(jnp.int8)
        if prefix + "weight_scales" in state_dict:
            self.weight_scales = to_jnp(
                state_dict[prefix + "weight_scales"]).astype(jnp.float32)

    def extra_repr(self):
        return (f"{self.num_embeddings}, {self.embedding_dim}, "
                f"padding_idx={self.padding_idx}")


class EmbeddingNF4(Embedding4bit):
    """NF4 alias (reference: nn/embedding.py:311-321)."""

    def __init__(self, num_embeddings, embedding_dim, **kwargs):
        kwargs["quant_type"] = "nf4"
        super().__init__(num_embeddings, embedding_dim, **kwargs)

    @classmethod
    def from_embedding(cls, embedding, blocksize: int = 64, device=None):
        return Embedding4bit.from_embedding.__func__(
            cls, embedding, quant_type="nf4", blocksize=blocksize, device=device)


class EmbeddingFP4(Embedding4bit):
    """FP4 alias (reference: nn/embedding.py:324-333)."""

    def __init__(self, num_embeddings, embedding_dim, **kwargs):
        kwargs["quant_type"] = "fp4"
        super().__init__(num_embeddings, embedding_dim, **kwargs)

    @classmethod
    def from_embedding(cls, embedding, blocksize: int = 64, device=None):
        return Embedding4bit.from_embedding.__func__(
            cls, embedding, quant_type="fp4", blocksize=blocksize, device=device)
