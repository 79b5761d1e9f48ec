"""Linear4bit — NF4/FP4 quantized linear module.

TPU-native rebuild of the reference ``Linear4bit``
(mps_bitsandbytes/nn/linear4bit.py:19-312): packed uint8 weight buffer +
``QuantState``, forward through the fused Pallas dequant-matmul
(``matmul_4bit``), ``from_linear`` conversion, ``dequantize()``, and a
state-dict protocol with re-quantize-on-load and blocksize/quant_type
mismatch warnings. The module is a pytree — it jits and shards directly.
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax.numpy as jnp

from .base import Module
from .linear import to_jnp
from ..functional import (
    QuantState,
    dequantize_4bit,
    matmul_4bit,
    quantize_4bit,
    _pad_k,
)


class Linear4bit(Module):
    """4-bit quantized linear layer (NF4/FP4, QLoRA-style).

    ~4x memory reduction vs bf16. Storage: ``weight`` is the packed flat
    uint8 from :func:`quantize_4bit`; ``weight_quant_state`` carries absmax /
    blocksize / dtype (and nested double-quant state).
    """

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 device=None, compute_dtype=jnp.bfloat16, quant_type: str = "nf4",
                 blocksize: int = 64, compress_statistics: bool = False):
        if quant_type not in ("nf4", "fp4"):
            raise ValueError(f"quant_type must be 'nf4' or 'fp4', got {quant_type}")
        self.in_features = int(in_features)
        self.out_features = int(out_features)
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.quant_type = quant_type
        self.blocksize = int(blocksize)
        self.compress_statistics = bool(compress_statistics)

        packed_size = out_features * _pad_k(in_features, blocksize) // 2
        self.weight = jnp.zeros((packed_size,), dtype=jnp.uint8)
        self.weight_quant_state: Optional[QuantState] = None
        self.bias = jnp.zeros((out_features,), dtype=compute_dtype) if bias else None

    # --- forward ---------------------------------------------------------
    def forward(self, x):
        if self.weight_quant_state is None:
            raise RuntimeError(
                "Weight not quantized. Call from_linear() or load weights first.")
        return matmul_4bit(jnp.asarray(x), self.weight, self.weight_quant_state,
                           self.bias, compute_dtype=self.compute_dtype)

    # --- conversion ------------------------------------------------------
    @classmethod
    def from_linear(cls, linear, device=None, compute_dtype=None,
                    quant_type: str = "nf4", blocksize: int = 64,
                    compress_statistics: bool = False) -> "Linear4bit":
        """Convert a Linear-like module (``.weight [N,K]``, optional ``.bias``)."""
        weight = to_jnp(linear.weight)
        bias = getattr(linear, "bias", None)
        if compute_dtype is None:
            compute_dtype = weight.dtype if weight.dtype in (
                jnp.bfloat16, jnp.float16) else jnp.bfloat16
        out_features, in_features = weight.shape
        layer = cls(in_features, out_features, bias=bias is not None,
                    compute_dtype=compute_dtype, quant_type=quant_type,
                    blocksize=blocksize, compress_statistics=compress_statistics)
        packed, state = quantize_4bit(
            weight, blocksize=blocksize, compress_statistics=compress_statistics,
            quant_type=quant_type)
        layer.weight = packed
        layer.weight_quant_state = state
        if bias is not None:
            layer.bias = to_jnp(bias).astype(compute_dtype)
        return layer

    @classmethod
    def from_arrays(cls, weight, bias=None, **kwargs) -> "Linear4bit":
        """Convert raw arrays (weight [N,K]) — convenience for pytree surgery."""
        class _Src:
            pass
        src = _Src()
        src.weight = weight
        src.bias = bias
        return cls.from_linear(src, **kwargs)

    def dequantize(self) -> jnp.ndarray:
        """Materialize the bf16/f32 weight [out_features, in_features]."""
        if self.weight_quant_state is None:
            raise RuntimeError("Weight not quantized")
        return dequantize_4bit(self.weight, self.weight_quant_state)

    @property
    def quant_state(self):
        return self.weight_quant_state

    # --- checkpointing (reference: nn/linear4bit.py:245-312) -------------
    def state_dict(self, prefix: str = "") -> dict:
        d = {prefix + "weight": self.weight}
        if self.bias is not None:
            d[prefix + "bias"] = self.bias
        if self.weight_quant_state is not None:
            d[prefix + "weight_quant_state"] = self.weight_quant_state.as_dict()
        return d

    def load_state_dict(self, state_dict: dict, prefix: str = "") -> None:
        qs_key = prefix + "weight_quant_state"
        if qs_key in state_dict:
            loaded = state_dict[qs_key]
            loaded_bs = loaded.get("blocksize", 64)
            if loaded_bs != self.blocksize:
                warnings.warn(
                    f"Linear4bit blocksize mismatch: layer has blocksize="
                    f"{self.blocksize}, checkpoint has blocksize={loaded_bs}. "
                    f"Using checkpoint blocksize.", UserWarning)
                self.blocksize = loaded_bs
            loaded_qt = loaded.get("quant_type", "nf4")
            if loaded_qt != self.quant_type:
                warnings.warn(
                    f"Linear4bit quant_type mismatch: layer has quant_type="
                    f"'{self.quant_type}', checkpoint has quant_type="
                    f"'{loaded_qt}'. Using checkpoint quant_type.", UserWarning)
                self.quant_type = loaded_qt
            self.weight_quant_state = QuantState.from_dict(loaded)

        w_key = prefix + "weight"
        if w_key in state_dict:
            w = to_jnp(state_dict[w_key])
            if w.dtype in (jnp.float16, jnp.float32, jnp.bfloat16):
                # Full-precision checkpoint: re-quantize on load.
                packed, state = quantize_4bit(
                    w, blocksize=self.blocksize,
                    compress_statistics=self.compress_statistics,
                    quant_type=self.quant_type)
                self.weight = packed
                self.weight_quant_state = state
            else:
                self.weight = w.astype(jnp.uint8).reshape(-1)

        b_key = prefix + "bias"
        if b_key in state_dict and self.bias is not None:
            self.bias = to_jnp(state_dict[b_key]).astype(self.compute_dtype)

    def extra_repr(self):
        return (f"in_features={self.in_features}, out_features={self.out_features}, "
                f"bias={self.bias is not None}, quant_type={self.quant_type}, "
                f"blocksize={self.blocksize}")


class Params4bit:
    """Wrapper over a packed array reporting the *logical* (unpacked) shape.

    Parity shim for the reference's tensor subclass
    (nn/linear4bit.py:315-338) used by HF-style integrations.
    """

    def __init__(self, data=None, requires_grad: bool = False,
                 quant_state: Optional[QuantState] = None):
        self.data = data if data is not None else jnp.zeros((0,), jnp.uint8)
        self.requires_grad = requires_grad
        self.quant_state = quant_state

    @property
    def shape(self):
        if self.quant_state is not None:
            if isinstance(self.quant_state, QuantState):
                return tuple(self.quant_state.shape)
            return tuple(self.quant_state.get("shape", self.data.shape))
        return tuple(self.data.shape)

    def __array__(self):
        import numpy as np
        return np.asarray(self.data)
