"""LinearFP8 — FP8-E4M3 quantized linear.

TPU-native rebuild of the reference ``LinearFP8``
(mps_bitsandbytes/nn/linear_fp8.py:16-168): uint8 E4M3 buffer + per-row fp32
scales. The decode is a single hardware bitcast-convert on TPU
(float8_e4m3fn is native), fused by XLA into the matmul.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Module
from .linear import to_jnp
from ..functional import dequantize_fp8_e4m3, matmul_fp8_e4m3, quantize_fp8_e4m3


class LinearFP8(Module):
    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 device=None, compute_dtype=jnp.bfloat16):
        self.in_features = int(in_features)
        self.out_features = int(out_features)
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.weight_fp8 = jnp.zeros((out_features, in_features), dtype=jnp.uint8)
        self.weight_scales = jnp.ones((out_features,), dtype=jnp.float32)
        self.bias = jnp.zeros((out_features,), dtype=compute_dtype) if bias else None

    def forward(self, x):
        x = jnp.asarray(x)
        orig_shape = x.shape
        if x.ndim > 2:
            x = x.reshape(-1, self.in_features)
        out = matmul_fp8_e4m3(x, self.weight_fp8, self.weight_scales, self.bias,
                              self.compute_dtype)
        if len(orig_shape) > 2:
            out = out.reshape(*orig_shape[:-1], self.out_features)
        return out

    @classmethod
    def from_linear(cls, linear, device=None, compute_dtype=None) -> "LinearFP8":
        weight = to_jnp(linear.weight)
        bias = getattr(linear, "bias", None)
        if compute_dtype is None:
            compute_dtype = weight.dtype if weight.dtype in (
                jnp.bfloat16, jnp.float16) else jnp.bfloat16
        layer = cls(weight.shape[1], weight.shape[0], bias=bias is not None,
                    compute_dtype=compute_dtype)
        w_fp8, w_scales = quantize_fp8_e4m3(weight)
        layer.weight_fp8 = w_fp8
        layer.weight_scales = w_scales
        if bias is not None:
            layer.bias = to_jnp(bias).astype(compute_dtype)
        return layer

    def dequantize(self) -> jnp.ndarray:
        return dequantize_fp8_e4m3(self.weight_fp8, self.weight_scales,
                                   self.compute_dtype)

    # --- checkpointing (the Linear4bit protocol, reference
    # nn/linear4bit.py:245-312, applied to the E4M3 format) ---------------
    def state_dict(self, prefix: str = "") -> dict:
        d = {prefix + "weight_fp8": self.weight_fp8,
             prefix + "weight_scales": self.weight_scales}
        if self.bias is not None:
            d[prefix + "bias"] = self.bias
        return d

    def load_state_dict(self, state_dict: dict, prefix: str = "") -> None:
        w_key = prefix + "weight"
        if w_key in state_dict:
            # Full-precision checkpoint: re-quantize on load.
            w = to_jnp(state_dict[w_key])
            if w.dtype not in (jnp.float16, jnp.float32, jnp.bfloat16):
                raise ValueError(
                    f"LinearFP8: '{w_key}' must be full-precision to "
                    f"re-quantize on load, got {w.dtype}")
            w_fp8, w_scales = quantize_fp8_e4m3(w)
            self.weight_fp8 = w_fp8
            self.weight_scales = w_scales.astype(jnp.float32)
        if prefix + "weight_fp8" in state_dict:
            self.weight_fp8 = to_jnp(
                state_dict[prefix + "weight_fp8"]).astype(jnp.uint8)
        if prefix + "weight_scales" in state_dict:
            self.weight_scales = to_jnp(
                state_dict[prefix + "weight_scales"]).astype(jnp.float32)
        b_key = prefix + "bias"
        if b_key in state_dict and self.bias is not None:
            self.bias = to_jnp(state_dict[b_key]).astype(self.compute_dtype)

    def extra_repr(self):
        return (f"in_features={self.in_features}, out_features={self.out_features}, "
                f"bias={self.bias is not None}, quant_type=fp8_e4m3")
