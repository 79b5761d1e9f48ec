"""Linear8bit — row-wise INT8 quantized linear.

TPU-native rebuild of the reference ``Linear8bit``
(mps_bitsandbytes/nn/linear8bit.py:15-166). On TPU the matmul contracts
directly in int8 on the MXU (int32 accumulation) and applies the rank-1
scales on the output — strictly less HBM traffic than the reference's
dequantize-weights-then-GEMM. A dequantized-weight cache (``use_cache``) is
kept for API parity and for the fallback path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .base import Module
from .linear import to_jnp
from ..functional import dequantize_rowwise, quantize_rowwise


class Linear8bit(Module):
    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 device=None, use_cache: bool = False,
                 compute_dtype=jnp.bfloat16):
        self.in_features = int(in_features)
        self.out_features = int(out_features)
        self.use_cache = bool(use_cache)
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.weight_int8 = jnp.zeros((out_features, in_features), dtype=jnp.int8)
        self.weight_scales = jnp.ones((out_features,), dtype=jnp.float32)
        self.bias = jnp.zeros((out_features,), dtype=compute_dtype) if bias else None
        self._weight_cache = None

    def _get_weight(self) -> jnp.ndarray:
        if self.use_cache and self._weight_cache is not None:
            return self._weight_cache
        weight = dequantize_rowwise(self.weight_int8, self.weight_scales,
                                    dtype=self.compute_dtype)
        # Never cache a tracer: under jit the module is a captured pytree and
        # storing the traced weight would leak it into later eager calls.
        import jax.core
        if self.use_cache and not isinstance(weight, jax.core.Tracer):
            self._weight_cache = weight
        return weight

    def clear_cache(self):
        self._weight_cache = None

    def forward(self, x):
        """Weight-only INT8, fused: the int8 weight widens to compute dtype
        *inside* the dot and the per-row scale applies on the output.

        Matches the reference semantics (nn/linear8bit.py:91-102 — the
        activations are NOT quantized here; that is OutlierAwareLinear's
        job) but takes the reference's *fused* K2 form
        (csrc/mps_bitsandbytes.mm:203-305) rather than its Python
        dequant-then-GEMM: XLA fuses the int8→bf16 convert and the rank-1
        scale epilogue into the GEMM (kbench/probe2: ~750 GB/s on v5e), so
        the dequantized weight never touches HBM. ``use_cache`` keeps the
        reference's materialized-weight path available for API parity.
        """
        import jax
        x = jnp.asarray(x)
        if self.use_cache:
            weight = self._get_weight()
            out = x.astype(weight.dtype) @ weight.T
            if self.bias is not None:
                out = out + self.bias
            return out
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1]).astype(self.compute_dtype)
        out = jax.lax.dot_general(
            x2, self.weight_int8.astype(self.compute_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        out = (out * (self.weight_scales[None, :] / 127.0)
               ).astype(self.compute_dtype)
        out = out.reshape(*lead, -1)
        if self.bias is not None:
            out = out + self.bias
        return out

    @classmethod
    def from_linear(cls, linear, device=None, use_cache: bool = False,
                    compute_dtype=None) -> "Linear8bit":
        weight = to_jnp(linear.weight)
        bias = getattr(linear, "bias", None)
        if compute_dtype is None:
            compute_dtype = weight.dtype if weight.dtype in (
                jnp.bfloat16, jnp.float16) else jnp.bfloat16
        layer = cls(weight.shape[1], weight.shape[0], bias=bias is not None,
                    use_cache=use_cache, compute_dtype=compute_dtype)
        w_int8, w_scales = quantize_rowwise(weight)
        layer.weight_int8 = w_int8
        layer.weight_scales = w_scales.astype(jnp.float32)
        if bias is not None:
            layer.bias = to_jnp(bias).astype(compute_dtype)
        return layer

    def dequantize(self) -> jnp.ndarray:
        return dequantize_rowwise(self.weight_int8, self.weight_scales,
                                  dtype=self.compute_dtype)

    # --- checkpointing (the Linear4bit protocol, reference
    # nn/linear4bit.py:245-312, applied to the row-wise INT8 format) -------
    def state_dict(self, prefix: str = "") -> dict:
        d = {prefix + "weight_int8": self.weight_int8,
             prefix + "weight_scales": self.weight_scales}
        if self.bias is not None:
            d[prefix + "bias"] = self.bias
        return d

    def load_state_dict(self, state_dict: dict, prefix: str = "") -> None:
        w_key = prefix + "weight"
        if w_key in state_dict:
            # Full-precision checkpoint (e.g. an fp16 torch Linear state
            # dict): re-quantize on load.
            w = to_jnp(state_dict[w_key])
            if w.dtype not in (jnp.float16, jnp.float32, jnp.bfloat16):
                raise ValueError(
                    f"Linear8bit: '{w_key}' must be full-precision to "
                    f"re-quantize on load, got {w.dtype}")
            w_int8, w_scales = quantize_rowwise(w)
            self.weight_int8 = w_int8
            self.weight_scales = w_scales.astype(jnp.float32)
            self.clear_cache()
        if prefix + "weight_int8" in state_dict:
            self.weight_int8 = to_jnp(
                state_dict[prefix + "weight_int8"]).astype(jnp.int8)
            self.clear_cache()
        if prefix + "weight_scales" in state_dict:
            self.weight_scales = to_jnp(
                state_dict[prefix + "weight_scales"]).astype(jnp.float32)
            self.clear_cache()
        b_key = prefix + "bias"
        if b_key in state_dict and self.bias is not None:
            self.bias = to_jnp(state_dict[b_key]).astype(self.compute_dtype)

    def extra_repr(self):
        return (f"in_features={self.in_features}, out_features={self.out_features}, "
                f"bias={self.bias is not None}")
