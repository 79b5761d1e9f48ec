"""OutlierAwareLinear — LLM.int8() mixed-precision linear.

TPU-native rebuild of the reference (mps_bitsandbytes/nn/outlier_aware.py:
18-219). Outlier *columns* are detected from the weights at conversion time
(col_max > threshold * mean_abs, :184-191), stored in bf16; the rest is
row-wise INT8.

TPU-first deviations from the reference forward:
* the INT8 path contracts int8×int8 on the MXU with int32 accumulation and
  applies the rank-1 scales on the output (the reference fake-quants to fp16
  and uses a fp GEMM, :112-121);
* instead of gathering the non-outlier column complement (dynamic-shaped on
  the lane axis), the outlier columns of x are zeroed in place — the int8
  weight already has those columns zeroed at conversion, so the result is
  identical while every shape stays static for XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import Module
from .linear import to_jnp
from ..functional import quantize_rowwise


class OutlierAwareLinear(Module):
    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 threshold: float = 6.0, compute_dtype=jnp.bfloat16, device=None):
        self.in_features = int(in_features)
        self.out_features = int(out_features)
        self.threshold = float(threshold)
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.weight_int8 = jnp.zeros((out_features, in_features), dtype=jnp.int8)
        self.weight_scales = jnp.ones((out_features,), dtype=jnp.float32)
        self.outlier_indices = jnp.zeros((0,), dtype=jnp.int32)
        self.outlier_weights = jnp.zeros((out_features, 0), dtype=compute_dtype)
        self.bias = jnp.zeros((out_features,), dtype=compute_dtype) if bias else None

    @property
    def num_outliers(self) -> int:
        return int(self.outlier_indices.shape[0])

    def forward(self, x):
        x = jnp.asarray(x)
        original_shape = x.shape[:-1]
        x2 = x.reshape(-1, self.in_features)

        if self.num_outliers > 0:
            out = self._forward_mixed(x2)
        else:
            out = self._forward_int8(x2)
        out = out.reshape(*original_shape, self.out_features)
        if self.bias is not None:
            out = out + self.bias
        return out

    def _int8_matmul(self, x2: jnp.ndarray) -> jnp.ndarray:
        """Row-quantize x, int8 MXU contraction, output-side rank-1 scaling."""
        x_f32 = x2.astype(jnp.float32)
        x_absmax = jnp.clip(jnp.max(jnp.abs(x_f32), axis=-1), min=1e-8)
        x_int8 = jnp.clip(jnp.round(x_f32 * (127.0 / x_absmax[:, None])),
                          -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_int8, self.weight_int8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        out = acc * (x_absmax[:, None] / 127.0) * (self.weight_scales[None, :] / 127.0)
        return out.astype(self.compute_dtype)

    def _forward_int8(self, x2):
        return self._int8_matmul(x2)

    def _forward_mixed(self, x2):
        # Zero outlier columns of x (static scatter); the int8 weight already
        # has those columns zeroed at conversion — equivalent to the
        # reference's complement-gather split with static shapes.
        x_main = x2.at[:, self.outlier_indices].set(0.0)
        out_main = self._int8_matmul(x_main)
        x_outlier = jnp.take(x2, self.outlier_indices, axis=1)
        out_outlier = (x_outlier.astype(self.compute_dtype)
                       @ self.outlier_weights.T)
        return out_main + out_outlier.astype(self.compute_dtype)

    @classmethod
    def from_linear(cls, linear, threshold: float = 6.0, device=None
                    ) -> "OutlierAwareLinear":
        weight = to_jnp(linear.weight)
        bias = getattr(linear, "bias", None)
        dtype = weight.dtype if weight.dtype in (jnp.float16, jnp.bfloat16) \
            else jnp.bfloat16
        layer = cls(weight.shape[1], weight.shape[0], bias=bias is not None,
                    threshold=threshold, compute_dtype=dtype)

        layer._quantize_from(weight)
        if bias is not None:
            layer.bias = to_jnp(bias).astype(dtype)
        return layer

    def _quantize_from(self, weight) -> None:
        """Detect outlier columns in a full-precision weight and populate
        the int8 + fp buffers (the conversion path of the reference,
        nn/outlier_aware.py:184-207). Shared by from_linear and the
        re-quantize-on-load checkpoint path."""
        dtype = self.compute_dtype
        w_np = np.asarray(weight, dtype=np.float32)
        col_max = np.abs(w_np).max(axis=0)
        mean_abs = np.abs(w_np).mean()
        outlier_idx = np.where(col_max > self.threshold * mean_abs)[0]

        if len(outlier_idx) > 0:
            self.outlier_indices = jnp.asarray(outlier_idx, dtype=jnp.int32)
            self.outlier_weights = jnp.asarray(
                w_np[:, outlier_idx]).astype(dtype)
            w_for_int8 = w_np.copy()
            w_for_int8[:, outlier_idx] = 0.0
        else:
            self.outlier_indices = jnp.zeros((0,), dtype=jnp.int32)
            self.outlier_weights = jnp.zeros((self.out_features, 0),
                                             dtype=dtype)
            w_for_int8 = w_np

        w_int8, w_scales = quantize_rowwise(jnp.asarray(w_for_int8))
        self.weight_int8 = w_int8
        self.weight_scales = w_scales

    # --- checkpointing (the Linear4bit protocol, reference
    # nn/linear4bit.py:245-312, applied to the mixed int8+outlier format) --
    def state_dict(self, prefix: str = "") -> dict:
        d = {prefix + "weight_int8": self.weight_int8,
             prefix + "weight_scales": self.weight_scales,
             prefix + "outlier_indices": self.outlier_indices,
             prefix + "outlier_weights": self.outlier_weights,
             prefix + "threshold": np.float32(self.threshold)}
        if self.bias is not None:
            d[prefix + "bias"] = self.bias
        return d

    def load_state_dict(self, state_dict: dict, prefix: str = "") -> None:
        import warnings
        t_key = prefix + "threshold"
        if t_key in state_dict:
            loaded_t = float(np.asarray(state_dict[t_key]))
            if loaded_t != self.threshold:
                warnings.warn(
                    f"OutlierAwareLinear threshold mismatch: layer has "
                    f"threshold={self.threshold}, checkpoint has "
                    f"threshold={loaded_t}. Using checkpoint threshold.",
                    UserWarning)
                self.threshold = loaded_t
        w_key = prefix + "weight"
        if w_key in state_dict:
            # Full-precision checkpoint: redo outlier detection + quantize.
            w = to_jnp(state_dict[w_key])
            if w.dtype not in (jnp.float16, jnp.float32, jnp.bfloat16):
                raise ValueError(
                    f"OutlierAwareLinear: '{w_key}' must be full-precision "
                    f"to re-quantize on load, got {w.dtype}")
            self._quantize_from(w)
        for key, dt in (("weight_int8", jnp.int8),
                        ("weight_scales", jnp.float32),
                        ("outlier_indices", jnp.int32),
                        ("outlier_weights", None)):
            k = prefix + key
            if k in state_dict:
                v = to_jnp(state_dict[k])
                setattr(self, key,
                        v.astype(dt or self.compute_dtype))
        b_key = prefix + "bias"
        if b_key in state_dict and self.bias is not None:
            self.bias = to_jnp(state_dict[b_key]).astype(self.compute_dtype)

    def extra_repr(self):
        return (f"in_features={self.in_features}, out_features={self.out_features}, "
                f"bias={self.bias is not None}, threshold={self.threshold}, "
                f"outliers={self.num_outliers}")
