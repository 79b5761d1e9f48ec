"""SwitchBackLinear — INT8 forward / full-precision backward training linear.

TPU-native rebuild of the reference (mps_bitsandbytes/nn/switchback.py:
20-260). The torch autograd.Function becomes a ``jax.custom_vjp``: the
forward matmul uses the dequantized INT8 weight; the backward pass computes
``dx = g @ W_fp`` against the trainable full-precision master weight —
exactly the reference's SwitchBackFunction semantics (:51-89).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .base import Module
from .linear import to_jnp
from ..functional import dequantize_rowwise, quantize_rowwise


@jax.custom_vjp
def switchback_matmul(x, w_q, w_fp, bias):
    """Forward with quantized weight, backward against the fp master weight.

    ``w_q`` must arrive pre-stop_gradient'ed (dequantized int8 weight).
    """
    out = x @ w_q.T
    if bias is not None:
        out = out + bias
    return out


def _sb_fwd(x, w_q, w_fp, bias):
    out = x @ w_q.T
    if bias is not None:
        out = out + bias
    return out, (x, w_fp, bias is not None)


def _sb_bwd(res, g):
    x, w_fp, has_bias = res
    g2 = g.reshape(-1, g.shape[-1])
    x2 = x.reshape(-1, x.shape[-1])
    dx = (g2 @ w_fp.astype(g2.dtype)).reshape(x.shape).astype(x.dtype)
    dw_q = jnp.zeros(w_fp.shape, dtype=g.dtype)  # int8 weight is frozen
    dw_fp = (g2.T @ x2.astype(g2.dtype)).astype(w_fp.dtype)
    db = jnp.sum(g2, axis=0) if has_bias else None
    return dx, dw_q, dw_fp, db


switchback_matmul.defvjp(_sb_fwd, _sb_bwd)


class SwitchBackLinear(Module):
    """INT8-forward / fp-backward linear for memory-efficient training.

    Holds both the int8 buffers (forward) and the trainable master weight
    ``weight_fp`` (backward + optimizer); ``sync_weights()`` re-quantizes the
    int8 copy after an optimizer step (reference :172-186).
    """

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 compute_dtype=jnp.bfloat16, device=None):
        self.in_features = int(in_features)
        self.out_features = int(out_features)
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.weight_int8 = jnp.zeros((out_features, in_features), dtype=jnp.int8)
        self.weight_scales = jnp.ones((out_features,), dtype=jnp.float32)
        self.weight_fp = jnp.zeros((out_features, in_features), dtype=compute_dtype)
        self.bias = jnp.zeros((out_features,), dtype=compute_dtype) if bias else None

    def forward(self, x):
        x = jnp.asarray(x).astype(self.compute_dtype)
        w_q = jax.lax.stop_gradient(
            dequantize_rowwise(self.weight_int8, self.weight_scales,
                               dtype=self.compute_dtype))
        orig_shape = x.shape
        x2 = x.reshape(-1, self.in_features)
        out = switchback_matmul(x2, w_q, self.weight_fp, self.bias)
        return out.reshape(*orig_shape[:-1], self.out_features)

    def sync_weights(self) -> None:
        """Re-quantize the INT8 forward weights from the fp master."""
        w_int8, w_scales = quantize_rowwise(self.weight_fp)
        self.weight_int8 = w_int8
        self.weight_scales = w_scales

    # torch-API alias
    _update_int8_weights = sync_weights

    @classmethod
    def from_linear(cls, linear, device=None) -> "SwitchBackLinear":
        weight = to_jnp(linear.weight)
        bias = getattr(linear, "bias", None)
        dtype = weight.dtype if weight.dtype in (jnp.float16, jnp.bfloat16) \
            else jnp.bfloat16
        layer = cls(weight.shape[1], weight.shape[0], bias=bias is not None,
                    compute_dtype=dtype)
        layer.weight_fp = weight.astype(dtype)
        # int8 derives from the MASTER (post-cast) weight, exactly as
        # sync_weights() re-derives it after an optimizer step — conversion,
        # sync, and requantize-on-load all agree bit-for-bit.
        layer.sync_weights()
        if bias is not None:
            layer.bias = to_jnp(bias).astype(dtype)
        return layer

    # --- checkpointing (the Linear4bit protocol, reference
    # nn/linear4bit.py:245-312; the master fp weight is the source of
    # truth — the int8 buffers are derived and re-derivable) --------------
    def state_dict(self, prefix: str = "") -> dict:
        d = {prefix + "weight_fp": self.weight_fp,
             prefix + "weight_int8": self.weight_int8,
             prefix + "weight_scales": self.weight_scales}
        if self.bias is not None:
            d[prefix + "bias"] = self.bias
        return d

    def load_state_dict(self, state_dict: dict, prefix: str = "") -> None:
        w_key = prefix + "weight"
        fp_key = prefix + "weight_fp"
        if w_key in state_dict:
            # Full-precision (plain nn.Linear) checkpoint: becomes the
            # master weight; int8 buffers re-derive via sync_weights.
            w = to_jnp(state_dict[w_key])
            if w.dtype not in (jnp.float16, jnp.float32, jnp.bfloat16):
                raise ValueError(
                    f"SwitchBackLinear: '{w_key}' must be full-precision "
                    f"to load as the master weight, got {w.dtype}")
            self.weight_fp = w.astype(self.compute_dtype)
            self.sync_weights()
        if fp_key in state_dict:
            self.weight_fp = to_jnp(state_dict[fp_key]).astype(
                self.compute_dtype)
            if prefix + "weight_int8" not in state_dict:
                self.sync_weights()
        if prefix + "weight_int8" in state_dict:
            self.weight_int8 = to_jnp(
                state_dict[prefix + "weight_int8"]).astype(jnp.int8)
        if prefix + "weight_scales" in state_dict:
            self.weight_scales = to_jnp(
                state_dict[prefix + "weight_scales"]).astype(jnp.float32)
        b_key = prefix + "bias"
        if b_key in state_dict and self.bias is not None:
            self.bias = to_jnp(state_dict[b_key]).astype(self.compute_dtype)

    def extra_repr(self):
        return (f"in_features={self.in_features}, out_features={self.out_features}, "
                f"bias={self.bias is not None}")


class SwitchBackLinearCallback:
    """Collects SwitchBackLinear layers of a model; ``sync()`` re-quantizes all.

    Parity with the reference callback (nn/switchback.py:239-260).
    """

    def __init__(self, model: Module):
        self.switchback_layers = [m for m in model.modules()
                                  if isinstance(m, SwitchBackLinear)]

    def sync(self):
        for layer in self.switchback_layers:
            layer.sync_weights()
