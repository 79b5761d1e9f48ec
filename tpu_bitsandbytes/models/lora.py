"""LoRA adapters over (quantized) functional linears — the QLoRA training path.

A :class:`LoRALinear` wraps any base weight leaf (fp array or
:class:`QLinear4`) with trainable low-rank A/B. The base stays frozen (packed
4-bit for QLoRA); only A/B receive gradients, which is what the 8-bit
optimizers then update (BASELINE config 5).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .layers import QLinear4, linear_apply


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LoRALinear:
    base: Any                 # QLinear4 | array [N, K] | dict
    lora_A: jnp.ndarray       # [r, K]
    lora_B: jnp.ndarray       # [N, r]
    scaling: float = 1.0

    def tree_flatten(self):
        return ((self.base, self.lora_A, self.lora_B), (self.scaling,))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        base, a, b = leaves
        obj = cls.__new__(cls)
        obj.base, obj.lora_A, obj.lora_B = base, a, b
        obj.scaling = aux[0]
        return obj

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = linear_apply(self.base, x)
        # base is frozen in QLoRA training
        delta = (x @ self.lora_A.T.astype(x.dtype)) @ self.lora_B.T.astype(x.dtype)
        return y + self.scaling * delta.astype(y.dtype)


DEFAULT_TARGETS = ("q_proj", "v_proj")


def attach_lora(params: Dict, key: jax.Array, rank: int = 8,
                alpha: float = 16.0, targets: Sequence[str] = DEFAULT_TARGETS,
                dtype=jnp.bfloat16) -> Dict:
    """Wrap target projections of a llama param tree with LoRA adapters."""
    scaling = alpha / rank
    out = dict(params)
    out["layers"] = []
    keys = jax.random.split(key, len(params["layers"]))
    for li, layer in enumerate(params["layers"]):
        nl = dict(layer)
        tkeys = jax.random.split(keys[li], len(targets))
        for ti, name in enumerate(targets):
            base = layer[name]
            if isinstance(base, QLinear4):
                n, k = base.shape
            else:
                n, k = base.shape
            a = (jax.random.normal(tkeys[ti], (rank, k), jnp.float32)
                 * 0.01).astype(dtype)
            b = jnp.zeros((n, rank), dtype)
            nl[name] = LoRALinear(base=base, lora_A=a, lora_B=b,
                                  scaling=scaling)
        out["layers"].append(nl)
    return out


def lora_trainable(params: Dict) -> Dict:
    """Extract the trainable LoRA leaves as {path: {A, B}} pytree."""
    out = {}
    for li, layer in enumerate(params["layers"]):
        for name, w in layer.items():
            if isinstance(w, LoRALinear):
                out[f"layers/{li}/{name}"] = {"A": w.lora_A, "B": w.lora_B}
    return out


def merge_lora_trainable(params: Dict, trainable: Dict) -> Dict:
    """Write updated A/B leaves back into the param tree."""
    out = dict(params)
    out["layers"] = []
    for li, layer in enumerate(params["layers"]):
        nl = dict(layer)
        for name, w in layer.items():
            key = f"layers/{li}/{name}"
            if isinstance(w, LoRALinear) and key in trainable:
                nl[name] = dataclasses.replace(
                    w, lora_A=trainable[key]["A"], lora_B=trainable[key]["B"])
        out["layers"].append(nl)
    return out
