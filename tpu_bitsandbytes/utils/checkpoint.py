"""Checkpoint save/load for quantized param pytrees.

The reference checkpoints via torch ``state_dict`` with QuantState nested
dicts and re-quantize-on-load (nn/linear4bit.py:245-312, SURVEY §5). The TPU
equivalent serializes any framework pytree — dicts/lists of arrays,
``QuantState``, ``QLinear4``, ``LoRALinear``, modules — to a single ``.npz``
(arrays) + embedded JSON structure manifest, and restores it with types
intact. ``load_quantized`` also accepts a full-precision checkpoint and
re-quantizes on load, mirroring the reference affordance.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..functional import QuantState, quantize_4bit

_SENTINEL_NONE = {"__type__": "none"}


def _module_registry():
    """Known Module classes by name, for checkpoint rehydration."""
    from .. import nn
    from ..models import gpt2
    classes = [
        nn.Linear, nn.Embedding, nn.Linear4bit, nn.Linear8bit, nn.LinearFP8,
        nn.OutlierAwareLinear, nn.SwitchBackLinear,
        nn.Embedding4bit, nn.Embedding8bit, nn.EmbeddingNF4, nn.EmbeddingFP4,
        gpt2.GPT2LMHeadModel, gpt2.GPT2Block, gpt2.GPT2Attention,
        gpt2.GPT2MLP, gpt2.LayerNorm,
    ]
    return {c.__name__: c for c in classes}


def _encode(obj: Any, arrays: Dict[str, np.ndarray], path: str):
    from ..models.layers import QLinear4
    from ..models.lora import LoRALinear
    from ..nn.base import Module

    if obj is None:
        return _SENTINEL_NONE
    if isinstance(obj, (bool, int, float, str)):
        return obj
    if isinstance(obj, (np.dtype,)) or type(obj).__module__ == "jax.numpy":
        return {"__type__": "dtype", "name": np.dtype(obj).name}
    # NOTE: structured types must be checked before the generic array branch —
    # QuantState/QLinear4 also expose .shape/.dtype.
    if isinstance(obj, QuantState):
        return {"__type__": "QuantState",
                "absmax": _encode(obj.absmax, arrays, path),
                "shape": list(obj.shape),
                "blocksize": obj.blocksize,
                "quant_type": obj.quant_type,
                "dtype": jnp.dtype(obj.dtype).name,
                "offset": _encode(obj.offset, arrays, path),
                "state2": _encode(obj.state2, arrays, path)}
    if isinstance(obj, QLinear4):
        # Runtime exec caches (w_cache/cache_scale) are rebuildable from the
        # packed codes and deliberately not checkpointed; NF4 is the storage
        # format (reference: nn/linear4bit.py:245-312 serializes QuantState).
        if obj.packed is None:
            raise TypeError(
                f"cannot checkpoint {path}: packed codes were dropped "
                "(with_runtime_cache(drop_packed=True) is serving-only)")
        return {"__type__": "QLinear4",
                "packed": _encode(obj.packed, arrays, path),
                "absmax": _encode(obj.absmax, arrays, path),
                "shape": list(obj.shape),
                "blocksize": obj.blocksize,
                "quant_type": obj.quant_type,
                "dtype": jnp.dtype(obj.dtype).name,
                "bias": _encode(obj.bias, arrays, path),
                "absmax_q": _encode(obj.absmax_q, arrays, path),
                "absmax_state": _encode(obj.absmax_state, arrays, path)}
    if isinstance(obj, LoRALinear):
        return {"__type__": "LoRALinear",
                "base": _encode(obj.base, arrays, path),
                "lora_A": _encode(obj.lora_A, arrays, path),
                "lora_B": _encode(obj.lora_B, arrays, path),
                "scaling": obj.scaling}
    if isinstance(obj, Module):
        fields = {k: _encode(v, arrays, f"{path}/{k}")
                  for k, v in vars(obj).items()}
        return {"__type__": "Module", "class": type(obj).__name__,
                "fields": fields}
    if hasattr(obj, "shape") and hasattr(obj, "dtype"):  # array leaf
        key = f"a{len(arrays)}"
        a = np.asarray(obj)
        if a.dtype == jnp.bfloat16:
            arrays[key] = a.view(np.uint16)
            return {"__type__": "array", "key": key, "dtype": "bfloat16"}
        arrays[key] = a
        return {"__type__": "array", "key": key, "dtype": str(a.dtype)}
    if isinstance(obj, dict):
        return {"__type__": "dict",
                "items": {k: _encode(v, arrays, f"{path}/{k}")
                          for k, v in obj.items()}}
    if isinstance(obj, (list, tuple)):
        return {"__type__": "list" if isinstance(obj, list) else "tuple",
                "items": [_encode(v, arrays, f"{path}/{i}")
                          for i, v in enumerate(obj)]}
    raise TypeError(f"cannot serialize {type(obj)} at {path}")


def _decode(spec: Any, arrays) -> Any:
    from ..models.layers import QLinear4
    from ..models.lora import LoRALinear

    if not isinstance(spec, dict):
        return spec
    t = spec.get("__type__")
    if t is None:
        return spec
    if t == "none":
        return None
    if t == "dtype":
        return jnp.dtype(spec["name"])
    if t == "array":
        a = arrays[spec["key"]]
        if spec["dtype"] == "bfloat16":
            return jnp.asarray(a).view(jnp.bfloat16)
        return jnp.asarray(a)
    if t == "QuantState":
        return QuantState(
            absmax=_decode(spec["absmax"], arrays),
            shape=tuple(spec["shape"]), blocksize=spec["blocksize"],
            quant_type=spec["quant_type"], dtype=jnp.dtype(spec["dtype"]),
            offset=_decode(spec["offset"], arrays),
            state2=_decode(spec["state2"], arrays))
    if t == "QLinear4":
        return QLinear4(
            packed=_decode(spec["packed"], arrays),
            absmax=_decode(spec["absmax"], arrays),
            shape=tuple(spec["shape"]), blocksize=spec["blocksize"],
            quant_type=spec["quant_type"], dtype=jnp.dtype(spec["dtype"]),
            bias=_decode(spec["bias"], arrays),
            absmax_q=_decode(spec["absmax_q"], arrays),
            absmax_state=_decode(spec["absmax_state"], arrays))
    if t == "LoRALinear":
        return LoRALinear(base=_decode(spec["base"], arrays),
                          lora_A=_decode(spec["lora_A"], arrays),
                          lora_B=_decode(spec["lora_B"], arrays),
                          scaling=spec["scaling"])
    if t == "Module":
        fields = {k: _decode(v, arrays) for k, v in spec["fields"].items()}
        cls = _module_registry().get(spec.get("class"))
        if cls is None:
            import warnings
            warnings.warn(
                f"checkpoint: unknown Module class '{spec.get('class')}' — "
                f"restoring as a plain field dict", UserWarning)
            return fields
        obj = object.__new__(cls)
        for k, v in fields.items():
            object.__setattr__(obj, k, v)
        return obj
    if t == "dict":
        return {k: _decode(v, arrays) for k, v in spec["items"].items()}
    if t == "list":
        return [_decode(v, arrays) for v in spec["items"]]
    if t == "tuple":
        return tuple(_decode(v, arrays) for v in spec["items"])
    raise TypeError(f"cannot deserialize tag {t}")


def save_checkpoint(path: str, tree: Any) -> None:
    """Serialize any framework pytree to ``path`` (.npz)."""
    arrays: Dict[str, np.ndarray] = {}
    spec = _encode(tree, arrays, "")
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(spec).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_checkpoint(path: str) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`."""
    if not str(path).endswith(".npz"):
        path = str(path) + ".npz"
    with np.load(path) as data:
        spec = json.loads(bytes(data["__manifest__"]).decode())
        arrays = {k: data[k] for k in data.files if k != "__manifest__"}
    return _decode(spec, arrays)


def load_quantized(path: str, blocksize: int = 64, quant_type: str = "nf4",
                   compress_statistics: bool = False):
    """Load a Llama-family checkpoint; re-quantize on load if it holds
    full-precision linears (the reference's load affordance,
    nn/linear4bit.py:283-299)."""
    from ..models import llama
    tree = load_checkpoint(path)
    if not (isinstance(tree, dict) and "layers" in tree):
        return tree
    needs_quant = any(
        not hasattr(layer.get("q_proj"), "packed")
        for layer in tree["layers"])
    if needs_quant:
        tree = llama.quantize_params(
            tree, blocksize=blocksize, quant_type=quant_type,
            compress_statistics=compress_statistics)
    return tree
