"""Minimal pytree-native module system.

The reference builds on ``torch.nn.Module`` (stateful buffers/parameters).
The TPU-native equivalent keeps the same torch-like UX — modules are objects
holding arrays, constructed once and called like functions — but every module
is a registered JAX pytree, so a module (or a whole model of them) flows
directly through ``jax.jit`` / ``pjit`` / ``shard_map`` / ``jax.grad`` and
checkpointing without any extraction step.

Flattening rule: attributes holding arrays, ``QuantState``s, sub-``Module``s,
or containers thereof are dynamic leaves; plain Python config (ints, strings,
dtypes, shapes) is static aux data. The split is recomputed per instance, so
optional fields (``bias=None``) work naturally.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..functional import QuantState

_STATIC_TYPES = (int, float, bool, str, bytes, type(None), type)


def _is_dynamic(v: Any) -> bool:
    if isinstance(v, (jnp.ndarray, np.ndarray, QuantState, Module)):
        return True
    if isinstance(v, (list, dict)):
        return True  # containers may hold arrays; treat as subtree
    if isinstance(v, tuple):
        # config tuples (shapes, dims) stay static; tuples holding arrays /
        # modules / containers are real subtrees
        return any(_is_dynamic(x) for x in v)
    return False  # dtypes, np.dtype instances, and other config are static


class Module:
    """Base class: subclasses are automatically registered as pytrees."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_node_class(cls)

    # --- pytree protocol -------------------------------------------------
    def tree_flatten(self) -> Tuple[tuple, tuple]:
        keys = sorted(self.__dict__)
        dyn_keys, dyn_vals, static_items = [], [], []
        for k in keys:
            v = self.__dict__[k]
            if _is_dynamic(v):
                dyn_keys.append(k)
                dyn_vals.append(v)
            else:
                static_items.append((k, v))
        return tuple(dyn_vals), (type(self), tuple(dyn_keys), tuple(static_items))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        klass, dyn_keys, static_items = aux
        obj = object.__new__(klass)
        for k, v in static_items:
            object.__setattr__(obj, k, v)
        for k, v in zip(dyn_keys, leaves):
            object.__setattr__(obj, k, v)
        return obj

    # --- torch-like conveniences -----------------------------------------
    def named_children(self):
        for k in sorted(self.__dict__):
            v = self.__dict__[k]
            if isinstance(v, Module):
                yield k, v
            elif isinstance(v, (list, tuple)):
                for i, item in enumerate(v):
                    if isinstance(item, Module):
                        yield f"{k}.{i}", item

    def named_modules(self, prefix: str = ""):
        yield prefix, self
        for name, child in self.named_children():
            sub = f"{prefix}.{name}" if prefix else name
            yield from child.named_modules(sub)

    def modules(self):
        for _, m in self.named_modules():
            yield m

    def to(self, device) -> "Module":
        """Return a copy with all array leaves on ``device``."""
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, device), self)

    # --- checkpointing -----------------------------------------------------
    # The reference gets per-module save/load for free from torch's
    # recursive nn.Module.state_dict (its custom hooks live at
    # mps_bitsandbytes/nn/linear4bit.py:245-312). Here the base class
    # provides the recursion: array attributes serialize under their names,
    # submodules (incl. lists/tuples of submodules) recurse with dotted
    # prefixes. Quantized modules override BOTH methods with their
    # format-specific protocol (requantize-on-load of full-precision
    # checkpoints, metadata mismatch warnings).
    def state_dict(self, prefix: str = "") -> dict:
        d = {}
        for k in sorted(self.__dict__):
            if k.startswith("_"):
                continue
            v = self.__dict__[k]
            if isinstance(v, Module):
                d.update(v.state_dict(prefix=f"{prefix}{k}."))
            elif isinstance(v, (list, tuple)) and any(
                    isinstance(x, Module) for x in v):
                for i, item in enumerate(v):
                    if isinstance(item, Module):
                        d.update(item.state_dict(prefix=f"{prefix}{k}.{i}."))
            elif isinstance(v, (jnp.ndarray, np.ndarray)):
                d[prefix + k] = v
        return d

    def load_state_dict(self, state_dict: dict, prefix: str = "") -> None:
        for k in sorted(self.__dict__):
            if k.startswith("_"):
                continue
            v = self.__dict__[k]
            if isinstance(v, Module):
                v.load_state_dict(state_dict, prefix=f"{prefix}{k}.")
            elif isinstance(v, (list, tuple)) and any(
                    isinstance(x, Module) for x in v):
                for i, item in enumerate(v):
                    if isinstance(item, Module):
                        item.load_state_dict(state_dict,
                                             prefix=f"{prefix}{k}.{i}.")
            elif isinstance(v, (jnp.ndarray, np.ndarray)):
                if prefix + k in state_dict:
                    loaded = jnp.asarray(state_dict[prefix + k])
                    setattr(self, k, loaded.astype(v.dtype)
                            if loaded.dtype != v.dtype else loaded)

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def forward(self, *args, **kwargs):  # pragma: no cover - abstract
        raise NotImplementedError

    def extra_repr(self) -> str:
        return ""

    def __repr__(self):
        head = f"{type(self).__name__}({self.extra_repr()})"
        children = list(self.named_children())
        if not children:
            return head
        body = "\n".join(
            f"  ({n}): " + repr(c).replace("\n", "\n  ") for n, c in children
        )
        return head + "\n" + body
