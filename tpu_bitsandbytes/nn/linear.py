"""Plain (unquantized) Linear / Embedding modules.

The reference operates on ``torch.nn.Linear``/``nn.Embedding`` as conversion
*sources*; in the JAX world this framework provides its own light equivalents
so model surgery (``quantize_model``/``replace_linear_with_4bit``) has a
native substrate to convert from.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import Module


def to_jnp(x) -> jnp.ndarray:
    """Array coercion accepting jax/numpy arrays and torch tensors."""
    if isinstance(x, jnp.ndarray):
        return x
    if hasattr(x, "detach"):  # torch tensor
        t = x.detach()
        if hasattr(t, "cpu"):
            t = t.cpu()
        if t.dtype == getattr(__import__("torch"), "bfloat16", None):
            t = t.float()
        return jnp.asarray(t.numpy())
    return jnp.asarray(np.asarray(x))


class Linear(Module):
    """y = x @ W.T + b with W stored [out_features, in_features]."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 dtype=jnp.bfloat16, key: Optional[jax.Array] = None):
        self.in_features = int(in_features)
        self.out_features = int(out_features)
        if key is None:
            key = jax.random.PRNGKey(0)
        bound = 1.0 / np.sqrt(in_features)
        self.weight = jax.random.uniform(
            key, (out_features, in_features), dtype=jnp.float32,
            minval=-bound, maxval=bound).astype(dtype)
        self.bias = jnp.zeros((out_features,), dtype=dtype) if bias else None

    def forward(self, x):
        out = jnp.asarray(x).astype(self.weight.dtype) @ self.weight.T
        if self.bias is not None:
            out = out + self.bias
        return out

    def extra_repr(self):
        return (f"in_features={self.in_features}, out_features={self.out_features}, "
                f"bias={self.bias is not None}")


class Embedding(Module):
    """Token embedding lookup with optional padding_idx zeroing."""

    def __init__(self, num_embeddings: int, embedding_dim: int,
                 padding_idx: Optional[int] = None, dtype=jnp.bfloat16,
                 key: Optional[jax.Array] = None):
        self.num_embeddings = int(num_embeddings)
        self.embedding_dim = int(embedding_dim)
        self.padding_idx = padding_idx
        if key is None:
            key = jax.random.PRNGKey(0)
        self.weight = jax.random.normal(
            key, (num_embeddings, embedding_dim), dtype=jnp.float32).astype(dtype)

    def forward(self, input):
        ids = jnp.asarray(input)
        out = jnp.take(self.weight, ids, axis=0)
        if self.padding_idx is not None:
            out = jnp.where((ids == self.padding_idx)[..., None],
                            jnp.zeros((), out.dtype), out)
        return out

    def extra_repr(self):
        return (f"{self.num_embeddings}, {self.embedding_dim}, "
                f"padding_idx={self.padding_idx}")
