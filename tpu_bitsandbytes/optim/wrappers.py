"""Torch-like optimizer classes over the optax-style transforms.

API parity with the reference optimizers (Adam8bit/AdamW8bit/Lion8bit/SGD8bit,
mps_bitsandbytes/optim/*.py) including constructor validation messages and
``max_grad_norm`` global-norm clipping (optim/adam8bit.py:200-204). JAX is
functional, so ``step(grads)`` takes a gradient pytree matching the params
and returns (and internally stores) the updated params.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import transforms

__all__ = ["Adam8bit", "AdamW8bit", "Lion8bit", "SGD8bit"]


def clip_by_global_norm(grads, max_norm: float):
    """Global-norm gradient clipping (torch.nn.utils.clip_grad_norm_ semantics)."""
    leaves = jax.tree_util.tree_leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                         for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(total, 1e-6))
    return jax.tree_util.tree_map(lambda g: (g * scale).astype(g.dtype), grads)


class _OptimizerBase:
    """Holds a params pytree + quantized opt state; ``step`` is functional."""

    def __init__(self, params, tx, max_grad_norm: Optional[float] = None):
        self.params = params
        self.tx = tx
        self.opt_state = None
        self.max_grad_norm = max_grad_norm

    def init(self):
        if self.opt_state is None:
            self.opt_state = self.tx.init(self.params)
        return self.opt_state

    @property
    def state(self):
        return self.opt_state

    def step(self, grads, params=None):
        """Apply one update. Returns the new params pytree."""
        if params is not None:
            self.params = params
        self.init()
        if self.max_grad_norm is not None:
            grads = clip_by_global_norm(grads, self.max_grad_norm)
        updates, self.opt_state = self.tx.update(grads, self.opt_state, self.params)
        self.params = jax.tree_util.tree_map(
            lambda p, u: (p.astype(jnp.float32) + u.astype(jnp.float32)
                          ).astype(p.dtype),
            self.params, updates)
        return self.params


def _validate_adam(lr, betas, eps, weight_decay, max_grad_norm):
    if lr < 0.0:
        raise ValueError(f"Invalid learning rate: {lr}")
    if eps < 0.0:
        raise ValueError(f"Invalid epsilon: {eps}")
    if not 0.0 <= betas[0] < 1.0:
        raise ValueError(f"Invalid beta1: {betas[0]}")
    if not 0.0 <= betas[1] < 1.0:
        raise ValueError(f"Invalid beta2: {betas[1]}")
    if weight_decay < 0.0:
        raise ValueError(f"Invalid weight_decay: {weight_decay}")
    if max_grad_norm is not None and max_grad_norm <= 0.0:
        raise ValueError(f"Invalid max_grad_norm: {max_grad_norm}")


class Adam8bit(_OptimizerBase):
    """8-bit Adam (int8 m, sqrt-compressed uint8 v; L2-style weight decay)."""

    def __init__(self, params, lr: float = 1e-3,
                 betas: Tuple[float, float] = (0.9, 0.999), eps: float = 1e-8,
                 weight_decay: float = 0.0, block_size: int = 256,
                 max_grad_norm: Optional[float] = None):
        _validate_adam(lr, betas, eps, weight_decay, max_grad_norm)
        super().__init__(params, transforms.adam8bit(
            lr, betas[0], betas[1], eps, weight_decay, block_size,
            is_adamw=False), max_grad_norm)


class AdamW8bit(_OptimizerBase):
    """8-bit AdamW (decoupled weight decay, reference :404-428)."""

    def __init__(self, params, lr: float = 1e-3,
                 betas: Tuple[float, float] = (0.9, 0.999), eps: float = 1e-8,
                 weight_decay: float = 1e-2, block_size: int = 256,
                 max_grad_norm: Optional[float] = None):
        _validate_adam(lr, betas, eps, weight_decay, max_grad_norm)
        super().__init__(params, transforms.adam8bit(
            lr, betas[0], betas[1], eps, weight_decay, block_size,
            is_adamw=True), max_grad_norm)


class Lion8bit(_OptimizerBase):
    """8-bit Lion (sign update, single int8 momentum)."""

    def __init__(self, params, lr: float = 1e-4,
                 betas: Tuple[float, float] = (0.9, 0.99),
                 weight_decay: float = 0.0, block_size: int = 256):
        if lr < 0.0:
            raise ValueError(f"Invalid learning rate: {lr}")
        if not 0.0 <= betas[0] < 1.0:
            raise ValueError(f"Invalid beta1: {betas[0]}")
        if not 0.0 <= betas[1] < 1.0:
            raise ValueError(f"Invalid beta2: {betas[1]}")
        if weight_decay < 0.0:
            raise ValueError(f"Invalid weight_decay: {weight_decay}")
        super().__init__(params, transforms.lion8bit(
            lr, betas[0], betas[1], weight_decay, block_size))


class SGD8bit(_OptimizerBase):
    """SGD with int8 momentum buffer."""

    def __init__(self, params, lr: float = 1e-2, momentum: float = 0.9,
                 dampening: float = 0.0, weight_decay: float = 0.0,
                 nesterov: bool = False, block_size: int = 256):
        if lr < 0.0:
            raise ValueError(f"Invalid learning rate: {lr}")
        if momentum < 0.0:
            raise ValueError(f"Invalid momentum: {momentum}")
        if weight_decay < 0.0:
            raise ValueError(f"Invalid weight_decay: {weight_decay}")
        if nesterov and (momentum <= 0 or dampening != 0):
            raise ValueError(
                "Nesterov momentum requires a momentum and zero dampening")
        super().__init__(params, transforms.sgd8bit(
            lr, momentum, dampening, weight_decay, nesterov, block_size))
