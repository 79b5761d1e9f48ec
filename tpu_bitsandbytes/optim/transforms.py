"""8-bit optimizers as optax-style gradient transformations.

TPU-native redesign of the reference optimizer layer
(mps_bitsandbytes/optim/*.py). Instead of in-place tensor mutation inside a
torch ``Optimizer.step`` loop, each optimizer is a pure
``optax.GradientTransformation`` whose *state pytree holds the quantized
buffers* (int8 momentum + per-block absmax, uint8 sqrt-compressed second
moment + per-block max). The whole update — dequantize → moment update →
parameter delta → requantize — jits into one fused XLA computation per
parameter (the role the fused Metal kernels K19-K21 play in the reference,
csrc/mps_bitsandbytes.mm:1300-1592).

Class wrappers with the reference's torch-like API live in
:mod:`tpu_bitsandbytes.optim.wrappers`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .state8bit import (
    dequantize_state,
    dequantize_state_unsigned,
    quantize_state,
    quantize_state_unsigned,
)

__all__ = ["adam8bit", "adamw8bit", "lion8bit", "sgd8bit"]


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    exp_avg_int8: any
    exp_avg_absmax: any
    exp_avg_sq_uint8: any
    exp_avg_sq_max: any


def _q_zero_like(p, block_size):
    q, ax = quantize_state(jnp.zeros(p.shape, jnp.float32), block_size)
    return q, ax


def _qu_zero_like(p, block_size):
    q, mx = quantize_state_unsigned(jnp.zeros(p.shape, jnp.float32), block_size)
    return q, mx


def adam8bit(
    learning_rate: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    block_size: int = 256,
    is_adamw: bool = False,
    use_fused_kernel: Optional[bool] = None,
) -> optax.GradientTransformation:
    """Adam/AdamW with int8/uint8 blockwise-quantized moments.

    Math matches the reference exactly (optim/adam8bit.py:251-283, :404-428):
    Adam applies weight decay as L2-on-grad; AdamW decouples it.
    """

    def init_fn(params):
        flat, treedef = jax.tree_util.tree_flatten(params)
        mq = [_q_zero_like(p, block_size) for p in flat]
        vq = [_qu_zero_like(p, block_size) for p in flat]
        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            exp_avg_int8=treedef.unflatten([t[0] for t in mq]),
            exp_avg_absmax=treedef.unflatten([t[1] for t in mq]),
            exp_avg_sq_uint8=treedef.unflatten([t[0] for t in vq]),
            exp_avg_sq_max=treedef.unflatten([t[1] for t in vq]),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("adam8bit requires params for weight decay / updates")
        count = state.count + 1
        step = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** step
        bc2 = 1.0 - b2 ** step

        def leaf_update(g, p, m_q, m_ax, v_q, v_mx):
            g32 = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            if not is_adamw and weight_decay != 0.0:
                g32 = g32 + weight_decay * p32
            m = dequantize_state(m_q, m_ax, block_size)
            v = dequantize_state_unsigned(v_q, v_mx, block_size)
            m = b1 * m + (1.0 - b1) * g32
            v = b2 * v + (1.0 - b2) * g32 * g32
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            upd = -(learning_rate / bc1) * (m / denom)
            if is_adamw and weight_decay != 0.0:
                upd = upd - learning_rate * weight_decay * p32
            m_q2, m_ax2 = quantize_state(m, block_size)
            v_q2, v_mx2 = quantize_state_unsigned(v, block_size)
            return upd.astype(p.dtype), m_q2, m_ax2, v_q2, v_mx2

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_p = treedef.flatten_up_to(params)
        flat_mq = treedef.flatten_up_to(state.exp_avg_int8)
        flat_max = treedef.flatten_up_to(state.exp_avg_absmax)
        flat_vq = treedef.flatten_up_to(state.exp_avg_sq_uint8)
        flat_vmx = treedef.flatten_up_to(state.exp_avg_sq_max)

        results = [leaf_update(g, p, mq, ma, vq, vm) for g, p, mq, ma, vq, vm in
                   zip(flat_g, flat_p, flat_mq, flat_max, flat_vq, flat_vmx)]
        upds = treedef.unflatten([r[0] for r in results])
        new_state = Adam8bitState(
            count=count,
            exp_avg_int8=treedef.unflatten([r[1] for r in results]),
            exp_avg_absmax=treedef.unflatten([r[2] for r in results]),
            exp_avg_sq_uint8=treedef.unflatten([r[3] for r in results]),
            exp_avg_sq_max=treedef.unflatten([r[4] for r in results]),
        )
        return upds, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def adamw8bit(learning_rate: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8, weight_decay: float = 1e-2,
              block_size: int = 256) -> optax.GradientTransformation:
    """AdamW8bit = adam8bit with decoupled weight decay."""
    return adam8bit(learning_rate, b1, b2, eps, weight_decay, block_size,
                    is_adamw=True)


class Lion8bitState(NamedTuple):
    exp_avg_int8: any
    exp_avg_absmax: any


def lion8bit(learning_rate: float = 1e-4, b1: float = 0.9, b2: float = 0.99,
             weight_decay: float = 0.0, block_size: int = 256
             ) -> optax.GradientTransformation:
    """Lion with a single int8 momentum (reference optim/lion8bit.py:60-121)."""

    def init_fn(params):
        flat, treedef = jax.tree_util.tree_flatten(params)
        mq = [_q_zero_like(p, block_size) for p in flat]
        return Lion8bitState(
            exp_avg_int8=treedef.unflatten([t[0] for t in mq]),
            exp_avg_absmax=treedef.unflatten([t[1] for t in mq]),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("lion8bit requires params")

        def leaf_update(g, p, m_q, m_ax):
            g32 = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            m = dequantize_state(m_q, m_ax, block_size)
            upd = jnp.sign(b1 * m + (1.0 - b1) * g32) * (-learning_rate)
            if weight_decay != 0.0:
                upd = upd - learning_rate * weight_decay * p32
            m = b2 * m + (1.0 - b2) * g32
            m_q2, m_ax2 = quantize_state(m, block_size)
            return upd.astype(p.dtype), m_q2, m_ax2

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_p = treedef.flatten_up_to(params)
        flat_mq = treedef.flatten_up_to(state.exp_avg_int8)
        flat_max = treedef.flatten_up_to(state.exp_avg_absmax)
        results = [leaf_update(g, p, mq, ma)
                   for g, p, mq, ma in zip(flat_g, flat_p, flat_mq, flat_max)]
        return (treedef.unflatten([r[0] for r in results]),
                Lion8bitState(
                    exp_avg_int8=treedef.unflatten([r[1] for r in results]),
                    exp_avg_absmax=treedef.unflatten([r[2] for r in results])))

    return optax.GradientTransformation(init_fn, update_fn)


class SGD8bitState(NamedTuple):
    momentum_int8: any
    momentum_absmax: any


def sgd8bit(learning_rate: float = 1e-2, momentum: float = 0.9,
            dampening: float = 0.0, weight_decay: float = 0.0,
            nesterov: bool = False, block_size: int = 256
            ) -> optax.GradientTransformation:
    """SGD with int8 momentum buffer (reference optim/sgd8bit.py:60-122)."""

    def init_fn(params):
        if momentum == 0:
            return SGD8bitState(momentum_int8=None, momentum_absmax=None)
        flat, treedef = jax.tree_util.tree_flatten(params)
        mq = [_q_zero_like(p, block_size) for p in flat]
        return SGD8bitState(
            momentum_int8=treedef.unflatten([t[0] for t in mq]),
            momentum_absmax=treedef.unflatten([t[1] for t in mq]),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("sgd8bit requires params")

        def leaf_update(g, p, m_q, m_ax):
            g32 = g.astype(jnp.float32)
            if weight_decay != 0.0:
                g32 = g32 + weight_decay * p.astype(jnp.float32)
            if momentum != 0:
                buf = dequantize_state(m_q, m_ax, block_size)
                buf = momentum * buf + (1.0 - dampening) * g32
                d = g32 + momentum * buf if nesterov else buf
                m_q2, m_ax2 = quantize_state(buf, block_size)
            else:
                d, m_q2, m_ax2 = g32, None, None
            return (-learning_rate * d).astype(p.dtype), m_q2, m_ax2

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_p = treedef.flatten_up_to(params)
        if momentum != 0:
            flat_mq = treedef.flatten_up_to(state.momentum_int8)
            flat_max = treedef.flatten_up_to(state.momentum_absmax)
        else:
            flat_mq = [None] * len(flat_g)
            flat_max = [None] * len(flat_g)
        results = [leaf_update(g, p, mq, ma)
                   for g, p, mq, ma in zip(flat_g, flat_p, flat_mq, flat_max)]
        upds = treedef.unflatten([r[0] for r in results])
        if momentum != 0:
            new_state = SGD8bitState(
                momentum_int8=treedef.unflatten([r[1] for r in results]),
                momentum_absmax=treedef.unflatten([r[2] for r in results]))
        else:
            new_state = state
        return upds, new_state

    return optax.GradientTransformation(init_fn, update_fn)
