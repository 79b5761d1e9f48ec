"""Paged optimizers — fp32 optimizer states offloaded to host memory.

TPU-native rebuild of the reference paged optimizers
(mps_bitsandbytes/optim/paged.py:13-436). States live on the host CPU device
and are paged onto the accelerator per-parameter at ``step()``:

* same small/large parameter split at 32768 elements (:98-105);
* the reference's async prefetch of the *next* parameter's states
  (:107-156) was built and MEASURED on the chip (kbench/paged_probe,
  round 5): issuing leaf i+1's H2D device_put before leaf i's compute ran
  1.37x SLOWER than paging each leaf in at use — JAX's async dispatch
  gives no measurable H2D/compute overlap for this pattern on this
  host-transport, and the lookahead only widens peak in-flight transfer.
  The step loop therefore pages each leaf in immediately before its
  update (the measured-faster order); KERNEL_NOTES round 5 records the
  numbers;
* page-out is an async device_put back to the host (:172-174); JAX tracks
  the dependency, so no manual ``synchronize()`` is required (the method
  exists for API parity).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["PagedAdamW", "PagedAdam", "PagedLion"]

_SMALL_PARAM_NUMEL = 32768


def _host_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


def _accel_device():
    return jax.devices()[0]


@partial(jax.jit, static_argnames=("is_adamw",), donate_argnums=(1, 2))
def _adam_leaf_step(p, m, v, g, step, lr, b1, b2, eps, weight_decay, is_adamw):
    g32 = g.astype(jnp.float32)
    p32 = p.astype(jnp.float32)
    if is_adamw:
        p32 = p32 * (1.0 - lr * weight_decay)
    else:
        g32 = g32 + weight_decay * p32
    m = b1 * m + (1.0 - b1) * g32
    v = b2 * v + (1.0 - b2) * g32 * g32
    bc1 = 1.0 - b1 ** step
    bc2 = 1.0 - b2 ** step
    denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
    p32 = p32 - (lr / bc1) * m / denom
    return p32.astype(p.dtype), m, v


@jax.jit
def _lion_leaf_step(p, m, g, lr, b1, b2, weight_decay):
    g32 = g.astype(jnp.float32)
    p32 = p.astype(jnp.float32)
    p32 = p32 * (1.0 - lr * weight_decay)
    update = jnp.sign(b1 * m + (1.0 - b1) * g32)
    p32 = p32 - lr * update
    m = b2 * m + (1.0 - b2) * g32
    return p32.astype(p.dtype), m


class _PagedBase:
    def __init__(self, params, page_to_cpu: bool = True):
        self.params = params
        self.page_to_cpu = page_to_cpu and _host_device() is not None
        self._host = _host_device()
        self._accel = _accel_device()
        self.state = None  # list of per-leaf dicts, aligned with flat params
        self._treedef = None
        self.step_count = 0

    def synchronize(self):
        """Block until pending async transfers complete (API parity)."""
        for leaf in jax.tree_util.tree_leaves(self.params):
            leaf.block_until_ready()
        if self.state:
            for s in self.state:
                for v in s.values():
                    if hasattr(v, "block_until_ready"):
                        v.block_until_ready()

    def _flat_params(self):
        flat, treedef = jax.tree_util.tree_flatten(self.params)
        self._treedef = treedef
        return flat

    def _storage_for(self, p):
        if self.page_to_cpu and p.size >= _SMALL_PARAM_NUMEL:
            return self._host
        return None  # stays on accelerator

    def _init_state_leaf(self, p, names):
        dev = self._storage_for(p)
        out = {}
        for name in names:  # distinct buffers — the step donates them
            zeros = jnp.zeros(p.shape, jnp.float32)
            if dev is not None:
                zeros = jax.device_put(zeros, dev)
            out[name] = zeros
        return out


class PagedAdamW(_PagedBase):
    """AdamW with host-paged fp32 states (reference paged.py:13-220)."""

    _is_adamw = True

    def __init__(self, params, lr: float = 1e-3,
                 betas: Tuple[float, float] = (0.9, 0.999), eps: float = 1e-8,
                 weight_decay: float = 1e-2, page_to_cpu: bool = True):
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
        super().__init__(params, page_to_cpu)
        self.lr, self.betas, self.eps = lr, betas, eps
        self.weight_decay = weight_decay

    def step(self, grads, params=None):
        if params is not None:
            self.params = params
        flat_p = self._flat_params()
        flat_g = self._treedef.flatten_up_to(grads)
        if self.state is None:
            self.state = [self._init_state_leaf(p, ("exp_avg", "exp_avg_sq"))
                          for p in flat_p]
        self.step_count += 1
        step = float(self.step_count)

        n = len(flat_p)
        # Page each leaf in at use: the lookahead-prefetch order measured
        # 1.37x slower on chip (kbench/paged_probe — no H2D/compute overlap
        # from async dispatch on this transport; see module docstring).
        new_flat = []
        for i in range(n):
            m, v = self._page_in(i)
            p_new, m_new, v_new = _adam_leaf_step(
                flat_p[i], m, v, flat_g[i], step, self.lr, self.betas[0],
                self.betas[1], self.eps, self.weight_decay, self._is_adamw)
            self._page_out(i, exp_avg=m_new, exp_avg_sq=v_new)
            new_flat.append(p_new)
        self.params = self._treedef.unflatten(new_flat)
        return self.params

    def _page_in(self, i):
        s = self.state[i]
        m, v = s["exp_avg"], s["exp_avg_sq"]
        if self.page_to_cpu and m.devices() != {self._accel}:
            m = jax.device_put(m, self._accel)
            v = jax.device_put(v, self._accel)
        return m, v

    def _page_out(self, i, **named):
        dev = self._storage_for(next(iter(named.values())))
        for k, val in named.items():
            self.state[i][k] = jax.device_put(val, dev) if dev is not None else val


class PagedAdam(PagedAdamW):
    """Paged Adam: L2 weight decay on the gradient, not decoupled (:223-313)."""

    _is_adamw = False

    def __init__(self, params, lr: float = 1e-3,
                 betas: Tuple[float, float] = (0.9, 0.999), eps: float = 1e-8,
                 weight_decay: float = 0.0, page_to_cpu: bool = True):
        super().__init__(params, lr, betas, eps, weight_decay, page_to_cpu)


class PagedLion(_PagedBase):
    """Paged Lion with host-resident fp32 momentum (:316-436)."""

    def __init__(self, params, lr: float = 1e-4,
                 betas: Tuple[float, float] = (0.9, 0.99),
                 weight_decay: float = 0.0, page_to_cpu: bool = True):
        if lr < 0.0:
            raise ValueError(f"Invalid learning rate: {lr}")
        if not 0.0 <= betas[0] < 1.0:
            raise ValueError(f"Invalid beta1: {betas[0]}")
        if not 0.0 <= betas[1] < 1.0:
            raise ValueError(f"Invalid beta2: {betas[1]}")
        if weight_decay < 0.0:
            raise ValueError(f"Invalid weight_decay: {weight_decay}")
        super().__init__(params, page_to_cpu)
        self.lr, self.betas, self.weight_decay = lr, betas, weight_decay

    def step(self, grads, params=None):
        if params is not None:
            self.params = params
        flat_p = self._flat_params()
        flat_g = self._treedef.flatten_up_to(grads)
        if self.state is None:
            self.state = [self._init_state_leaf(p, ("exp_avg",)) for p in flat_p]

        n = len(flat_p)
        # At-use paging — measured faster than lookahead prefetch (see
        # module docstring / kbench/paged_probe).
        new_flat = []
        for i in range(n):
            m = self._page_in(i)
            p_new, m_new = _lion_leaf_step(
                flat_p[i], m, flat_g[i], self.lr, self.betas[0], self.betas[1],
                self.weight_decay)
            dev = self._storage_for(m_new)
            self.state[i]["exp_avg"] = (
                jax.device_put(m_new, dev) if dev is not None else m_new)
            new_flat.append(p_new)
        self.params = self._treedef.unflatten(new_flat)
        return self.params

    def _page_in(self, i):
        m = self.state[i]["exp_avg"]
        if self.page_to_cpu and m.devices() != {self._accel}:
            m = jax.device_put(m, self._accel)
        return m
