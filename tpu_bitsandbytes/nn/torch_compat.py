"""PyTorch module compatibility: run this framework's quantized linears
inside a torch module tree.

The reference operates directly on torch models (its quantize_model swaps
``torch.nn.Linear`` for MPS-kerneled subclasses, integration.py:108-196).
This framework's compute is JAX/TPU, so the drop-in equivalent is a thin
torch adapter: :func:`wrap_quantized` returns a real ``torch.nn.Module``
whose ``forward`` converts at the boundary (torch → numpy → jnp), runs the
jitted quantized matmul on the TPU, and converts back. The weights live
once, in packed form, on the JAX side.

This is the *compatibility* surface — per-layer host↔device round-trips make
it fine for functional parity, tests, and small models, not for serving.
The production paths are the in-repo engine (``tpu_bitsandbytes.engine``)
and the HF conversion (``utils/hf.py``), which keep the whole forward on
device.
"""

from __future__ import annotations

import numpy as np

__all__ = ["is_torch_module", "wrap_quantized"]


def is_torch_module(obj) -> bool:
    """True for ``torch.nn.Module`` instances, without importing torch when
    it was never loaded (quantize_model dispatches on this)."""
    import sys
    torch = sys.modules.get("torch")
    if torch is None:
        return False
    return isinstance(obj, torch.nn.Module)


_WRAPPER_CLS = None


def _wrapper_cls():
    """Lazily build the torch adapter class (torch import deferred)."""
    global _WRAPPER_CLS
    if _WRAPPER_CLS is not None:
        return _WRAPPER_CLS
    import torch
    import jax.numpy as jnp

    class TorchQuantLinear(torch.nn.Module):
        """Torch-facing adapter over a tpu_bitsandbytes quantized linear
        (Linear4bit / Linear8bit / LinearFP8).

        The inner module is a plain attribute (not a torch submodule), so
        ``state_dict``/``.to()`` ignore it — the quantized weights are JAX
        arrays managed by the inner layer. ``forward`` round-trips through
        numpy; the output keeps the torch input's dtype.
        """

        def __init__(self, inner):
            super().__init__()
            object.__setattr__(self, "inner", inner)
            self.in_features = inner.in_features
            self.out_features = inner.out_features

        def forward(self, x):
            xt = x.detach()
            if xt.dtype in (torch.bfloat16, torch.float16):
                xt = xt.float()
            y = self.inner(jnp.asarray(xt.cpu().numpy()))
            out = torch.from_numpy(np.asarray(y, dtype=np.float32))
            return out.to(dtype=x.dtype, device=x.device)

        def extra_repr(self):
            return f"inner={self.inner!r}"

    _WRAPPER_CLS = TorchQuantLinear
    return TorchQuantLinear


def wrap_quantized(inner):
    """Wrap a tpu_bitsandbytes quantized linear in a torch adapter module."""
    return _wrapper_cls()(inner)
