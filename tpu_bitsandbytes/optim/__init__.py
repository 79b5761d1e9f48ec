"""8-bit and paged optimizers (parity: mps_bitsandbytes/optim/__init__.py:10-32).

Two API styles:
* optax-style transforms (``transforms.adam8bit(...)``) — the TPU-native way,
  composable with any JAX training loop;
* torch-like classes (``Adam8bit(params, lr=...)``) mirroring the reference.
"""

from .state8bit import (
    quantize_state, dequantize_state,
    quantize_state_unsigned, dequantize_state_unsigned,
)
from .transforms import adam8bit, adamw8bit, lion8bit, sgd8bit
from .wrappers import Adam8bit, AdamW8bit, Lion8bit, SGD8bit, clip_by_global_norm
from .paged import PagedAdam, PagedAdamW, PagedLion

__all__ = [
    "quantize_state", "dequantize_state",
    "quantize_state_unsigned", "dequantize_state_unsigned",
    "adam8bit", "adamw8bit", "lion8bit", "sgd8bit",
    "Adam8bit", "AdamW8bit", "Lion8bit", "SGD8bit",
    "PagedAdam", "PagedAdamW", "PagedLion",
    "clip_by_global_norm",
]
