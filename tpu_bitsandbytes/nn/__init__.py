"""Quantized neural-network modules (L3 equivalent).

Pytree-native counterparts of the reference nn layer
(mps_bitsandbytes/nn/__init__.py:7-28).
"""

from .base import Module
from .linear import Linear, Embedding
from .linear4bit import Linear4bit, Params4bit
from .linear8bit import Linear8bit
from .linear_fp8 import LinearFP8
from .embedding import Embedding4bit, Embedding8bit, EmbeddingNF4, EmbeddingFP4
from .outlier_aware import OutlierAwareLinear
from .switchback import SwitchBackLinear, SwitchBackLinearCallback, switchback_matmul

__all__ = [
    "Module", "Linear", "Embedding",
    "Linear4bit", "Params4bit", "Linear8bit", "LinearFP8",
    "OutlierAwareLinear", "SwitchBackLinear", "SwitchBackLinearCallback",
    "switchback_matmul",
    "Embedding4bit", "Embedding8bit", "EmbeddingNF4", "EmbeddingFP4",
]
