"""Pallas TPU kernels (L1 equivalent of the reference's Metal kernel layer)."""

from .matmul4bit import fused_matmul_4bit
from .w4a8 import w4a8_matmul_4bit

__all__ = ["fused_matmul_4bit", "w4a8_matmul_4bit"]
