"""tpu-bitsandbytes: TPU-native quantization framework (JAX / XLA / Pallas).

From-scratch TPU rebuild of the full mps-bitsandbytes capability surface
(reference: mps_bitsandbytes/__init__.py:48-230): NF4/FP4/INT8/FP8 quantization,
fused Pallas dequant-matmul kernels, quantized Linear/Embedding modules, 8-bit
and paged optimizers, sparse ops, HF-style integration — plus the scale-out
layer the reference lacks: tensor-sharded inference over TPU meshes with a
continuous-batching decode engine.
"""

__version__ = "0.1.0"

import jax as _jax

from .functional import (
    QuantState,
    quantize_4bit, dequantize_4bit, matmul_4bit,
    quantize_nf4, dequantize_nf4, matmul_nf4, create_normal_map,
    quantize_fp4, dequantize_fp4, matmul_fp4, create_fp4_map,
    quantize_blockwise, dequantize_blockwise,
    quantize_fp8_e4m3, dequantize_fp8_e4m3, matmul_fp8_e4m3,
    quantize_fp8_e5m2, dequantize_fp8_e5m2,
    quantize_rowwise, dequantize_rowwise, matmul_int8,
    quantize_colrow, dequantize_colrow, matmul_colrow,
    double_quant, dequant_absmax,
    spmm_coo, spmm_coo_int8, sparse_coo_from_dense, quantize_sparse_coo,
)
from .functional import has_fused_kernels as _has_fused


def __getattr__(name):
    # lazy codebook re-exports (device arrays — see functional.__getattr__:
    # importing them eagerly would initialize the XLA backend before
    # jax.distributed.initialize can run in multi-host processes)
    if name in ("NF4_CODEBOOK", "FP4_CODEBOOK"):
        from . import functional as _f
        return getattr(_f, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def is_available() -> bool:
    """True when a JAX backend usable for quantized ops is present."""
    try:
        return len(_jax.devices()) > 0
    except Exception:
        return False


def has_native_kernels() -> bool:
    """True when fused Pallas TPU kernels will run compiled (TPU backend).

    Parity with the reference's native-extension probe
    (mps_bitsandbytes/__init__.py:125-131).
    """
    return _has_fused()


from .nn import (  # noqa: E402
    Linear4bit, Linear8bit, LinearFP8,
    Embedding4bit, Embedding8bit, EmbeddingNF4, EmbeddingFP4,
    OutlierAwareLinear,
    SwitchBackLinear, SwitchBackLinearCallback,
    Params4bit,
)
from .optim import (  # noqa: E402
    Adam8bit, AdamW8bit, Lion8bit, SGD8bit,
    PagedAdam, PagedAdamW, PagedLion,
    quantize_state, dequantize_state,
    quantize_state_unsigned, dequantize_state_unsigned,
)
from .integration import (  # noqa: E402
    BitsAndBytesConfig,
    quantize_model,
    replace_linear_with_4bit,
    replace_linear_with_8bit,
    get_memory_footprint,
    patch_transformers,
    unpatch_transformers,
)

__all__ = [
    "__version__", "is_available", "has_native_kernels",
    "QuantState",
    "quantize_4bit", "dequantize_4bit", "matmul_4bit",
    "quantize_nf4", "dequantize_nf4", "matmul_nf4", "NF4_CODEBOOK",
    "create_normal_map",
    "quantize_fp4", "dequantize_fp4", "matmul_fp4", "FP4_CODEBOOK",
    "create_fp4_map",
    "quantize_blockwise", "dequantize_blockwise",
    "quantize_fp8_e4m3", "dequantize_fp8_e4m3", "matmul_fp8_e4m3",
    "quantize_fp8_e5m2", "dequantize_fp8_e5m2",
    "quantize_rowwise", "dequantize_rowwise", "matmul_int8",
    "quantize_colrow", "dequantize_colrow", "matmul_colrow",
    "double_quant", "dequant_absmax",
    "spmm_coo", "spmm_coo_int8", "sparse_coo_from_dense", "quantize_sparse_coo",
    "Linear4bit", "Linear8bit", "LinearFP8",
    "Embedding4bit", "Embedding8bit", "EmbeddingNF4", "EmbeddingFP4",
    "OutlierAwareLinear", "SwitchBackLinear", "SwitchBackLinearCallback",
    "Params4bit",
    "Adam8bit", "AdamW8bit", "Lion8bit", "SGD8bit",
    "PagedAdam", "PagedAdamW", "PagedLion",
    "quantize_state", "dequantize_state",
    "quantize_state_unsigned", "dequantize_state_unsigned",
    "BitsAndBytesConfig", "quantize_model",
    "replace_linear_with_4bit", "replace_linear_with_8bit",
    "get_memory_footprint", "patch_transformers", "unpatch_transformers",
]
