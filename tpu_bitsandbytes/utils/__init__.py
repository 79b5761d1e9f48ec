"""Utilities: checkpointing, metrics/roofline, HF conversion."""

from .checkpoint import save_checkpoint, load_checkpoint, load_quantized
from .metrics import (
    CHIP_SPECS, detect_chip, matmul4bit_bytes, matmul4bit_roofline_us,
    MetricsLogger, Timer, trace,
)
from .hf import (
    llama_config_from_hf, llama_params_from_state_dict,
    gpt2_params_from_state_dict, load_llama_from_pretrained,
)

__all__ = [
    "save_checkpoint", "load_checkpoint", "load_quantized",
    "CHIP_SPECS", "detect_chip", "matmul4bit_bytes",
    "matmul4bit_roofline_us", "MetricsLogger", "Timer", "trace",
    "llama_config_from_hf", "llama_params_from_state_dict",
    "gpt2_params_from_state_dict",
    "load_llama_from_pretrained",
]
