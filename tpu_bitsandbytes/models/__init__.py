"""Model zoo: functional Llama-family (engine substrate) and module-based
GPT-2 (quantize_model surgery vehicle)."""

from . import llama, gpt2
from .layers import QLinear4, linear_apply, rms_norm, layer_norm, rope_table, \
    apply_rope, gqa_attention
from .llama import LlamaConfig
from .gpt2 import GPT2Config, GPT2LMHeadModel

__all__ = [
    "llama", "gpt2", "QLinear4", "linear_apply", "rms_norm", "layer_norm",
    "rope_table", "apply_rope", "gqa_attention", "LlamaConfig", "GPT2Config",
    "GPT2LMHeadModel",
]
