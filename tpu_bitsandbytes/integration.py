"""Model-quantization API (L4) — BitsAndBytesConfig + model surgery.

TPU rebuild of the reference integration layer
(mps_bitsandbytes/integration.py:16-334). ``BitsAndBytesConfig`` keeps the
transformers-compatible field names and validation; the surgery walks a
:class:`tpu_bitsandbytes.nn.Module` tree (or any object exposing
``named_children``-style attributes) replacing Linear layers in place, with
the same substring-match skip-list semantics (:108-154).

Improvement over the reference: ``bnb_4bit_use_double_quant`` is actually
honored (the reference accepts but ignores it, integration.py:26-33).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax.numpy as jnp

from .nn import Linear, Linear4bit, Linear8bit
from .nn.base import Module

__all__ = [
    "BitsAndBytesConfig", "quantize_model",
    "replace_linear_with_4bit", "replace_linear_with_8bit",
    "get_memory_footprint", "patch_transformers", "unpatch_transformers",
]


@dataclass
class BitsAndBytesConfig:
    """Quantization config mirroring transformers' BitsAndBytesConfig
    (reference integration.py:16-105). Unused-on-TPU fields are accepted for
    drop-in compatibility."""

    load_in_8bit: bool = False
    load_in_4bit: bool = False
    llm_int8_threshold: float = 6.0
    llm_int8_skip_modules: Optional[list] = None
    llm_int8_enable_fp32_cpu_offload: bool = False
    llm_int8_has_fp16_weight: bool = False
    bnb_4bit_compute_dtype: Any = jnp.bfloat16
    bnb_4bit_quant_type: str = "nf4"
    bnb_4bit_use_double_quant: bool = False
    bnb_4bit_quant_storage: Any = jnp.uint8

    def __post_init__(self):
        if self.load_in_4bit and self.load_in_8bit:
            raise ValueError("Cannot load in both 4-bit and 8-bit")
        if self.bnb_4bit_quant_type not in ("nf4", "fp4"):
            raise ValueError(
                f"bnb_4bit_quant_type must be 'nf4' or 'fp4', "
                f"got {self.bnb_4bit_quant_type}")
        if self.llm_int8_skip_modules is None:
            self.llm_int8_skip_modules = []

    def to_dict(self) -> Dict[str, Any]:
        return {
            "load_in_8bit": self.load_in_8bit,
            "load_in_4bit": self.load_in_4bit,
            "llm_int8_threshold": self.llm_int8_threshold,
            "llm_int8_skip_modules": self.llm_int8_skip_modules,
            "bnb_4bit_compute_dtype": jnp.dtype(self.bnb_4bit_compute_dtype).name,
            "bnb_4bit_quant_type": self.bnb_4bit_quant_type,
            "bnb_4bit_use_double_quant": self.bnb_4bit_use_double_quant,
        }

    @classmethod
    def from_dict(cls, config_dict: Dict[str, Any]) -> "BitsAndBytesConfig":
        config_dict = dict(config_dict)
        if "bnb_4bit_compute_dtype" in config_dict:
            ds = config_dict["bnb_4bit_compute_dtype"]
            if isinstance(ds, str):
                if "bfloat16" in ds:
                    config_dict["bnb_4bit_compute_dtype"] = jnp.bfloat16
                elif "float16" in ds:
                    config_dict["bnb_4bit_compute_dtype"] = jnp.float16
                else:
                    config_dict["bnb_4bit_compute_dtype"] = jnp.bfloat16
        fields = cls.__dataclass_fields__
        return cls(**{k: v for k, v in config_dict.items() if k in fields})

    @property
    def is_quantizable(self) -> bool:
        return self.load_in_4bit or self.load_in_8bit

    @property
    def quantization_method(self) -> str:
        if self.load_in_4bit:
            return "bitsandbytes_4bit"
        if self.load_in_8bit:
            return "bitsandbytes_8bit"
        return "none"


def _walk_replace(model, convert_fn, should_convert, modules_to_not_convert,
                  current_key_name=None):
    """Recursive in-place replacement over Module attributes and lists."""
    for name in list(vars(model)):
        module = getattr(model, name)
        full_name = f"{current_key_name}.{name}" if current_key_name else name
        if isinstance(module, list):
            for i, item in enumerate(module):
                item_name = f"{full_name}.{i}"
                if should_convert(item):
                    if any(skip in item_name for skip in modules_to_not_convert):
                        continue
                    module[i] = convert_fn(item)
                elif isinstance(item, Module):
                    _walk_replace(item, convert_fn, should_convert,
                                  modules_to_not_convert, item_name)
        elif should_convert(module):
            if any(skip in full_name for skip in modules_to_not_convert):
                continue
            setattr(model, name, convert_fn(module))
        elif isinstance(module, Module):
            _walk_replace(module, convert_fn, should_convert,
                          modules_to_not_convert, full_name)
    return model


def _walk_replace_torch(model, convert_fn, should_convert,
                        modules_to_not_convert, current_key_name=None):
    """Recursive in-place replacement over a ``torch.nn.Module`` tree.

    The converted layer is a :mod:`nn.torch_compat` adapter (a real torch
    module, so ``setattr`` is legal), holding the JAX quantized linear.
    Same substring-match skip-list semantics as the Module walk.
    """
    for name, child in list(model.named_children()):
        full_name = (f"{current_key_name}.{name}" if current_key_name
                     else name)
        if should_convert(child):
            if any(skip in full_name for skip in modules_to_not_convert):
                continue
            setattr(model, name, convert_fn(child))
        else:
            _walk_replace_torch(child, convert_fn, should_convert,
                                modules_to_not_convert, full_name)
    return model


def _dispatch_walk(model, convert_fn, should_convert, modules_to_not_convert,
                   wrap_torch: bool):
    from .nn.torch_compat import is_torch_module, wrap_quantized
    if is_torch_module(model):
        import torch
        conv = ((lambda m: wrap_quantized(convert_fn(m))) if wrap_torch
                else convert_fn)
        return _walk_replace_torch(
            model, conv, lambda m: isinstance(m, torch.nn.Linear),
            modules_to_not_convert)
    return _walk_replace(model, convert_fn, should_convert,
                         modules_to_not_convert)


def replace_linear_with_4bit(model, quantization_config: BitsAndBytesConfig,
                             modules_to_not_convert: Optional[list] = None,
                             current_key_name: Optional[str] = None):
    """Replace every plain Linear with Linear4bit (reference :108-154).

    Accepts a :class:`tpu_bitsandbytes.nn.Module` tree or a
    ``torch.nn.Module`` tree — torch Linears become torch-adapter modules
    running the JAX quantized matmul (nn/torch_compat.py)."""
    if modules_to_not_convert is None:
        modules_to_not_convert = []

    def convert(m):
        return Linear4bit.from_linear(
            m,
            compute_dtype=quantization_config.bnb_4bit_compute_dtype,
            quant_type=quantization_config.bnb_4bit_quant_type,
            compress_statistics=quantization_config.bnb_4bit_use_double_quant,
        )

    return _dispatch_walk(model, convert, lambda m: isinstance(m, Linear),
                          modules_to_not_convert, wrap_torch=True)


def replace_linear_with_8bit(model, quantization_config: BitsAndBytesConfig,
                             modules_to_not_convert: Optional[list] = None,
                             current_key_name: Optional[str] = None):
    """Replace every plain Linear with Linear8bit (reference :157-196).
    Accepts Module or torch trees like :func:`replace_linear_with_4bit`."""
    if modules_to_not_convert is None:
        modules_to_not_convert = quantization_config.llm_int8_skip_modules or []
    return _dispatch_walk(model, Linear8bit.from_linear,
                          lambda m: isinstance(m, Linear),
                          modules_to_not_convert, wrap_torch=True)


def quantize_model(model, quantization_config: Optional[BitsAndBytesConfig] = None,
                   load_in_4bit: bool = False, load_in_8bit: bool = False,
                   device=None, compute_dtype=jnp.bfloat16,
                   modules_to_not_convert: Optional[list] = None):
    """Main entry: quantize a Module tree (reference :199-251)."""
    if quantization_config is None:
        quantization_config = BitsAndBytesConfig(
            load_in_4bit=load_in_4bit,
            load_in_8bit=load_in_8bit,
            bnb_4bit_compute_dtype=compute_dtype,
        )
    if quantization_config.load_in_4bit:
        model = replace_linear_with_4bit(model, quantization_config,
                                         modules_to_not_convert)
    elif quantization_config.load_in_8bit:
        model = replace_linear_with_8bit(model, quantization_config,
                                         modules_to_not_convert)
    if device is not None and isinstance(model, Module):
        model = model.to(device)
    return model


def get_memory_footprint(model) -> Dict[str, Any]:
    """Memory accounting over all array leaves (reference :254-287).

    Same formula as the reference: ``fp16_size_gb`` assumes every stored
    element (including packed bytes) were fp16, so savings reflect the
    storage-dtype win.
    """
    import jax
    from .nn.torch_compat import is_torch_module

    total_bytes = 0
    total_params = 0
    quantized_params = 0

    leaves = jax.tree_util.tree_leaves(model)
    if is_torch_module(model):
        # torch tree: count torch params directly (numel/element_size — no
        # numpy round-trip, bf16-safe) plus the JAX arrays inside
        # adapter-held quantized layers (nn/torch_compat.py)
        leaves = []
        for p in model.parameters():
            n = int(p.numel())
            total_params += n
            total_bytes += n * p.element_size()
        for m in model.modules():
            inner = getattr(m, "inner", None)
            if inner is not None:
                leaves.extend(v for v in vars(inner).values()
                              if hasattr(v, "dtype") and hasattr(v, "size"))

    for leaf in leaves:
        if not hasattr(leaf, "size") or not hasattr(leaf, "dtype"):
            continue
        n = int(leaf.size)
        total_params += n
        total_bytes += n * jnp.dtype(leaf.dtype).itemsize
        # Quantized storage is identified by dtype (packed nibbles / int8 /
        # fp8 codes all live in 1-byte arrays).
        if jnp.dtype(leaf.dtype) in (jnp.uint8, jnp.int8):
            quantized_params += n

    fp16_size = total_params * 2 / 1e9
    actual_size = total_bytes / 1e9
    return {
        "total_params": total_params,
        "quantized_params": quantized_params,
        "fp16_size_gb": fp16_size,
        "actual_size_gb": actual_size,
        "savings_gb": fp16_size - actual_size,
        "savings_pct": (1 - actual_size / fp16_size) * 100 if fp16_size > 0 else 0,
    }


# ---------------------------------------------------------------------------
# transformers auto-patch (reference integration.py:291-334 — shipped there
# but never enabled; here it is a working OPT-IN)
# ---------------------------------------------------------------------------

_ORIG_FROM_PRETRAINED = None


def patch_transformers() -> bool:
    """Opt-in: patch ``transformers.PreTrainedModel.from_pretrained`` so a
    call carrying a tpu-bitsandbytes :class:`BitsAndBytesConfig` loads the
    checkpoint full-precision and quantizes it through
    :func:`quantize_model` — the torch Linears become TPU-backed adapters
    (nn/torch_compat.py).

    The reference ships the same hook permanently disabled
    (mps_bitsandbytes/integration.py:331). Here it is functional but never
    applied automatically — call this explicitly; :func:`unpatch_transformers`
    restores the original. Returns False when transformers is unavailable.

    For production serving convert to the in-repo engine instead
    (``utils.hf.load_llama_from_pretrained`` + ``engine.DecodeEngine``); the
    patched path keeps HF's torch forward with per-layer TPU matmuls.
    """
    global _ORIG_FROM_PRETRAINED
    try:
        from transformers import modeling_utils
    except ImportError:
        return False
    if _ORIG_FROM_PRETRAINED is not None:
        return True                                   # already patched
    orig = modeling_utils.PreTrainedModel.from_pretrained.__func__

    @classmethod
    def _patched(cls, *args, **kwargs):
        qc = kwargs.get("quantization_config")
        if isinstance(qc, BitsAndBytesConfig) and qc.is_quantizable:
            kwargs = dict(kwargs)
            kwargs.pop("quantization_config", None)
            kwargs.pop("device_map", None)
            model = orig(cls, *args, **kwargs)
            return quantize_model(
                model, qc,
                modules_to_not_convert=list(qc.llm_int8_skip_modules or [])
                + ["lm_head"])
        return orig(cls, *args, **kwargs)

    modeling_utils.PreTrainedModel.from_pretrained = _patched
    _ORIG_FROM_PRETRAINED = orig
    return True


def unpatch_transformers() -> None:
    """Restore the original ``from_pretrained`` (no-op when not patched)."""
    global _ORIG_FROM_PRETRAINED
    if _ORIG_FROM_PRETRAINED is None:
        return
    from transformers import modeling_utils
    modeling_utils.PreTrainedModel.from_pretrained = classmethod(
        _ORIG_FROM_PRETRAINED)
    _ORIG_FROM_PRETRAINED = None
