"""HuggingFace checkpoint conversion (local files — no network required).

Maps a transformers Llama/GPT-2 ``state_dict`` (torch tensors or numpy
arrays) onto this framework's param trees, optionally quantizing to NF4 on
the fly — the TPU analog of the reference's ``quantize_model`` over an HF
torch model (integration.py:199-251 + demo/chat.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..models import llama


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach()
        if hasattr(t, "cpu"):
            t = t.cpu()
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def llama_config_from_hf(hf_config) -> llama.LlamaConfig:
    """Build LlamaConfig from a transformers Llama/Qwen2 config-like
    object/dict. Qwen2 (the reference demo's family, demo/chat.py) maps onto
    the same architecture with ``attention_bias=True``."""
    get = (hf_config.get if isinstance(hf_config, dict)
           else lambda k, d=None: getattr(hf_config, k, d))
    attention_bias = get("attention_bias")
    if attention_bias is None:
        # Qwen2's HF config has no attention_bias field — the family always
        # carries q/k/v biases.
        attention_bias = get("model_type") in ("qwen2", "qwen2_moe",
                                               "phi")
    # Mistral-style sliding window. Qwen2 configs carry a sliding_window
    # value but gate it behind use_sliding_window (default False); when
    # enabled, only layers >= max_window_layers are windowed — transformers
    # exposes this as per-layer ``layer_types``, which maps directly onto
    # sliding_window_layers.
    sliding_window = get("sliding_window")
    sliding_window_layers = None
    if sliding_window is not None and get("use_sliding_window") is False:
        sliding_window = None
    layer_types = get("layer_types")
    if sliding_window is not None and layer_types:
        sliding_window_layers = tuple(
            t == "sliding_attention" for t in layer_types)
        if not any(sliding_window_layers):
            sliding_window = sliding_window_layers = None
    # RoPE scaling (Llama-3.1 "llama3" band scaling, "linear" position
    # interpolation). transformers uses "rope_type" (legacy "type").
    rs = get("rope_scaling")
    rope_scaling = None
    if rs:
        rs_get = rs.get if isinstance(rs, dict) else lambda k, d=None: getattr(rs, k, d)
        kind = rs_get("rope_type") or rs_get("type")
        if kind == "llama3":
            rope_scaling = ("llama3", rs_get("factor"),
                            rs_get("low_freq_factor"),
                            rs_get("high_freq_factor"),
                            rs_get("original_max_position_embeddings"))
        elif kind == "linear":
            rope_scaling = ("linear", rs_get("factor"))
        elif kind in (None, "default"):
            rope_scaling = None
        else:
            raise ValueError(f"unsupported rope_scaling type: {kind!r}")
    # Gemma: gelu MLP (hidden_activation supersedes hidden_act in newer HF
    # configs), (1+w) RMSNorm, sqrt(hidden)-scaled embeddings, always-tied.
    # Gemma2 adds sandwich norms, logit softcapping, a fixed attention
    # scale, and an every-other-layer sliding window.
    gemma2 = get("model_type") == "gemma2"
    gemma = get("model_type") == "gemma" or gemma2
    hidden_act = get("hidden_activation") or get("hidden_act") or "silu"
    if hidden_act == "silu" and gemma:
        hidden_act = "gelu_pytorch_tanh"
    if gemma2 and sliding_window is None:
        sliding_window = get("sliding_window")
    phi = get("model_type") == "phi"
    stablelm = get("model_type") == "stablelm"
    qwen2_moe = get("model_type") == "qwen2_moe"
    num_experts = (get("num_experts") if qwen2_moe
                   else get("num_local_experts")) or 0
    return llama.LlamaConfig(
        vocab_size=get("vocab_size"),
        hidden_size=get("hidden_size"),
        intermediate_size=get("intermediate_size"),
        num_layers=get("num_hidden_layers"),
        num_heads=get("num_attention_heads"),
        num_kv_heads=get("num_key_value_heads",
                         get("num_attention_heads")),
        head_dim=get("head_dim"),
        rope_theta=get("rope_theta", 10000.0),
        rms_eps=(get("layer_norm_eps") or get("rms_norm_eps") or 1e-5),
        max_seq_len=get("max_position_embeddings", 2048),
        tie_embeddings=bool(get("tie_word_embeddings", False) or gemma),
        attention_bias=bool(attention_bias),
        sliding_window=sliding_window,
        rope_scaling=rope_scaling,
        hidden_act=("silu" if hidden_act == "silu" else
                    {"gelu_pytorch_tanh": "gelu_tanh",
                     "gelu_tanh": "gelu_tanh",
                     "gelu_new": "gelu_tanh",    # tanh approximation
                     "gelu": "gelu"}[hidden_act]),
        rms_weight_offset=1.0 if gemma else 0.0,
        scale_embeddings=gemma,
        post_norms=gemma2,
        attn_logit_softcap=get("attn_logit_softcapping") if gemma2 else None,
        final_logit_softcap=(get("final_logit_softcapping")
                             if gemma2 else None),
        query_pre_attn_scalar=(float(get("query_pre_attn_scalar"))
                               if gemma2 else None),
        sliding_window_pattern=(
            2 if (gemma2 and sliding_window_layers is None) else None),
        sliding_window_layers=sliding_window_layers,
        num_experts=num_experts,
        experts_per_token=get("num_experts_per_tok", 2) or 2,
        moe_intermediate_size=get("moe_intermediate_size"),
        moe_norm_topk=bool(get("norm_topk_prob", True)
                           if qwen2_moe else True),
        moe_shared_expert_size=(get("shared_expert_intermediate_size")
                                if qwen2_moe else None),
        norm_type="layernorm" if (phi or stablelm) else "rms",
        parallel_blocks=phi,
        gated_mlp=not phi,
        rope_partial_factor=float(get("partial_rotary_factor", 1.0) or 1.0),
    )


def llama_params_from_state_dict(state_dict: Dict[str, Any],
                                 config: llama.LlamaConfig,
                                 dtype=jnp.bfloat16,
                                 quantize: bool = False,
                                 blocksize: int = 64,
                                 quant_type: str = "nf4",
                                 compress_statistics: bool = False) -> dict:
    """Convert an HF Llama state_dict to a functional param tree.

    With ``quantize=True``, each projection is quantized layer-by-layer as it
    is converted, so peak host/device memory stays ~1 layer of fp weights
    above the packed size.
    """
    from ..models.layers import QLinear4

    def grab(name):
        for prefix in ("model.", ""):
            key = prefix + name
            if key in state_dict:
                return _np(state_dict[key])
        raise KeyError(name)

    def lin(name):
        """Linear leaf from ``<name>.weight`` (+ optional ``<name>.bias``,
        e.g. Qwen2 q/k/v): quantized → QLinear4 with bias; fp → raw array
        or {'w','b'} dict."""
        w = jnp.asarray(grab(name + ".weight"))
        try:
            b = jnp.asarray(grab(name + ".bias")).astype(dtype)
        except KeyError:
            b = None
        if quantize:
            return QLinear4.quantize(
                w.astype(jnp.float32), blocksize=blocksize,
                quant_type=quant_type, dtype=dtype, bias=b,
                compress_statistics=compress_statistics)
        w = w.astype(dtype)
        return w if b is None else {"w": w, "b": b}

    def norm(name):
        """Norm leaf: {'w','b'} dict for LayerNorm models, plain weight
        array for RMSNorm models."""
        w = jnp.asarray(grab(name + ".weight")).astype(dtype)
        if config.norm_type == "layernorm":
            return {"w": w,
                    "b": jnp.asarray(grab(name + ".bias")).astype(dtype)}
        return w

    def lin_split(name, sizes, parts):
        """Split a checkpoint-fused weight (Phi-3 qkv_proj / gate_up_proj)
        into separate leaves along dim 0, quantizing each part."""
        w = jnp.asarray(grab(name + ".weight"))
        offs = np.cumsum([0] + sizes)
        out = {}
        for part, a, b in zip(parts, offs[:-1], offs[1:]):
            wp = w[a:b]
            if quantize:
                out[part] = QLinear4.quantize(
                    wp.astype(jnp.float32), blocksize=blocksize,
                    quant_type=quant_type, dtype=dtype,
                    compress_statistics=compress_statistics)
            else:
                out[part] = wp.astype(dtype)
        return out

    nq = config.num_heads * config.hd
    nkv = config.num_kv_heads * config.hd
    layers = []
    for li in range(config.num_layers):
        p = f"layers.{li}."
        if "model.layers.%d.self_attn.qkv_proj.weight" % li in state_dict \
                or f"layers.{li}.self_attn.qkv_proj.weight" in state_dict:
            # Phi-3 layout: fused qkv (q;k;v rows) + fused gate_up
            entry = lin_split(p + "self_attn.qkv_proj", [nq, nkv, nkv],
                              ["q_proj", "k_proj", "v_proj"])
        else:
            entry = {
                "q_proj": lin(p + "self_attn.q_proj"),
                "k_proj": lin(p + "self_attn.k_proj"),
                "v_proj": lin(p + "self_attn.v_proj"),
            }
        if config.parallel_blocks:      # Phi: dense attn, one shared norm
            entry.update({
                "o_proj": lin(p + "self_attn.dense"),
                "input_norm": norm(p + "input_layernorm"),
            })
        else:
            entry.update({
                "o_proj": lin(p + "self_attn.o_proj"),
                "input_norm": norm(p + "input_layernorm"),
                "post_attn_norm": norm(p + "post_attention_layernorm"),
            })
        if config.num_experts > 0 and (
                f"model.layers.{li}.block_sparse_moe.gate.weight"
                in state_dict
                or f"layers.{li}.block_sparse_moe.gate.weight"
                in state_dict):
            # Mixtral block_sparse_moe: w1=gate, w3=up, w2=down
            mp = p + "block_sparse_moe."
            entry["moe"] = {
                "router": jnp.asarray(
                    grab(mp + "gate.weight")).astype(jnp.float32),
                "experts": [
                    {"gate_proj": lin(mp + f"experts.{e}.w1"),
                     "up_proj": lin(mp + f"experts.{e}.w3"),
                     "down_proj": lin(mp + f"experts.{e}.w2")}
                    for e in range(config.num_experts)],
            }
        elif config.num_experts > 0 and (
                f"model.layers.{li}.mlp.experts.0.gate_proj.weight"
                in state_dict
                or f"layers.{li}.mlp.experts.0.gate_proj.weight"
                in state_dict):
            # Qwen2-MoE: mlp.gate router + mlp.experts.N + sigmoid-gated
            # shared expert. Layers without expert keys (mlp_only_layers /
            # decoder_sparse_step) fall through to the dense branch below —
            # dense-vs-sparse is per layer in the param tree.
            mp = p + "mlp."
            entry["moe"] = {
                "router": jnp.asarray(
                    grab(mp + "gate.weight")).astype(jnp.float32),
                "experts": [
                    {"gate_proj": lin(mp + f"experts.{e}.gate_proj"),
                     "up_proj": lin(mp + f"experts.{e}.up_proj"),
                     "down_proj": lin(mp + f"experts.{e}.down_proj")}
                    for e in range(config.num_experts)],
                "shared_expert": {
                    "gate_proj": lin(mp + "shared_expert.gate_proj"),
                    "up_proj": lin(mp + "shared_expert.up_proj"),
                    "down_proj": lin(mp + "shared_expert.down_proj")},
                "shared_gate": jnp.asarray(
                    grab(mp + "shared_expert_gate.weight")
                    ).astype(jnp.float32),
            }
        elif (f"model.layers.{li}.mlp.gate_up_proj.weight" in state_dict
              or f"layers.{li}.mlp.gate_up_proj.weight" in state_dict):
            entry.update(lin_split(p + "mlp.gate_up_proj",
                                   [config.intermediate_size,
                                    config.intermediate_size],
                                   ["gate_proj", "up_proj"]))
            entry["down_proj"] = lin(p + "mlp.down_proj")
        elif not config.gated_mlp:      # Phi: fc1/fc2
            entry["up_proj"] = lin(p + "mlp.fc1")
            entry["down_proj"] = lin(p + "mlp.fc2")
        else:
            entry["gate_proj"] = lin(p + "mlp.gate_proj")
            entry["up_proj"] = lin(p + "mlp.up_proj")
            entry["down_proj"] = lin(p + "mlp.down_proj")
        layers.append(entry)
        if config.post_norms:       # Gemma2 sandwich norms
            layers[-1]["pre_ffn_norm"] = jnp.asarray(grab(
                p + "pre_feedforward_layernorm.weight")).astype(dtype)
            layers[-1]["post_ffn_norm"] = jnp.asarray(grab(
                p + "post_feedforward_layernorm.weight")).astype(dtype)
    params = {
        "embed": jnp.asarray(grab("embed_tokens.weight")).astype(dtype),
        "layers": layers,
    }
    try:
        params["final_norm"] = norm("norm")
    except KeyError:
        params["final_norm"] = norm("final_layernorm")      # Phi
    if not config.tie_embeddings:
        try:
            params["lm_head"] = lin("lm_head")
        except KeyError:
            pass  # tied
    return params


def gpt2_params_from_state_dict(state_dict: Dict[str, Any], config,
                                dtype=jnp.bfloat16):
    """Load an HF GPT-2 state_dict into a GPT2LMHeadModel module tree.

    HF GPT-2 stores Conv1D weights transposed ([in, out]); this transposes
    them back into Linear convention ([out, in]).
    """
    import jax
    from ..models.gpt2 import GPT2LMHeadModel

    def grab(name):
        for prefix in ("transformer.", ""):
            key = prefix + name
            if key in state_dict:
                return _np(state_dict[key])
        raise KeyError(name)

    model = GPT2LMHeadModel(config, jax.random.PRNGKey(0))
    model.wte.weight = jnp.asarray(grab("wte.weight")).astype(dtype)
    model.wpe.weight = jnp.asarray(grab("wpe.weight")).astype(dtype)
    for li, block in enumerate(model.h):
        p = f"h.{li}."
        block.ln_1.weight = jnp.asarray(grab(p + "ln_1.weight")).astype(dtype)
        block.ln_1.bias = jnp.asarray(grab(p + "ln_1.bias")).astype(dtype)
        block.ln_2.weight = jnp.asarray(grab(p + "ln_2.weight")).astype(dtype)
        block.ln_2.bias = jnp.asarray(grab(p + "ln_2.bias")).astype(dtype)
        block.attn.c_attn.weight = jnp.asarray(
            grab(p + "attn.c_attn.weight")).T.astype(dtype)
        block.attn.c_attn.bias = jnp.asarray(
            grab(p + "attn.c_attn.bias")).astype(dtype)
        block.attn.c_proj.weight = jnp.asarray(
            grab(p + "attn.c_proj.weight")).T.astype(dtype)
        block.attn.c_proj.bias = jnp.asarray(
            grab(p + "attn.c_proj.bias")).astype(dtype)
        block.mlp.c_fc.weight = jnp.asarray(
            grab(p + "mlp.c_fc.weight")).T.astype(dtype)
        block.mlp.c_fc.bias = jnp.asarray(
            grab(p + "mlp.c_fc.bias")).astype(dtype)
        block.mlp.c_proj.weight = jnp.asarray(
            grab(p + "mlp.c_proj.weight")).T.astype(dtype)
        block.mlp.c_proj.bias = jnp.asarray(
            grab(p + "mlp.c_proj.bias")).astype(dtype)
    model.ln_f.weight = jnp.asarray(grab("ln_f.weight")).astype(dtype)
    model.ln_f.bias = jnp.asarray(grab("ln_f.bias")).astype(dtype)
    # GPT-2 ties lm_head to wte
    if "lm_head.weight" in state_dict:
        model.lm_head.weight = jnp.asarray(
            _np(state_dict["lm_head.weight"])).astype(dtype)
    else:
        model.lm_head.weight = model.wte.weight
    return model


def load_llama_from_pretrained(path_or_model, dtype=jnp.bfloat16,
                               quantize: bool = True, blocksize: int = 64,
                               quant_type: str = "nf4",
                               compress_statistics: bool = False):
    """Load a local HF Llama checkpoint (directory or model object) into a
    (config, params) pair, quantizing by default."""
    if isinstance(path_or_model, str):
        import transformers
        model = transformers.AutoModelForCausalLM.from_pretrained(
            path_or_model, torch_dtype="float32", local_files_only=True)
    else:
        model = path_or_model
    config = llama_config_from_hf(model.config)
    params = llama_params_from_state_dict(
        model.state_dict(), config, dtype=dtype, quantize=quantize,
        blocksize=blocksize, quant_type=quant_type,
        compress_statistics=compress_statistics)
    return config, params
