"""Llama-family model — functional, quantizable, engine-ready.

The flagship model for the NF4 decode engine (BASELINE.json configs 3-5).
Parameters are a plain pytree: per-layer dicts whose linear leaves are either
raw arrays (fp path) or :class:`QLinear4` (quantized). Forward supports both
full prefill and single-token decode against a KV cache supplied by the
engine (tpu_bitsandbytes/engine).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    QLinear4,
    apply_rope,
    gqa_attention,
    gqa_attention_hm,
    gqa_attention_kv_quant,
    linear_apply,
    rms_norm,
    rope_table,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    max_seq_len: int = 2048
    dtype: Any = jnp.bfloat16
    tie_embeddings: bool = False
    # Qwen2-style attention: q/k/v projections carry biases (the reference's
    # demo model, Qwen2.5 — demo/chat.py). Bias-ness is ultimately a property
    # of the param tree (dict {'w','b'} or QLinear4.bias leaves); this flag
    # drives init_params and documents the family.
    attention_bias: bool = False
    # Mistral-style sliding-window attention: each query attends to the last
    # ``sliding_window`` positions only. None = full causal (Llama/Qwen2).
    sliding_window: Optional[int] = None
    # RoPE frequency scaling (hashable; see layers.rope_table):
    # ("linear", factor) or Llama-3.1's
    # ("llama3", factor, low_freq_factor, high_freq_factor, orig_max_pos).
    rope_scaling: Optional[Tuple] = None
    # Gemma-family knobs: "gelu_tanh" MLP activation, zero-centered RMSNorm
    # weights multiplied as (1 + w), and sqrt(hidden_size)-scaled embeddings.
    hidden_act: str = "silu"
    rms_weight_offset: float = 0.0
    scale_embeddings: bool = False
    # Gemma2 knobs: sandwich norms (post_attn/post_ffn norms applied to the
    # block OUTPUT before the residual add, plus a pre_ffn_norm), logit
    # soft-capping, a fixed attention scale, and an alternating
    # sliding-window pattern (layers with li % pattern == pattern-1 attend
    # globally; the rest use sliding_window).
    post_norms: bool = False
    attn_logit_softcap: Optional[float] = None
    final_logit_softcap: Optional[float] = None
    query_pre_attn_scalar: Optional[float] = None
    sliding_window_pattern: Optional[int] = None
    # Explicit per-layer windowing (hashable bool tuple, len == num_layers):
    # True = sliding, False = full. Takes precedence over the pattern —
    # e.g. Qwen2's use_sliding_window windows only layers >=
    # max_window_layers (HF layer_types maps directly onto this).
    sliding_window_layers: Optional[Tuple[bool, ...]] = None
    # Mixtral-style sparse MoE MLP: num_experts > 0 replaces the dense
    # gate/up/down MLP with a router + per-expert SwiGLU experts;
    # experts_per_token = top-k routing (softmax over all experts).
    num_experts: int = 0
    experts_per_token: int = 2
    # Qwen2-MoE knobs: expert intermediate size (defaults to
    # intermediate_size), whether top-k weights are renormalized (Mixtral
    # True, Qwen2-MoE False), and a shared expert of its own intermediate
    # size gated by sigmoid(shared_gate(x)). Dense-vs-sparse per layer is a
    # property of the param tree (conversion maps HF mlp_only_layers /
    # decoder_sparse_step directly).
    moe_intermediate_size: Optional[int] = None
    moe_norm_topk: bool = True
    moe_shared_expert_size: Optional[int] = None
    # Phi/StableLM/NeoX-style knobs: LayerNorm (weight+bias dict leaves)
    # instead of RMSNorm; parallel residual (attention and MLP both read
    # the SAME input_norm output: x = x + attn(h) + mlp(h)); non-gated MLP
    # (up -> act -> down, no gate); partial rotary (rope on the first
    # head_dim * rope_partial_factor dims only).
    norm_type: str = "rms"
    parallel_blocks: bool = False
    gated_mlp: bool = True
    rope_partial_factor: float = 1.0

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.hd * self.rope_partial_factor)

    # ---- canned sizes ---------------------------------------------------
    @staticmethod
    def tiny() -> "LlamaConfig":
        return LlamaConfig(vocab_size=512, hidden_size=128,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=2, max_seq_len=128)

    @staticmethod
    def llama2_7b() -> "LlamaConfig":
        return LlamaConfig()  # defaults are 7B

    @staticmethod
    def llama2_13b() -> "LlamaConfig":
        return LlamaConfig(hidden_size=5120, intermediate_size=13824,
                           num_layers=40, num_heads=40, num_kv_heads=40)

    @staticmethod
    def llama2_70b() -> "LlamaConfig":
        return LlamaConfig(hidden_size=8192, intermediate_size=28672,
                           num_layers=80, num_heads=64, num_kv_heads=8)

    # Qwen2 family (the reference demo's model class — demo/chat.py uses
    # Qwen2.5-0.5B-Instruct): GQA + attention biases + tied embeddings on
    # the small sizes, high rope_theta.
    @staticmethod
    def tiny_qwen2() -> "LlamaConfig":
        return LlamaConfig(vocab_size=512, hidden_size=128,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=2, max_seq_len=128,
                           rope_theta=1000000.0, attention_bias=True,
                           tie_embeddings=True)

    @staticmethod
    def qwen2_5_0_5b() -> "LlamaConfig":
        return LlamaConfig(vocab_size=151936, hidden_size=896,
                           intermediate_size=4864, num_layers=24,
                           num_heads=14, num_kv_heads=2,
                           rope_theta=1000000.0, rms_eps=1e-6,
                           max_seq_len=32768, attention_bias=True,
                           tie_embeddings=True)

    # Gemma family: gelu MLP, (1+w) RMSNorm, scaled + tied embeddings,
    # explicit head_dim.
    @staticmethod
    def tiny_gemma() -> "LlamaConfig":
        return LlamaConfig(vocab_size=512, hidden_size=128,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=1, head_dim=32, max_seq_len=128,
                           rms_eps=1e-6, tie_embeddings=True,
                           hidden_act="gelu_tanh", rms_weight_offset=1.0,
                           scale_embeddings=True)

    @staticmethod
    def gemma_2b() -> "LlamaConfig":
        return LlamaConfig(vocab_size=256000, hidden_size=2048,
                           intermediate_size=16384, num_layers=18,
                           num_heads=8, num_kv_heads=1, head_dim=256,
                           max_seq_len=8192, rms_eps=1e-6,
                           tie_embeddings=True, hidden_act="gelu_tanh",
                           rms_weight_offset=1.0, scale_embeddings=True)

    @staticmethod
    def gemma_7b() -> "LlamaConfig":
        return LlamaConfig(vocab_size=256000, hidden_size=3072,
                           intermediate_size=24576, num_layers=28,
                           num_heads=16, num_kv_heads=16, head_dim=256,
                           max_seq_len=8192, rms_eps=1e-6,
                           tie_embeddings=True, hidden_act="gelu_tanh",
                           rms_weight_offset=1.0, scale_embeddings=True)

    # Gemma2: sandwich norms + softcapping + alternating sliding window.
    @staticmethod
    def tiny_gemma2() -> "LlamaConfig":
        return LlamaConfig(vocab_size=512, hidden_size=128,
                           intermediate_size=256, num_layers=4, num_heads=4,
                           num_kv_heads=2, head_dim=32, max_seq_len=128,
                           rms_eps=1e-6, tie_embeddings=True,
                           hidden_act="gelu_tanh", rms_weight_offset=1.0,
                           scale_embeddings=True, post_norms=True,
                           attn_logit_softcap=50.0, final_logit_softcap=30.0,
                           query_pre_attn_scalar=32.0, sliding_window=16,
                           sliding_window_pattern=2)

    @staticmethod
    def gemma2_9b() -> "LlamaConfig":
        return LlamaConfig(vocab_size=256000, hidden_size=3584,
                           intermediate_size=14336, num_layers=42,
                           num_heads=16, num_kv_heads=8, head_dim=256,
                           max_seq_len=8192, rms_eps=1e-6,
                           tie_embeddings=True, hidden_act="gelu_tanh",
                           rms_weight_offset=1.0, scale_embeddings=True,
                           post_norms=True, attn_logit_softcap=50.0,
                           final_logit_softcap=30.0,
                           query_pre_attn_scalar=256.0, sliding_window=4096,
                           sliding_window_pattern=2)

    # Mixtral: Mistral trunk + sparse MoE MLP (8 experts, top-2).
    @staticmethod
    def tiny_mixtral() -> "LlamaConfig":
        return LlamaConfig(vocab_size=512, hidden_size=128,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=2, max_seq_len=128,
                           num_experts=4, experts_per_token=2)

    @staticmethod
    def mixtral_8x7b() -> "LlamaConfig":
        return LlamaConfig(vocab_size=32000, hidden_size=4096,
                           intermediate_size=14336, num_layers=32,
                           num_heads=32, num_kv_heads=8,
                           max_seq_len=32768, rope_theta=1000000.0,
                           num_experts=8, experts_per_token=2)

    # Qwen2-MoE: Qwen2 trunk + sparse MoE with a sigmoid-gated shared
    # expert and UN-renormalized top-k routing.
    @staticmethod
    def tiny_qwen2_moe() -> "LlamaConfig":
        return LlamaConfig(vocab_size=512, hidden_size=128,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=2, max_seq_len=128,
                           rope_theta=1000000.0, attention_bias=True,
                           num_experts=4, experts_per_token=2,
                           moe_intermediate_size=96, moe_norm_topk=False,
                           moe_shared_expert_size=160)

    # Phi-2: LayerNorm, parallel attn+MLP sharing one norm, partial
    # rotary, non-gated gelu MLP, biases everywhere (incl. lm_head).
    @staticmethod
    def tiny_phi2() -> "LlamaConfig":
        return LlamaConfig(vocab_size=512, hidden_size=128,
                           intermediate_size=512, num_layers=2, num_heads=4,
                           num_kv_heads=4, max_seq_len=128,
                           norm_type="layernorm", parallel_blocks=True,
                           gated_mlp=False, hidden_act="gelu_tanh",
                           rope_partial_factor=0.5, attention_bias=True)

    # StableLM-2: Llama trunk + LayerNorm + partial rotary.
    @staticmethod
    def tiny_stablelm() -> "LlamaConfig":
        return LlamaConfig(vocab_size=512, hidden_size=128,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=2, max_seq_len=128,
                           norm_type="layernorm", rope_partial_factor=0.25)

    # Mistral family: Llama trunk + sliding-window attention.
    @staticmethod
    def tiny_mistral() -> "LlamaConfig":
        return LlamaConfig(vocab_size=512, hidden_size=128,
                           intermediate_size=256, num_layers=2, num_heads=4,
                           num_kv_heads=2, max_seq_len=128,
                           sliding_window=16)

    @staticmethod
    def mistral_7b() -> "LlamaConfig":
        return LlamaConfig(vocab_size=32000, hidden_size=4096,
                           intermediate_size=14336, num_layers=32,
                           num_heads=32, num_kv_heads=8,
                           max_seq_len=32768, sliding_window=4096,
                           rms_eps=1e-5, rope_theta=10000.0)

    @staticmethod
    def qwen2_5_7b() -> "LlamaConfig":
        return LlamaConfig(vocab_size=152064, hidden_size=3584,
                           intermediate_size=18944, num_layers=28,
                           num_heads=28, num_kv_heads=4,
                           rope_theta=1000000.0, rms_eps=1e-6,
                           max_seq_len=32768, attention_bias=True)


_LINEAR_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj")


def _norm(x, leaf, config: LlamaConfig):
    """Config-dispatched normalization: RMSNorm over a weight-array leaf, or
    LayerNorm over a {'w','b'} dict leaf (Phi/StableLM)."""
    from .layers import layer_norm
    if config.norm_type == "layernorm":
        return layer_norm(x, leaf["w"], leaf["b"], config.rms_eps)
    return rms_norm(x, leaf, config.rms_eps, config.rms_weight_offset)


def _act(config: LlamaConfig):
    if config.hidden_act == "silu":
        return jax.nn.silu
    if config.hidden_act in ("gelu_tanh", "gelu_pytorch_tanh"):
        return partial(jax.nn.gelu, approximate=True)
    if config.hidden_act == "gelu":
        return partial(jax.nn.gelu, approximate=False)
    raise ValueError(f"unknown hidden_act: {config.hidden_act!r}")


def _moe_mlp(moe, x, config: LlamaConfig,
             wrap=lambda w, row=False: w,
             reduce_fn=lambda t, w: t):
    """Mixtral sparse-MoE MLP (dense formulation, TPU-friendly shapes).

    Router: softmax over ALL experts -> top-k -> renormalize (the HF Mixtral
    convention). Every expert runs on every token and is masked by its
    routing weight — on TPU the masked-dense form keeps the MXU busy with
    static shapes instead of data-dependent gather/scatter dispatch; at
    decode batch sizes the expert matmuls are HBM-bound streams of the
    (quantized) expert weights either way. Row-parallel expert outputs are
    summed across experts BEFORE the single tp reduction (one psum per
    layer, not per expert).
    """
    router = moe["router"]
    logits = (x.astype(jnp.float32)
              @ router.T.astype(jnp.float32))           # [B, S, E]
    probs = jax.nn.softmax(logits, axis=-1)
    k = config.experts_per_token
    topv, topi = jax.lax.top_k(probs, k)                # [B, S, k]
    if config.moe_norm_topk:            # Mixtral renormalizes; Qwen2-MoE not
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    onehot = jax.nn.one_hot(topi, config.num_experts,
                            dtype=probs.dtype)          # [B, S, k, E]
    w = jnp.sum(topv[..., None] * onehot, axis=-2)      # [B, S, E]
    act = _act(config)

    def run_expert(exp):
        if "gateup_proj" in exp:        # fused layout (quantize_params)
            gate, up = jnp.split(linear_apply(wrap(exp["gateup_proj"]), x),
                                 2, axis=-1)
        else:
            gate = linear_apply(wrap(exp["gate_proj"]), x)
            up = linear_apply(wrap(exp["up_proj"]), x)
        return linear_apply(wrap(exp["down_proj"], row=True),
                            act(gate) * up)

    partial = None
    for e, exp in enumerate(moe["experts"]):
        d = run_expert(exp) * w[..., e:e + 1].astype(x.dtype)
        partial = d if partial is None else partial + d
    if "shared_expert" in moe:          # Qwen2-MoE: sigmoid-gated dense path
        g = jax.nn.sigmoid(
            x.astype(jnp.float32)
            @ moe["shared_gate"].T.astype(jnp.float32))  # [B, S, 1]
        # g is computed from replicated x/gate, so it commutes with the
        # row-parallel psum: scale the partial before the one reduction
        partial = partial + run_expert(moe["shared_expert"]) * g.astype(
            x.dtype)
    return reduce_fn(partial, None)     # experts carry no biases


def _embed_tokens(params, tokens, config: LlamaConfig):
    x = jnp.take(params["embed"], tokens, axis=0).astype(config.dtype)
    if config.scale_embeddings:                       # Gemma: sqrt(H) in dtype
        x = x * jnp.asarray(config.hidden_size ** 0.5, config.dtype)
    return x


def _layer_window(config: LlamaConfig, li: int):
    """Per-layer attention window. Precedence: the explicit
    ``sliding_window_layers`` bool tuple (HF layer_types), then the Gemma2
    pattern (layers with li % pattern == pattern-1 global), then
    all-layers-windowed."""
    if config.sliding_window is None:
        return None
    if config.sliding_window_layers is not None:
        return (config.sliding_window
                if config.sliding_window_layers[li] else None)
    p = config.sliding_window_pattern
    if p is None:
        return config.sliding_window
    return None if (li % p == p - 1) else config.sliding_window


def _attn_scale(config: LlamaConfig):
    if config.query_pre_attn_scalar is not None:
        return config.query_pre_attn_scalar ** -0.5
    return None                                  # default 1/sqrt(head_dim)


def finish_logits(logits, config: LlamaConfig):
    """fp32 cast + Gemma2 final-logit soft-capping — the one place the lm
    logits epilogue lives (head_logits and both TP shard_map paths, which
    must apply it AFTER the lm_head all_gather, share it)."""
    logits = logits.astype(jnp.float32)
    cap = config.final_logit_softcap
    if cap is not None:
        logits = cap * jnp.tanh(logits / cap)
    return logits


def head_logits(params, x, config: LlamaConfig):
    """LM head (tied or separate) + final-logit epilogue.
    x [..., H] -> fp32 logits [..., V]."""
    head = params.get("lm_head", None)
    if head is None:
        logits = x @ params["embed"].T.astype(x.dtype)
    else:
        logits = linear_apply(head, x)
    return finish_logits(logits, config)


def init_params(key: jax.Array, config: LlamaConfig,
                dtype=None) -> Params:
    """Random-init full-precision params (for benches and tests)."""
    dtype = dtype or config.dtype
    h, hd = config.hidden_size, config.hd
    n_q = config.num_heads * hd
    n_kv = config.num_kv_heads * hd
    shapes = {
        "q_proj": (n_q, h), "k_proj": (n_kv, h), "v_proj": (n_kv, h),
        "o_proj": (h, n_q),
        "gate_proj": (config.intermediate_size, h),
        "up_proj": (config.intermediate_size, h),
        "down_proj": (h, config.intermediate_size),
    }
    keys = jax.random.split(key, config.num_layers + 2)

    def dense(k, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                * (0.02)).astype(dtype)

    def norm_leaf():
        if config.norm_type == "layernorm":
            return {"w": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)}
        return jnp.ones((h,), dtype)

    layers = []
    biased = ("q_proj", "k_proj", "v_proj") if config.attention_bias else ()
    mlp_names = ("gate_proj", "up_proj", "down_proj")
    for li in range(config.num_layers):
        lk = jax.random.split(keys[li], 2 * len(_LINEAR_NAMES))
        layer = {}
        for i, name in enumerate(_LINEAR_NAMES):
            if config.num_experts > 0 and name in mlp_names:
                continue            # replaced by the MoE block below
            if not config.gated_mlp and name == "gate_proj":
                continue            # non-gated MLP has no gate
            w = dense(lk[i], shapes[name])
            if name in biased:
                b = dense(lk[len(_LINEAR_NAMES) + i], shapes[name][:1])
                layer[name] = {"w": w, "b": b}
            else:
                layer[name] = w
        if config.num_experts > 0:
            mi = config.moe_intermediate_size or config.intermediate_size
            rk = jax.random.split(jax.random.fold_in(keys[li], 7),
                                  3 * config.num_experts + 5)
            layer["moe"] = {
                "router": dense(rk[0], (config.num_experts, h)),
                "experts": [
                    {"gate_proj": dense(rk[1 + 3 * e], (mi, h)),
                     "up_proj": dense(rk[2 + 3 * e], (mi, h)),
                     "down_proj": dense(rk[3 + 3 * e], (h, mi))}
                    for e in range(config.num_experts)],
            }
            if config.moe_shared_expert_size:
                si = config.moe_shared_expert_size
                b0 = 3 * config.num_experts + 1
                layer["moe"]["shared_expert"] = {
                    "gate_proj": dense(rk[b0], (si, h)),
                    "up_proj": dense(rk[b0 + 1], (si, h)),
                    "down_proj": dense(rk[b0 + 2], (h, si))}
                layer["moe"]["shared_gate"] = dense(rk[b0 + 3], (1, h))
        layer["input_norm"] = norm_leaf()
        if not config.parallel_blocks:
            layer["post_attn_norm"] = norm_leaf()
        if config.post_norms:
            layer["pre_ffn_norm"] = jnp.ones((h,), dtype)
            layer["post_ffn_norm"] = jnp.ones((h,), dtype)
        layers.append(layer)
    params = {
        "embed": dense(keys[-2], (config.vocab_size, h)),
        "layers": layers,
        "final_norm": norm_leaf(),
    }
    if not config.tie_embeddings:
        params["lm_head"] = dense(keys[-1], (config.vocab_size, h))
    return params


def _interleave_rows(mats, tp: int) -> jnp.ndarray:
    """Concat [N_i, K] weights so dim-0 TP shards see per-matrix segments.

    For tp=1 this is a plain concat (q;k;v). For tp=T the rows are laid out
    (q_0;k_0;v_0; q_1;k_1;v_1; ...) where x_i is matrix x's i-th row shard —
    so a column-parallel P("tp", None) shard of the fused weight holds
    exactly (q_i;k_i;v_i), and the per-device split boundaries are the local
    head counts (decode_layer/prefill_layer already split at n_heads/tp).
    """
    for m in mats:
        if m.shape[0] % tp != 0:
            raise ValueError(
                f"fused projection rows {m.shape[0]} not divisible by tp={tp}")
    if tp == 1:
        return jnp.concatenate(mats, axis=0)
    segs = []
    for i in range(tp):
        for m in mats:
            n_t = m.shape[0] // tp
            segs.append(m[i * n_t:(i + 1) * n_t])
    return jnp.concatenate(segs, axis=0)


def quantize_params(params: Params, blocksize: int = 64,
                    quant_type: str = "nf4", dtype=jnp.bfloat16,
                    compress_statistics: bool = False,
                    quantize_embed: bool = False,
                    fuse_projections: bool = False,
                    tp: int = 1) -> Params:
    """Replace every linear projection with a :class:`QLinear4`.

    The engine-side equivalent of ``quantize_model`` surgery
    (integration.py:199-251 in the reference) for functional param trees.

    ``fuse_projections``: concatenate q/k/v into one ``qkv_proj`` and
    gate/up into one ``gateup_proj`` (7 → 4 kernels per layer — a decode
    latency win). ``tp``: lay the fused rows out shard-interleaved for a
    tp-way mesh (see :func:`_interleave_rows`) so the fused layout stays
    TP-shardable; the layout is specific to that tp degree (tp=1 = plain
    single-device concat). 4-bit blocks are per-row along K, so
    interleaving rows does not change any quantized value.
    """
    out = dict(params)
    out["layers"] = []

    def wb(leaf):
        """(weight, bias) from a raw array or a {'w','b'} dict leaf."""
        if isinstance(leaf, dict):
            return leaf["w"], leaf.get("b")
        return leaf, None

    def q(leaf):
        w, b = wb(leaf)
        return QLinear4.quantize(
            w.astype(jnp.float32), blocksize=blocksize, quant_type=quant_type,
            dtype=dtype, bias=b, compress_statistics=compress_statistics)

    def q_fused(leaves):
        """Quantize a row-interleaved fusion of several (w, b?) leaves.
        Biases interleave with their rows; all-None biases fuse to None."""
        ws, bs = zip(*(wb(l) for l in leaves))
        fused_b = None
        if any(b is not None for b in bs):
            bs = [jnp.zeros(w.shape[:1], w.dtype) if b is None else b
                  for w, b in zip(ws, bs)]
            fused_b = _interleave_rows(bs, tp)
        return QLinear4.quantize(
            _interleave_rows(list(ws), tp).astype(jnp.float32),
            blocksize=blocksize, quant_type=quant_type, dtype=dtype,
            bias=fused_b, compress_statistics=compress_statistics)

    for layer in params["layers"]:
        ql = dict(layer)
        if "moe" in layer:
            def q_exp(exp):
                if fuse_projections:
                    return {"gateup_proj": q_fused([exp["gate_proj"],
                                                    exp["up_proj"]]),
                            "down_proj": q(exp["down_proj"])}
                return {n: q(exp[n]) for n in
                        ("gate_proj", "up_proj", "down_proj")}
            ql["moe"] = {
                "router": layer["moe"]["router"],   # tiny; stays fp
                "experts": [q_exp(e) for e in layer["moe"]["experts"]],
            }
            if "shared_expert" in layer["moe"]:
                ql["moe"]["shared_expert"] = q_exp(
                    layer["moe"]["shared_expert"])
                ql["moe"]["shared_gate"] = layer["moe"]["shared_gate"]
        if fuse_projections:
            for name in _LINEAR_NAMES:
                ql.pop(name, None)
            ql["qkv_proj"] = q_fused(
                [layer["q_proj"], layer["k_proj"], layer["v_proj"]])
            if "moe" not in layer and "gate_proj" in layer:
                ql["gateup_proj"] = q_fused(
                    [layer["gate_proj"], layer["up_proj"]])
                ql["down_proj"] = q(layer["down_proj"])
            elif "moe" not in layer:        # non-gated MLP: nothing to fuse
                ql["up_proj"] = q(layer["up_proj"])
                ql["down_proj"] = q(layer["down_proj"])
            ql["o_proj"] = q(layer["o_proj"])
        else:
            for name in _LINEAR_NAMES:
                if name in layer:
                    ql[name] = q(layer[name])
        out["layers"].append(ql)
    if "lm_head" in params:
        hw, hb = wb(params["lm_head"])
        out["lm_head"] = QLinear4.quantize(
            hw.astype(jnp.float32), blocksize=blocksize,
            quant_type=quant_type, dtype=dtype, bias=hb,
            compress_statistics=compress_statistics)
    return out


def build_runtime_cache(params: Params, fmt: str = "int8",
                        drop_packed: bool = False,
                        skip: Tuple[str, ...] = ()) -> Params:
    """Attach a runtime execution cache to every :class:`QLinear4` leaf.

    ``fmt``: "int8" (2x packed HBM, ~750 GB/s decode path), "int4" (1x
    packed HBM, ~650 GB/s on HALF the bytes = ~2x int8-cache decode
    throughput; FP4-class requantization — opt-in, see ops/int4cache.py)
    or "bf16" (exact NF4 numerics, 4x packed). ``skip``: substring match on
    top-level keys to leave uncached (e.g. ("lm_head",) to keep the big
    head packed). See :meth:`QLinear4.with_runtime_cache`.
    """
    def conv(w):
        return (w.with_runtime_cache(fmt, drop_packed=drop_packed)
                if isinstance(w, QLinear4) else w)

    def conv_tree(t):
        """Convert every QLinear4 anywhere in a (possibly nested) layer —
        MoE layers nest experts under layer["moe"]["experts"]."""
        return jax.tree_util.tree_map(
            conv, t, is_leaf=lambda x: isinstance(x, QLinear4))

    out = {k: v for k, v in params.items()}
    out["layers"] = [conv_tree(layer) for layer in params["layers"]]
    for key in ("lm_head",):
        if key in params and not any(s in key for s in skip):
            out[key] = conv(params[key])
    return out


def _attention_block(layer, x, cos, sin, config: LlamaConfig, cache_kv=None,
                     positions=None, li: int = 0):
    """Returns (attn_out, (k_new, v_new)). cache_kv: (k_all, v_all) with the
    new k/v already written by the caller for decode, or None for prefill."""
    b, s, h = x.shape
    hd = config.hd
    if "qkv_proj" in layer:
        qkv = linear_apply(layer["qkv_proj"], x)
        nq = config.num_heads * hd
        nkv = config.num_kv_heads * hd
        q, k, v = jnp.split(qkv, [nq, nq + nkv], axis=-1)
        q = q.reshape(b, s, config.num_heads, hd)
        k = k.reshape(b, s, config.num_kv_heads, hd)
        v = v.reshape(b, s, config.num_kv_heads, hd)
    else:
        q = linear_apply(layer["q_proj"], x).reshape(
            b, s, config.num_heads, hd)
        k = linear_apply(layer["k_proj"], x).reshape(
            b, s, config.num_kv_heads, hd)
        v = linear_apply(layer["v_proj"], x).reshape(
            b, s, config.num_kv_heads, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    win = _layer_window(config, li)
    sc, cap = _attn_scale(config), config.attn_logit_softcap
    if cache_kv is None:
        attn = gqa_attention(q, k, v, window=win, scale=sc, softcap=cap)
    else:
        k_all, v_all, causal_offset = cache_kv
        attn = gqa_attention(q, k_all, v_all, causal_offset=causal_offset,
                             window=win, scale=sc, softcap=cap)
    out = linear_apply(layer["o_proj"], attn.reshape(b, s, -1))
    return out, (k, v)


def _mlp_block(layer, x, config: LlamaConfig):
    if "moe" in layer:
        return _moe_mlp(layer["moe"], x, config)
    if not config.gated_mlp:        # Phi: up -> act -> down
        return linear_apply(layer["down_proj"],
                            _act(config)(linear_apply(layer["up_proj"], x)))
    if "gateup_proj" in layer:
        gate, up = jnp.split(linear_apply(layer["gateup_proj"], x), 2,
                             axis=-1)
    else:
        gate = linear_apply(layer["gate_proj"], x)
        up = linear_apply(layer["up_proj"], x)
    return linear_apply(layer["down_proj"], _act(config)(gate) * up)


def prefill_layer(layer, x, cos, sin, config: LlamaConfig, *,
                  n_heads: int, n_kv: int,
                  wrap=lambda w, row=False: w,
                  reduce_fn=lambda t, w: t, li: int = 0):
    """One transformer layer of a causal prefill (no cache history).

    The S>1 counterpart of :func:`decode_layer`, sharing its ``wrap`` /
    ``reduce_fn`` TP hooks so tensor-parallel prefill (parallel/tp.py) runs
    the same fused quantized matmuls on local shards. Returns
    (x, (k, v)) with k/v [B, S, n_kv, D] post-RoPE for the KV-cache write.
    """
    b, s, _ = x.shape
    hd = config.hd
    h = _norm(x, layer["input_norm"], config)
    if "qkv_proj" in layer:
        qkv = linear_apply(wrap(layer["qkv_proj"]), h)
        q, k, v = jnp.split(qkv, [n_heads * hd, (n_heads + n_kv) * hd],
                            axis=-1)
        q = q.reshape(b, s, n_heads, hd)
        k = k.reshape(b, s, n_kv, hd)
        v = v.reshape(b, s, n_kv, hd)
    else:
        q = linear_apply(wrap(layer["q_proj"]), h).reshape(b, s, n_heads, hd)
        k = linear_apply(wrap(layer["k_proj"]), h).reshape(b, s, n_kv, hd)
        v = linear_apply(wrap(layer["v_proj"]), h).reshape(b, s, n_kv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn = gqa_attention(q, k, v, window=_layer_window(config, li),
                         scale=_attn_scale(config),
                         softcap=config.attn_logit_softcap)
    o = linear_apply(wrap(layer["o_proj"], row=True), attn.reshape(b, s, -1))
    eps, off = config.rms_eps, config.rms_weight_offset
    o_full = reduce_fn(o, layer["o_proj"])
    if config.post_norms:
        o_full = rms_norm(o_full, layer["post_attn_norm"], eps, off)
    if not config.parallel_blocks:
        x = x + o_full
        h = _norm(x, layer["pre_ffn_norm" if config.post_norms
                  else "post_attn_norm"], config)
    if "moe" in layer:
        d_full = _moe_mlp(layer["moe"], h, config, wrap, reduce_fn)
    elif not config.gated_mlp:
        d = linear_apply(wrap(layer["down_proj"], row=True),
                         _act(config)(linear_apply(wrap(layer["up_proj"]),
                                                   h)))
        d_full = reduce_fn(d, layer["down_proj"])
    else:
        if "gateup_proj" in layer:
            gate, up = jnp.split(linear_apply(wrap(layer["gateup_proj"]), h),
                                 2, axis=-1)
        else:
            gate = linear_apply(wrap(layer["gate_proj"]), h)
            up = linear_apply(wrap(layer["up_proj"]), h)
        d = linear_apply(wrap(layer["down_proj"], row=True),
                         _act(config)(gate) * up)
        d_full = reduce_fn(d, layer["down_proj"])
    if config.post_norms:
        d_full = rms_norm(d_full, layer["post_ffn_norm"], eps, off)
    if config.parallel_blocks:      # Phi: x + attn(h) + mlp(h)
        return x + o_full + d_full, (k, v)
    x = x + d_full
    return x, (k, v)


def forward(params: Params, tokens: jnp.ndarray, config: LlamaConfig,
            positions: Optional[jnp.ndarray] = None,
            kv_caches=None, return_kv: bool = False,
            remat: bool = False, last_only: bool = False):
    """Full forward.

    tokens [B, S] int32. ``positions`` [B, S] (default aranged). Without
    caches this is a causal prefill; with ``kv_caches`` (list per layer of
    (k_all [B,T,Hkv,D], v_all, causal_offset [B,S])) attention runs against
    the cache contents. Returns logits [B, S, V] (+ list of per-layer new
    (k, v) when ``return_kv``).

    ``remat``: wrap each transformer layer in ``jax.checkpoint`` — the
    backward pass recomputes layer activations instead of keeping them
    live, trading ~1 extra forward of FLOPs for O(layers) less activation
    memory (the standard long-sequence / large-batch QLoRA training trade).

    ``last_only``: apply the LM head to the final position only and return
    logits [B, 1, V] — the serving prefill shape (only the next token's
    logits matter), skipping the S-fold head matmul and the [B, S, V]
    logits allocation (~2 GB at B=8, S=4k, V=32k).
    """
    b, s = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    cos_full, sin_full = rope_table(config.rotary_dim, config.max_seq_len,
                                    config.rope_theta, config.rope_scaling)
    cos = jnp.take(cos_full, positions, axis=0)  # [B, S, D/2]
    sin = jnp.take(sin_full, positions, axis=0)

    x = _embed_tokens(params, tokens, config)
    eps, off = config.rms_eps, config.rms_weight_offset
    new_kv = []

    def layer_fn(layer, x, cos, sin, cache_kv, li):
        h = _norm(x, layer["input_norm"], config)
        attn, kv = _attention_block(layer, h, cos, sin, config, cache_kv,
                                    li=li)
        if config.parallel_blocks:  # Phi: attn and MLP both read h
            return x + attn + _mlp_block(layer, h, config), kv
        if config.post_norms:       # Gemma2 sandwich: norm the block OUTPUT
            attn = rms_norm(attn, layer["post_attn_norm"], eps, off)
        x = x + attn
        h = _norm(x, layer["pre_ffn_norm" if config.post_norms
                  else "post_attn_norm"], config)
        m = _mlp_block(layer, h, config)
        if config.post_norms:
            m = rms_norm(m, layer["post_ffn_norm"], eps, off)
        return x + m, kv

    for li, layer in enumerate(params["layers"]):
        cache_kv = kv_caches[li] if kv_caches is not None else None
        blk = (jax.checkpoint(partial(layer_fn, cache_kv=cache_kv, li=li))
               if remat else partial(layer_fn, cache_kv=cache_kv, li=li))
        x, kv = blk(layer, x, cos, sin)
        if return_kv:
            new_kv.append(kv)
    x = _norm(x, params["final_norm"], config)
    if last_only:
        x = x[:, -1:]
    logits = head_logits(params, x, config)
    if return_kv:
        return logits, new_kv
    return logits


def decode_layer(layer, x, cos, sin, positions, cache, li,
                 config: LlamaConfig, *, n_heads: int, n_kv: int,
                 wrap=lambda w, row=False: w,
                 reduce_fn=lambda t, w: t,
                 attn_span: Optional[int] = None,
                 slot=None, attn_start: int = 0):
    """One transformer layer of the cached decode step (single token).

    Shared by the single-device decode step (engine/engine.py) and the
    tensor-parallel decode step (parallel/tp.py). ``wrap`` adapts weight
    leaves (e.g. localizes TP shards and strips row-parallel biases);
    ``reduce_fn(partial, weight)`` reduces row-parallel partials (psum) and
    re-applies their bias once. ``attn_span`` (static) bounds the KV read to
    the first ``attn_span`` positions so attention cost tracks actual
    lengths, not ``max_seq`` (see KVCache.read). ``x`` may carry S > 1
    tokens per slot (speculative verify step) with per-token ``positions``
    [B, S]; the KV for all S tokens is written up front and the causal mask
    keeps each query from seeing later (or stale rejected) entries.
    ``slot`` (traced int, optional): slot-targeted mode — x is one request's
    [1, C] token chunk written into cache slot ``slot`` (chunked prefill);
    attention reads only that slot's history.
    Returns (x, cache).
    """
    b, s, _ = x.shape
    pos2d = positions if positions.ndim == 2 else positions[:, None]
    hd = config.hd
    h = _norm(x, layer["input_norm"], config)
    if "qkv_proj" in layer:
        qkv = linear_apply(wrap(layer["qkv_proj"]), h)
        q, k, v = jnp.split(qkv, [n_heads * hd, (n_heads + n_kv) * hd],
                            axis=-1)
        q = q.reshape(b, s, n_heads, hd)
        k = k.reshape(b, s, n_kv, hd)
        v = v.reshape(b, s, n_kv, hd)
    else:
        q = linear_apply(wrap(layer["q_proj"]), h).reshape(b, s, n_heads, hd)
        k = linear_apply(wrap(layer["k_proj"]), h).reshape(b, s, n_kv, hd)
        v = linear_apply(wrap(layer["v_proj"]), h).reshape(b, s, n_kv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if cache.ring:
        # rolling KV: the whole (window-sized) ring is read; the ring mask
        # maps each entry to its absolute position
        attn_span, attn_start = None, 0
    if slot is None:
        cache = cache.write_decode(li, k, v, pos2d)
        reads = lambda: cache.read_raw(li, attn_span, attn_start)
    else:
        # slot-targeted (chunked prefill): x is [1, C] for one cache slot;
        # attention reads only that slot's history (O(span), not O(B·span))
        cache = cache.write_decode(li, k, v, pos2d, slots=slot[None])
        reads = lambda: cache.read_raw_slot(li, slot, attn_span, attn_start)
    ring = cache.max_seq if cache.ring else None
    win = _layer_window(config, li)
    sc, cap = _attn_scale(config), config.attn_logit_softcap
    from ..functional import has_fused_kernels
    import os
    use_flash = (s == 1 and slot is None and cache.quantized
                 and ring is None and has_fused_kernels()
                 and os.environ.get("TBNB_FLASH_DECODE") == "1"
                 and jnp.dtype(config.dtype) in (jnp.bfloat16, jnp.float16))
    if use_flash:
        # fused Pallas flash-decode (OPT-IN, measured net-negative in situ:
        # the kernel's occupied time is 4x lower than the XLA chain's
        # per-op total, but as an opaque custom call it does not overlap
        # with the surrounding weight streaming — full-step 12.2 -> 14.0 ms
        # at 7B B=8; see KERNEL_NOTES round-3 and ops/flash_decode.py)
        from ..ops.flash_decode import flash_decode_attention
        kq, ks, vq, vs = reads()
        staged = (cache.read_stage(li) if cache.stage is not None else None)
        attn = flash_decode_attention(
            q[:, 0], kq, ks, vq, vs, pos2d[:, 0], staged=staged,
            scale=sc, window=win, kpos_start=attn_start,
            softcap=cap)[:, None].astype(q.dtype)
    elif cache.stage is not None and cache.stage.cut > 0:
        # compact-window staged decode (the round-5 default): the chunk's
        # frozen span + staged tokens live contiguously in the window
        # buffers — ONE single-block softmax, no span slice, no two-block
        # structure (30.0 vs 51.2 us/layer-step, kbench/fd_probe)
        from .layers import gqa_attention_kv_window
        st = cache.stage
        wk, wks, wv, wvs = cache.read_window(li)
        attn = gqa_attention_kv_window(
            q, wk, wks, wv, wvs, cut=st.cut, attn_start=attn_start,
            len0=st.len0, step=st.step, causal_offset=pos2d,
            window=win, scale=sc, softcap=cap)
    elif cache.stage is not None:
        # chunk-staged decode (engine.decode_chunk): this chunk's tokens
        # live in the staging buffers, not the main cache — attention runs
        # over both blocks (gqa_attention_kv_quant staged=). Compute dtype
        # follows q (bf16 MXU ingest for half configs, f32 otherwise).
        kq, ks, vq, vs = reads()
        attn = gqa_attention_kv_quant(q, kq, ks, vq, vs, causal_offset=pos2d,
                                      window=win, scale=sc, softcap=cap,
                                      kpos_start=attn_start,
                                      staged=cache.read_stage(li))
    elif cache.quantized and jnp.dtype(config.dtype) in (jnp.bfloat16,
                                                         jnp.float16):
        # scale-folded int8 attention: no dequantized K/V materialization,
        # bf16 MXU contractions (see gqa_attention_kv_quant)
        kq, ks, vq, vs = reads()
        attn = gqa_attention_kv_quant(q, kq, ks, vq, vs, causal_offset=pos2d,
                                      window=win, scale=sc, softcap=cap,
                                      kpos_start=attn_start, ring=ring)
    elif cache.quantized:
        # f32 compute: dequantize the (slot-sliced) head-major codes
        kq, ks, vq, vs = reads()
        k_all = (kq.astype(jnp.float32)
                 * (ks[..., None] / 127.0)).astype(config.dtype)
        v_all = (vq.astype(jnp.float32)
                 * (vs[..., None] / 127.0)).astype(config.dtype)
        attn = gqa_attention_hm(q, k_all, v_all, causal_offset=pos2d,
                                window=win, scale=sc, softcap=cap,
                                kpos_start=attn_start, ring=ring)
    else:
        # unquantized cache: consume the head-major storage in place
        k_hm, _, v_hm, _ = reads()
        attn = gqa_attention_hm(q, k_hm, v_hm, causal_offset=pos2d,
                                window=win, scale=sc, softcap=cap,
                                kpos_start=attn_start, ring=ring)
    o = linear_apply(wrap(layer["o_proj"], row=True), attn.reshape(b, s, -1))
    eps, off = config.rms_eps, config.rms_weight_offset
    o_full = reduce_fn(o, layer["o_proj"])
    if config.post_norms:
        o_full = rms_norm(o_full, layer["post_attn_norm"], eps, off)
    if not config.parallel_blocks:
        x = x + o_full
        h = _norm(x, layer["pre_ffn_norm" if config.post_norms
                  else "post_attn_norm"], config)
    if "moe" in layer:
        d_full = _moe_mlp(layer["moe"], h, config, wrap, reduce_fn)
    elif not config.gated_mlp:
        d = linear_apply(wrap(layer["down_proj"], row=True),
                         _act(config)(linear_apply(wrap(layer["up_proj"]),
                                                   h)))
        d_full = reduce_fn(d, layer["down_proj"])
    else:
        if "gateup_proj" in layer:
            gateup = linear_apply(wrap(layer["gateup_proj"]), h)
            gate, up = jnp.split(gateup, 2, axis=-1)
        else:
            gate = linear_apply(wrap(layer["gate_proj"]), h)
            up = linear_apply(wrap(layer["up_proj"]), h)
        d = linear_apply(wrap(layer["down_proj"], row=True),
                         _act(config)(gate) * up)
        d_full = reduce_fn(d, layer["down_proj"])
    if config.post_norms:
        d_full = rms_norm(d_full, layer["post_ffn_norm"], eps, off)
    if config.parallel_blocks:      # Phi: x + attn(h) + mlp(h)
        return x + o_full + d_full, cache
    x = x + d_full
    return x, cache


def decode_embed_and_rope(params, tokens, positions, config: LlamaConfig):
    """Shared decode-step prologue: embedding gather + per-position rope.

    tokens/positions are [B] (single-token decode) or [B, S] (speculative
    verify); returns x [B, S, H], cos/sin [B, S, D/2].
    """
    tok2d = tokens if tokens.ndim == 2 else tokens[:, None]
    pos2d = positions if positions.ndim == 2 else positions[:, None]
    cos_full, sin_full = rope_table(config.rotary_dim, config.max_seq_len,
                                    config.rope_theta, config.rope_scaling)
    cos = jnp.take(cos_full, pos2d, axis=0)
    sin = jnp.take(sin_full, pos2d, axis=0)
    x = _embed_tokens(params, tok2d, config)
    return x, cos, sin


def count_params(config: LlamaConfig) -> int:
    h, i, v = config.hidden_size, config.intermediate_size, config.vocab_size
    hd = config.hd
    per_layer = (config.num_heads * hd * h + 2 * config.num_kv_heads * hd * h
                 + h * config.num_heads * hd + 3 * h * i + 2 * h)
    total = config.num_layers * per_layer + v * h + h
    if not config.tie_embeddings:
        total += v * h
    return total
