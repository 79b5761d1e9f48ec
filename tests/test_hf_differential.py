"""Differential tests against HuggingFace transformers (torch CPU).

The strongest numerics oracle available in-environment: random-init a real
``transformers`` model (LlamaForCausalLM / Qwen2ForCausalLM — the latter is
the reference demo's model family, demo/chat.py), convert its state_dict
through ``tpu_bitsandbytes.utils.hf``, and require the fp32 logits to agree
elementwise. This pins RoPE convention, GQA head grouping, attention
scaling, RMSNorm epsilon placement, bias handling, and tied-embedding logic
against the canonical implementation — not just self-consistency.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tpu_bitsandbytes.models import llama
from tpu_bitsandbytes.utils import (
    llama_config_from_hf, llama_params_from_state_dict)


def _logits_ours(sd, hf_config, tokens, quantize=False):
    import dataclasses
    cfg = dataclasses.replace(llama_config_from_hf(hf_config),
                              dtype=jnp.float32)
    params = llama_params_from_state_dict(sd, cfg, dtype=jnp.float32,
                                          quantize=quantize)
    return np.asarray(
        llama.forward(params, jnp.asarray(tokens), cfg), np.float32), cfg


def _logits_hf(model, tokens):
    with torch.no_grad():
        return model(torch.tensor(tokens)).logits.float().numpy()


def _agree(a, b, atol):
    assert a.shape == b.shape
    scale = np.abs(b).max() + 1e-9
    diff = np.abs(a - b).max() / scale
    assert diff < atol, f"normalized max |Δlogits| {diff:.2e} >= {atol}"


class TestLlamaVsHF:
    @pytest.fixture(scope="class")
    def hf_model(self):
        torch.manual_seed(0)
        config = transformers.LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rms_norm_eps=1e-5, rope_theta=10000.0, attention_bias=False,
            tie_word_embeddings=False)
        model = transformers.LlamaForCausalLM(config).float().eval()
        return model, config

    def test_fp32_logits_match(self, hf_model, rng):
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (2, 9))
        ours, _ = _logits_ours(model.state_dict(), config, tokens)
        _agree(ours, _logits_hf(model, tokens), atol=2e-4)

    def test_gqa_grouping_pinned(self, hf_model, rng):
        """num_kv_heads < num_heads above — a transposed/regrouped GQA
        mapping would blow the elementwise bound; rerun on longer context
        so every rope position is exercised."""
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (1, 48))
        ours, _ = _logits_ours(model.state_dict(), config, tokens)
        _agree(ours, _logits_hf(model, tokens), atol=2e-4)

    def test_nf4_quantized_still_tracks(self, hf_model, rng):
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (1, 8))
        ours, _ = _logits_ours(model.state_dict(), config, tokens,
                               quantize=True)
        ref = _logits_hf(model, tokens)
        c = (ours.ravel() @ ref.ravel()) / (
            np.linalg.norm(ours) * np.linalg.norm(ref) + 1e-9)
        assert c > 0.95


class TestQwen2VsHF:
    """Qwen2: q/k/v biases + tied embeddings + high rope theta."""

    @pytest.fixture(scope="class")
    def hf_model(self):
        torch.manual_seed(1)
        config = transformers.Qwen2Config(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rms_norm_eps=1e-6, rope_theta=1000000.0,
            tie_word_embeddings=True)
        model = transformers.Qwen2ForCausalLM(config).float().eval()
        return model, config

    def test_config_mapping(self, hf_model):
        _, config = hf_model
        cfg = llama_config_from_hf(config)
        assert cfg.attention_bias is True
        assert cfg.tie_embeddings is True
        assert cfg.rope_theta == 1000000.0

    def test_fp32_logits_match(self, hf_model, rng):
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (2, 11))
        ours, cfg = _logits_ours(model.state_dict(), config, tokens)
        # bias-ness must survive conversion
        _agree(ours, _logits_hf(model, tokens), atol=2e-4)

    def test_biases_nonzero_and_used(self, hf_model, rng):
        """Guard against silently dropping the q/k/v biases: HF init zeroes
        them, so randomize them in the torch model — both implementations
        must track the change identically (and differ from the zero-bias
        logits)."""
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (1, 7))
        ref_zero = _logits_hf(model, tokens)
        gen = torch.Generator().manual_seed(7)
        with torch.no_grad():
            for name, p in model.named_parameters():
                if "self_attn" in name and name.endswith(".bias"):
                    p.copy_(torch.randn(p.shape, generator=gen) * 0.5)
        try:
            ref = _logits_hf(model, tokens)
            ours, _ = _logits_ours(model.state_dict(), config, tokens)
            assert not np.allclose(ref, ref_zero, atol=1e-3)
            _agree(ours, ref, atol=2e-4)
        finally:
            with torch.no_grad():
                for name, p in model.named_parameters():
                    if "self_attn" in name and name.endswith(".bias"):
                        p.zero_()

    def test_greedy_decode_matches_hf_generate(self, hf_model, rng):
        """End-to-end: our engine's greedy decode = HF greedy generate
        (fp32, unquantized KV) on the Qwen2 trunk."""
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        model, config = hf_model
        import dataclasses
        cfg = dataclasses.replace(llama_config_from_hf(config),
                                  dtype=jnp.float32)
        params = llama_params_from_state_dict(model.state_dict(), cfg,
                                              dtype=jnp.float32)
        prompt = list(map(int, rng.integers(0, config.vocab_size, 6)))
        n_new = 8
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False,
                pad_token_id=0)
        expect = hf_out[0, len(prompt):].tolist()
        eng = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                           quantized_kv=False)
        got = eng.generate([prompt], SamplingParams(max_new_tokens=n_new))[0]
        assert got == expect


class TestMistralVsHF:
    """Mistral: sliding-window attention on the Llama trunk. The window (8)
    is far smaller than the test sequence (24), so any masking error is
    visible in the logits."""

    @pytest.fixture(scope="class")
    def hf_model(self):
        torch.manual_seed(2)
        config = transformers.MistralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rms_norm_eps=1e-5, rope_theta=10000.0, sliding_window=8,
            tie_word_embeddings=False, attn_implementation="eager")
        model = transformers.MistralForCausalLM(config).float().eval()
        return model, config

    def test_config_mapping(self, hf_model):
        _, config = hf_model
        cfg = llama_config_from_hf(config)
        assert cfg.sliding_window == 8
        # Qwen2's ungated sliding_window must NOT map through
        qcfg = llama_config_from_hf({
            "vocab_size": 8, "hidden_size": 8, "intermediate_size": 8,
            "num_hidden_layers": 1, "num_attention_heads": 1,
            "model_type": "qwen2", "sliding_window": 4096,
            "use_sliding_window": False})
        assert qcfg.sliding_window is None

    def test_fp32_logits_match_beyond_window(self, hf_model, rng):
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (2, 24))
        ours, _ = _logits_ours(model.state_dict(), config, tokens)
        _agree(ours, _logits_hf(model, tokens), atol=2e-4)

    def test_window_actually_masks(self, hf_model, rng):
        """Perturbing a token >window positions back must NOT change the
        last-token logits; perturbing one inside the window must."""
        model, config = hf_model
        base = rng.integers(0, config.vocab_size, (1, 24))
        far, near = base.copy(), base.copy()
        far[0, 2] = (far[0, 2] + 1) % config.vocab_size     # 21 back, > 2*8
        near[0, 22] = (near[0, 22] + 1) % config.vocab_size  # 1 back
        sd, cfg = model.state_dict(), config
        lb, _ = _logits_ours(sd, cfg, base)
        lf, _ = _logits_ours(sd, cfg, far)
        ln, _ = _logits_ours(sd, cfg, near)
        # note: with 2 layers the receptive field is 2*window; token 2 is
        # 21 positions back from the last token, beyond 2*8-1=15
        assert np.allclose(lb[0, -1], lf[0, -1], atol=1e-5)
        assert not np.allclose(lb[0, -1], ln[0, -1], atol=1e-3)

    def test_engine_decode_matches_hf_generate(self, hf_model, rng):
        """Greedy decode through the engine's windowed KV-cache attention
        must equal HF generate past the window boundary."""
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        import dataclasses
        model, config = hf_model
        cfg = dataclasses.replace(llama_config_from_hf(config),
                                  dtype=jnp.float32)
        params = llama_params_from_state_dict(model.state_dict(), cfg,
                                              dtype=jnp.float32)
        prompt = list(map(int, rng.integers(0, config.vocab_size, 6)))
        n_new = 12   # 6 + 12 = 18 > window 8: decode crosses the boundary
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False,
                pad_token_id=0)
        expect = hf_out[0, len(prompt):].tolist()
        eng = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                           quantized_kv=False)
        got = eng.generate([prompt], SamplingParams(max_new_tokens=n_new))[0]
        assert got == expect


class TestGemmaVsHF:
    """Gemma: gelu-tanh MLP, (1+w) RMSNorm, sqrt(hidden)-scaled embeddings,
    tied head, and an explicit head_dim != hidden_size/num_heads."""

    @pytest.fixture(scope="class")
    def hf_model(self):
        torch.manual_seed(3)
        config = transformers.GemmaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=1, head_dim=24,
            max_position_embeddings=64, rms_norm_eps=1e-6,
            rope_theta=10000.0, hidden_activation="gelu_pytorch_tanh",
            attention_bias=False)
        model = transformers.GemmaForCausalLM(config).float().eval()
        return model, config

    def test_config_mapping(self, hf_model):
        _, config = hf_model
        cfg = llama_config_from_hf(config)
        assert cfg.hidden_act == "gelu_tanh"
        assert cfg.rms_weight_offset == 1.0
        assert cfg.scale_embeddings is True
        assert cfg.tie_embeddings is True
        assert cfg.hd == 24

    def test_fp32_logits_match(self, hf_model, rng):
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (2, 13))
        ours, _ = _logits_ours(model.state_dict(), config, tokens)
        _agree(ours, _logits_hf(model, tokens), atol=2e-4)

    def test_engine_decode_matches_hf_generate(self, hf_model, rng):
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        import dataclasses
        model, config = hf_model
        cfg = dataclasses.replace(llama_config_from_hf(config),
                                  dtype=jnp.float32)
        params = llama_params_from_state_dict(model.state_dict(), cfg,
                                              dtype=jnp.float32)
        prompt = list(map(int, rng.integers(0, config.vocab_size, 5)))
        n_new = 8
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False,
                pad_token_id=0)
        expect = hf_out[0, len(prompt):].tolist()
        eng = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                           quantized_kv=False)
        got = eng.generate([prompt], SamplingParams(max_new_tokens=n_new))[0]
        assert got == expect


class TestLlama3RopeScalingVsHF:
    """Llama-3.1 'llama3' rope band scaling: with original_max_position (16)
    far below the test sequence (40), every frequency band — kept, scaled,
    and smoothly interpolated — contributes to the logits."""

    @pytest.fixture(scope="class")
    def hf_model(self):
        torch.manual_seed(4)
        config = transformers.LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rms_norm_eps=1e-5, rope_theta=10000.0,
            rope_scaling={"rope_type": "llama3", "factor": 4.0,
                          "low_freq_factor": 1.0, "high_freq_factor": 2.0,
                          "original_max_position_embeddings": 16},
            tie_word_embeddings=False)
        model = transformers.LlamaForCausalLM(config).float().eval()
        return model, config

    def test_config_mapping(self, hf_model):
        _, config = hf_model
        cfg = llama_config_from_hf(config)
        assert cfg.rope_scaling == ("llama3", 4.0, 1.0, 2.0, 16)

    def test_fp32_logits_match(self, hf_model, rng):
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (1, 40))
        ours, _ = _logits_ours(model.state_dict(), config, tokens)
        _agree(ours, _logits_hf(model, tokens), atol=2e-4)

    def test_scaling_changes_logits(self, hf_model, rng):
        """Dropping the scaling tuple must change the long-context logits
        (guards against the table silently ignoring it)."""
        import dataclasses
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (1, 40))
        scaled, cfg = _logits_ours(model.state_dict(), config, tokens)
        cfg_plain = dataclasses.replace(cfg, rope_scaling=None)
        params = llama_params_from_state_dict(model.state_dict(), cfg_plain,
                                              dtype=jnp.float32)
        plain = np.asarray(
            llama.forward(params, jnp.asarray(tokens), cfg_plain), np.float32)
        assert not np.allclose(scaled, plain, atol=1e-3)

    def test_linear_scaling_matches_hf(self, rng):
        torch.manual_seed(5)
        config = transformers.LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=1, num_attention_heads=4,
            num_key_value_heads=4, max_position_embeddings=64,
            rope_scaling={"rope_type": "linear", "factor": 2.0},
            tie_word_embeddings=False)
        model = transformers.LlamaForCausalLM(config).float().eval()
        tokens = rng.integers(0, config.vocab_size, (1, 32))
        ours, cfg = _logits_ours(model.state_dict(), config, tokens)
        assert cfg.rope_scaling == ("linear", 2.0)
        _agree(ours, _logits_hf(model, tokens), atol=2e-4)


class TestGemma2VsHF:
    """Gemma2: sandwich norms, attn/final logit soft-capping, fixed
    query_pre_attn_scalar attention scale, alternating sliding window.
    All knobs set to values that visibly change the logits (window 8 <<
    seq 24, scalar != head_dim, small caps)."""

    @pytest.fixture(scope="class")
    def hf_model(self):
        torch.manual_seed(6)
        config = transformers.Gemma2Config(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, head_dim=24,
            max_position_embeddings=64, rms_norm_eps=1e-6,
            rope_theta=10000.0, hidden_activation="gelu_pytorch_tanh",
            attn_logit_softcapping=20.0, final_logit_softcapping=10.0,
            query_pre_attn_scalar=16, sliding_window=8,
            attn_implementation="eager")
        model = transformers.Gemma2ForCausalLM(config).float().eval()
        return model, config

    def test_config_mapping(self, hf_model):
        _, config = hf_model
        cfg = llama_config_from_hf(config)
        assert cfg.post_norms is True
        assert cfg.attn_logit_softcap == 20.0
        assert cfg.final_logit_softcap == 10.0
        assert cfg.query_pre_attn_scalar == 16.0
        assert cfg.sliding_window == 8
        # even layers sliding, odd global — via HF layer_types or the
        # pattern fallback; assert the effective per-layer windows
        from tpu_bitsandbytes.models.llama import _layer_window
        assert [_layer_window(cfg, li) for li in range(4)] == [8, None,
                                                               8, None]
        assert cfg.rms_weight_offset == 1.0 and cfg.scale_embeddings

    def test_fp32_logits_match(self, hf_model, rng):
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (2, 24))
        ours, _ = _logits_ours(model.state_dict(), config, tokens)
        _agree(ours, _logits_hf(model, tokens), atol=3e-4)

    def test_alternating_window_pinned(self, hf_model, rng):
        """4 layers, pattern 2: global layers (1, 3) see the whole context,
        so a perturbation far beyond the sliding receptive field STILL
        changes the last-token logits — and both implementations agree."""
        model, config = hf_model
        base = rng.integers(0, config.vocab_size, (1, 24))
        far = base.copy()
        far[0, 0] = (far[0, 0] + 1) % config.vocab_size
        ours_b, _ = _logits_ours(model.state_dict(), config, base)
        ours_f, _ = _logits_ours(model.state_dict(), config, far)
        assert not np.allclose(ours_b[0, -1], ours_f[0, -1], atol=1e-4)
        _agree(ours_f, _logits_hf(model, far), atol=3e-4)

    def test_engine_decode_matches_hf_generate(self, hf_model, rng):
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        import dataclasses
        model, config = hf_model
        cfg = dataclasses.replace(llama_config_from_hf(config),
                                  dtype=jnp.float32)
        params = llama_params_from_state_dict(model.state_dict(), cfg,
                                              dtype=jnp.float32)
        prompt = list(map(int, rng.integers(0, config.vocab_size, 6)))
        n_new = 10    # crosses the window-8 boundary during decode
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False,
                pad_token_id=0)
        expect = hf_out[0, len(prompt):].tolist()
        eng = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                           quantized_kv=False)
        got = eng.generate([prompt], SamplingParams(max_new_tokens=n_new))[0]
        assert got == expect


class TestMixtralVsHF:
    """Mixtral sparse MoE: softmax-all -> top-2 -> renormalized routing,
    per-expert SwiGLU. 4 experts / top-2 so routing decisions actually
    split across experts."""

    @pytest.fixture(scope="class")
    def hf_model(self):
        torch.manual_seed(8)
        config = transformers.MixtralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rms_norm_eps=1e-5, rope_theta=10000.0,
            num_local_experts=4, num_experts_per_tok=2,
            sliding_window=None, tie_word_embeddings=False,
            attn_implementation="eager")
        model = transformers.MixtralForCausalLM(config).float().eval()
        return model, config

    def test_config_mapping(self, hf_model):
        _, config = hf_model
        cfg = llama_config_from_hf(config)
        assert cfg.num_experts == 4
        assert cfg.experts_per_token == 2

    def test_fp32_logits_match(self, hf_model, rng):
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (2, 12))
        ours, _ = _logits_ours(model.state_dict(), config, tokens)
        _agree(ours, _logits_hf(model, tokens), atol=3e-4)

    def test_routing_is_sparse(self, hf_model, rng):
        """Zeroing an expert that top-2 routing never selects for a token
        must not change that token's logits; verify our router agrees with
        HF's by construction (logits already matched elementwise)."""
        from tpu_bitsandbytes.models.llama import _moe_mlp
        import dataclasses
        model, config = hf_model
        cfg = dataclasses.replace(llama_config_from_hf(config),
                                  dtype=jnp.float32)
        params = llama_params_from_state_dict(model.state_dict(), cfg,
                                              dtype=jnp.float32)
        moe = params["layers"][0]["moe"]
        x = jnp.asarray(rng.standard_normal((1, 5, 64)), jnp.float32)
        out = _moe_mlp(moe, x, cfg)
        # top-2 of 4: exactly 2 experts contribute per token; perturbing a
        # never-selected expert's weights must leave the output unchanged
        logits = np.asarray(x @ jnp.asarray(moe["router"]).T)
        sel = set(np.argsort(-logits, axis=-1)[..., :2].ravel().tolist())
        unused = [e for e in range(4) if e not in sel]
        if unused:
            e = unused[0]
            moe2 = {"router": moe["router"],
                    "experts": list(moe["experts"])}
            moe2["experts"][e] = jax.tree_util.tree_map(
                lambda a: a * 0.0, moe["experts"][e])
            out2 = _moe_mlp(moe2, x, cfg)
            np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                       atol=1e-6)

    def test_nf4_quantized_tracks(self, hf_model, rng):
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (1, 8))
        ours, _ = _logits_ours(model.state_dict(), config, tokens,
                               quantize=True)
        ref = _logits_hf(model, tokens)
        c = (ours.ravel() @ ref.ravel()) / (
            np.linalg.norm(ours) * np.linalg.norm(ref) + 1e-9)
        assert c > 0.95

    def test_engine_decode_matches_hf_generate(self, hf_model, rng):
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        import dataclasses
        model, config = hf_model
        cfg = dataclasses.replace(llama_config_from_hf(config),
                                  dtype=jnp.float32)
        params = llama_params_from_state_dict(model.state_dict(), cfg,
                                              dtype=jnp.float32)
        prompt = list(map(int, rng.integers(0, config.vocab_size, 6)))
        n_new = 8
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False,
                pad_token_id=0)
        expect = hf_out[0, len(prompt):].tolist()
        eng = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                           quantized_kv=False)
        got = eng.generate([prompt], SamplingParams(max_new_tokens=n_new))[0]
        assert got == expect


class TestPhi3VsHF:
    """Phi-3: Llama math with checkpoint-fused qkv_proj / gate_up_proj —
    the conversion splits them back into separate leaves."""

    @pytest.fixture(scope="class")
    def hf_model(self):
        torch.manual_seed(9)
        config = transformers.Phi3Config(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rms_norm_eps=1e-5, rope_theta=10000.0, pad_token_id=0,
            tie_word_embeddings=False, attn_implementation="eager")
        model = transformers.Phi3ForCausalLM(config).float().eval()
        return model, config

    def test_fused_checkpoint_layout(self, hf_model):
        model, _ = hf_model
        sd = model.state_dict()
        assert "model.layers.0.self_attn.qkv_proj.weight" in sd
        assert "model.layers.0.mlp.gate_up_proj.weight" in sd

    def test_fp32_logits_match(self, hf_model, rng):
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (2, 10))
        ours, _ = _logits_ours(model.state_dict(), config, tokens)
        _agree(ours, _logits_hf(model, tokens), atol=2e-4)

    def test_engine_decode_matches_hf_generate(self, hf_model, rng):
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        import dataclasses
        model, config = hf_model
        cfg = dataclasses.replace(llama_config_from_hf(config),
                                  dtype=jnp.float32)
        params = llama_params_from_state_dict(model.state_dict(), cfg,
                                              dtype=jnp.float32)
        prompt = list(map(int, rng.integers(0, config.vocab_size, 5)))
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
                pad_token_id=0)
        expect = hf_out[0, len(prompt):].tolist()
        eng = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                           quantized_kv=False)
        got = eng.generate([prompt],
                           SamplingParams(max_new_tokens=8))[0]
        assert got == expect


class TestMixtralFusedExperts:
    def test_fused_expert_gateup_matches_unfused(self, rng):
        """quantize_params(fuse_projections=True) fuses each expert's
        gate/up; outputs must match the unfused quantized model exactly
        (same codes, re-ordered rows)."""
        from tpu_bitsandbytes.models import llama as L
        import jax
        cfg = L.LlamaConfig.tiny_mixtral()
        import dataclasses
        cfg = dataclasses.replace(cfg, dtype=jnp.float32)
        params = L.init_params(jax.random.PRNGKey(13), cfg,
                               dtype=jnp.float32)
        q_unf = L.quantize_params(params, dtype=jnp.float32)
        q_fus = L.quantize_params(params, dtype=jnp.float32,
                                  fuse_projections=True)
        assert "gateup_proj" in q_fus["layers"][0]["moe"]["experts"][0]
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)))
        a = np.asarray(L.forward(q_unf, toks, cfg), np.float32)
        b = np.asarray(L.forward(q_fus, toks, cfg), np.float32)
        np.testing.assert_allclose(a, b, atol=1e-4)


class TestQwen2SlidingWindowVsHF:
    """Qwen2 with use_sliding_window=True windows only layers >=
    max_window_layers (HF layer_types); the conversion must map the
    per-layer split, and logits must match HF past the window."""

    def test_partial_window_layers_match(self, rng):
        torch.manual_seed(11)
        config = transformers.Qwen2Config(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rms_norm_eps=1e-6, rope_theta=10000.0,
            use_sliding_window=True, sliding_window=8, max_window_layers=2,
            tie_word_embeddings=True, attn_implementation="eager")
        model = transformers.Qwen2ForCausalLM(config).float().eval()
        cfg = llama_config_from_hf(config)
        assert cfg.sliding_window == 8
        assert cfg.sliding_window_layers == (False, False, True, True)
        tokens = rng.integers(0, config.vocab_size, (1, 24))
        ours, _ = _logits_ours(model.state_dict(), config, tokens)
        _agree(ours, _logits_hf(model, tokens), atol=2e-4)


class TestQwen2MoeVsHF:
    """Qwen2-MoE: sparse experts + a sigmoid-gated shared expert,
    UN-renormalized top-k routing, qkv biases — plus per-layer
    dense/sparse mixing via mlp_only_layers."""

    @pytest.fixture(scope="class")
    def hf_model(self):
        torch.manual_seed(12)
        config = transformers.Qwen2MoeConfig(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            rms_norm_eps=1e-6, rope_theta=10000.0,
            num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=48,
            shared_expert_intermediate_size=80,
            norm_topk_prob=False, decoder_sparse_step=1,
            mlp_only_layers=[1],         # layer 1 is a plain dense MLP
            tie_word_embeddings=False, attn_implementation="eager")
        model = transformers.Qwen2MoeForCausalLM(config).float().eval()
        return model, config

    def test_config_mapping(self, hf_model):
        _, config = hf_model
        cfg = llama_config_from_hf(config)
        assert cfg.num_experts == 4
        assert cfg.moe_norm_topk is False
        assert cfg.moe_intermediate_size == 48
        assert cfg.moe_shared_expert_size == 80
        assert cfg.attention_bias is True

    def test_layer_mix_maps(self, hf_model):
        model, config = hf_model
        cfg = llama_config_from_hf(config)
        params = llama_params_from_state_dict(model.state_dict(), cfg,
                                              dtype=jnp.float32)
        assert "moe" in params["layers"][0]
        assert "shared_expert" in params["layers"][0]["moe"]
        assert "moe" not in params["layers"][1]      # mlp_only layer
        assert "gate_proj" in params["layers"][1]

    def test_fp32_logits_match(self, hf_model, rng):
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (2, 12))
        ours, _ = _logits_ours(model.state_dict(), config, tokens)
        _agree(ours, _logits_hf(model, tokens), atol=3e-4)

    def test_engine_decode_matches_hf_generate(self, hf_model, rng):
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        import dataclasses
        model, config = hf_model
        cfg = dataclasses.replace(llama_config_from_hf(config),
                                  dtype=jnp.float32)
        params = llama_params_from_state_dict(model.state_dict(), cfg,
                                              dtype=jnp.float32)
        prompt = list(map(int, rng.integers(0, config.vocab_size, 6)))
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
                pad_token_id=0)
        expect = hf_out[0, len(prompt):].tolist()
        eng = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                           quantized_kv=False)
        got = eng.generate([prompt],
                           SamplingParams(max_new_tokens=8))[0]
        assert got == expect


class TestPhi2VsHF:
    """Phi-2 architecture: LayerNorm, parallel attn+MLP sharing one norm,
    partial rotary (0.5), non-gated gelu MLP with biases, biased lm_head."""

    @pytest.fixture(scope="class")
    def hf_model(self):
        torch.manual_seed(14)
        config = transformers.PhiConfig(
            vocab_size=128, hidden_size=64, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, max_position_embeddings=64,
            layer_norm_eps=1e-5, rope_theta=10000.0,
            partial_rotary_factor=0.5, hidden_act="gelu_new",
            tie_word_embeddings=False, attn_implementation="eager")
        model = transformers.PhiForCausalLM(config).float().eval()
        return model, config

    def test_config_mapping(self, hf_model):
        _, config = hf_model
        cfg = llama_config_from_hf(config)
        assert cfg.norm_type == "layernorm"
        assert cfg.parallel_blocks and not cfg.gated_mlp
        assert cfg.rope_partial_factor == 0.5
        assert cfg.rotary_dim == 8

    def test_fp32_logits_match(self, hf_model, rng):
        model, config = hf_model
        tokens = rng.integers(0, config.vocab_size, (2, 11))
        ours, _ = _logits_ours(model.state_dict(), config, tokens)
        _agree(ours, _logits_hf(model, tokens), atol=2e-4)

    def test_engine_decode_matches_hf_generate(self, hf_model, rng):
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        import dataclasses
        model, config = hf_model
        cfg = dataclasses.replace(llama_config_from_hf(config),
                                  dtype=jnp.float32)
        params = llama_params_from_state_dict(model.state_dict(), cfg,
                                              dtype=jnp.float32)
        prompt = list(map(int, rng.integers(0, config.vocab_size, 5)))
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
                pad_token_id=0)
        expect = hf_out[0, len(prompt):].tolist()
        eng = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                           quantized_kv=False)
        got = eng.generate([prompt], SamplingParams(max_new_tokens=8))[0]
        assert got == expect


class TestStableLMVsHF:
    """StableLM-2: Llama trunk + LayerNorm + partial rotary (0.25)."""

    @pytest.fixture(scope="class")
    def hf_model(self):
        torch.manual_seed(15)
        config = transformers.StableLmConfig(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=64,
            layer_norm_eps=1e-5, rope_theta=10000.0,
            partial_rotary_factor=0.25, use_qkv_bias=True,
            tie_word_embeddings=False, attn_implementation="eager")
        model = transformers.StableLmForCausalLM(config).float().eval()
        return model, config

    def test_fp32_logits_match(self, hf_model, rng):
        model, config = hf_model
        cfg = llama_config_from_hf(config)
        assert cfg.norm_type == "layernorm"
        assert not cfg.parallel_blocks and cfg.gated_mlp
        assert cfg.rope_partial_factor == 0.25
        tokens = rng.integers(0, config.vocab_size, (2, 12))
        ours, _ = _logits_ours(model.state_dict(), config, tokens)
        _agree(ours, _logits_hf(model, tokens), atol=2e-4)

    def test_engine_decode_matches_hf_generate(self, hf_model, rng):
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        import dataclasses
        model, config = hf_model
        cfg = dataclasses.replace(llama_config_from_hf(config),
                                  dtype=jnp.float32)
        params = llama_params_from_state_dict(model.state_dict(), cfg,
                                              dtype=jnp.float32)
        prompt = list(map(int, rng.integers(0, config.vocab_size, 6)))
        with torch.no_grad():
            hf_out = model.generate(
                torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
                pad_token_id=0)
        expect = hf_out[0, len(prompt):].tolist()
        eng = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                           quantized_kv=False)
        got = eng.generate([prompt], SamplingParams(max_new_tokens=8))[0]
        assert got == expect
