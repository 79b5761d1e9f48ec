"""Config + model-surgery tests (reference: tests/test_hf_compat.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpu_bitsandbytes as tbnb
import tpu_bitsandbytes.nn as nn


class MLP(nn.Module):
    def __init__(self, d=64, key=None):
        key = key or jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        self.fc1 = nn.Linear(d, 2 * d, dtype=jnp.float32, key=k1)
        self.fc2 = nn.Linear(2 * d, d, dtype=jnp.float32, key=k2)
        self.lm_head = nn.Linear(d, 100, dtype=jnp.float32, key=k3)

    def forward(self, x):
        return self.lm_head(self.fc2(jax.nn.relu(self.fc1(x))))


class Nested(nn.Module):
    def __init__(self):
        self.blocks = [MLP(32), MLP(32)]
        self.out = nn.Linear(32, 8, dtype=jnp.float32)

    def forward(self, x):
        for b in self.blocks:
            x = b(x) if False else x
        return self.out(x)


class TestBitsAndBytesConfig:
    def test_defaults(self):
        cfg = tbnb.BitsAndBytesConfig()
        assert not cfg.is_quantizable
        assert cfg.quantization_method == "none"

    def test_4bit_and_8bit_exclusive(self):
        with pytest.raises(ValueError, match="Cannot load in both"):
            tbnb.BitsAndBytesConfig(load_in_4bit=True, load_in_8bit=True)

    def test_bad_quant_type(self):
        with pytest.raises(ValueError, match="bnb_4bit_quant_type"):
            tbnb.BitsAndBytesConfig(bnb_4bit_quant_type="int4")

    def test_dict_roundtrip(self):
        cfg = tbnb.BitsAndBytesConfig(load_in_4bit=True,
                                      bnb_4bit_quant_type="fp4",
                                      bnb_4bit_use_double_quant=True)
        d = cfg.to_dict()
        cfg2 = tbnb.BitsAndBytesConfig.from_dict(d)
        assert cfg2.load_in_4bit
        assert cfg2.bnb_4bit_quant_type == "fp4"
        assert cfg2.bnb_4bit_use_double_quant

    def test_from_dict_dtype_strings(self):
        cfg = tbnb.BitsAndBytesConfig.from_dict(
            {"bnb_4bit_compute_dtype": "torch.float16"})
        assert cfg.bnb_4bit_compute_dtype == jnp.float16
        cfg = tbnb.BitsAndBytesConfig.from_dict(
            {"bnb_4bit_compute_dtype": "bfloat16"})
        assert cfg.bnb_4bit_compute_dtype == jnp.bfloat16

    def test_quantization_method(self):
        assert tbnb.BitsAndBytesConfig(
            load_in_4bit=True).quantization_method == "bitsandbytes_4bit"
        assert tbnb.BitsAndBytesConfig(
            load_in_8bit=True).quantization_method == "bitsandbytes_8bit"


class TestModelSurgery:
    def test_replace_all_linears_4bit(self):
        m = MLP()
        cfg = tbnb.BitsAndBytesConfig(load_in_4bit=True)
        m = tbnb.quantize_model(m, cfg)
        assert isinstance(m.fc1, tbnb.Linear4bit)
        assert isinstance(m.fc2, tbnb.Linear4bit)
        assert isinstance(m.lm_head, tbnb.Linear4bit)

    def test_skip_list_substring_match(self):
        m = MLP()
        cfg = tbnb.BitsAndBytesConfig(load_in_4bit=True)
        m = tbnb.quantize_model(m, cfg, modules_to_not_convert=["lm_head"])
        assert isinstance(m.fc1, tbnb.Linear4bit)
        assert isinstance(m.lm_head, nn.Linear)

    def test_recursive_replacement_in_lists(self):
        m = Nested()
        cfg = tbnb.BitsAndBytesConfig(load_in_4bit=True)
        m = tbnb.quantize_model(m, cfg)
        assert isinstance(m.blocks[0].fc1, tbnb.Linear4bit)
        assert isinstance(m.blocks[1].fc2, tbnb.Linear4bit)
        assert isinstance(m.out, tbnb.Linear4bit)

    def test_8bit_replacement_uses_skip_modules(self):
        m = MLP()
        cfg = tbnb.BitsAndBytesConfig(load_in_8bit=True,
                                      llm_int8_skip_modules=["lm_head"])
        m = tbnb.quantize_model(m, cfg)
        assert isinstance(m.fc1, tbnb.Linear8bit)
        assert isinstance(m.lm_head, nn.Linear)

    def test_quantized_model_still_runs(self, rng):
        m = MLP()
        x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
        ref = np.asarray(m(x), np.float32)
        cfg = tbnb.BitsAndBytesConfig(load_in_4bit=True,
                                      bnb_4bit_compute_dtype=jnp.float32)
        mq = tbnb.quantize_model(m, cfg)
        out = np.asarray(mq(x), np.float32)
        c = (out.ravel() @ ref.ravel()) / (
            np.linalg.norm(out) * np.linalg.norm(ref) + 1e-9)
        assert c > 0.95

    def test_double_quant_honored(self):
        m = MLP()
        cfg = tbnb.BitsAndBytesConfig(load_in_4bit=True,
                                      bnb_4bit_use_double_quant=True)
        m = tbnb.quantize_model(m, cfg)
        assert m.fc1.weight_quant_state.state2 is not None

    def test_flags_convenience(self):
        m = MLP()
        m = tbnb.quantize_model(m, load_in_8bit=True)
        assert isinstance(m.fc1, tbnb.Linear8bit)


class TestMemoryFootprint:
    def test_savings(self):
        m = MLP(128)
        before = tbnb.get_memory_footprint(m)
        mq = tbnb.quantize_model(m, tbnb.BitsAndBytesConfig(load_in_4bit=True))
        after = tbnb.get_memory_footprint(mq)
        assert after["actual_size_gb"] < before["actual_size_gb"] / 3
        assert after["savings_pct"] > 40


class TestTorchModelSurgery:
    """quantize_model over a real torch.nn.Module tree (the reference's
    native habitat, integration.py:108-196): torch Linears become
    TPU-backed adapter modules (nn/torch_compat.py) and the torch forward
    keeps working — previously this silently returned the model unchanged."""

    def _torch_mlp(self):
        import torch
        torch.manual_seed(0)
        return torch.nn.Sequential(
            torch.nn.Linear(64, 128), torch.nn.ReLU(),
            torch.nn.Linear(128, 32))

    def test_torch_linears_are_converted(self):
        import torch
        m = self._torch_mlp()
        x = torch.randn(4, 64)
        ref = m(x).detach().numpy()
        qm = tbnb.quantize_model(m, tbnb.BitsAndBytesConfig(load_in_4bit=True))
        assert not isinstance(qm[0], torch.nn.Linear)
        assert qm[0].__class__.__name__ == "TorchQuantLinear"
        out = qm(x).detach().numpy()
        cos = float((ref * out).sum()
                    / (np.linalg.norm(ref) * np.linalg.norm(out) + 1e-9))
        assert cos > 0.98          # NF4 noise, not identity
        assert not np.allclose(ref, out)   # ...but it DID quantize

    def test_torch_8bit_and_skip_list(self):
        import torch

        class Net(torch.nn.Module):
            def __init__(self):
                super().__init__()
                torch.manual_seed(1)
                self.proj = torch.nn.Linear(32, 32)
                self.lm_head = torch.nn.Linear(32, 16)

            def forward(self, x):
                return self.lm_head(self.proj(x))

        m = tbnb.quantize_model(Net(), tbnb.BitsAndBytesConfig(
            load_in_8bit=True, llm_int8_skip_modules=["lm_head"]))
        assert m.proj.__class__.__name__ == "TorchQuantLinear"
        assert isinstance(m.lm_head, torch.nn.Linear)
        x = torch.randn(2, 32)
        assert m(x).shape == (2, 16)

    def test_torch_memory_footprint(self):
        m = self._torch_mlp()
        before = tbnb.get_memory_footprint(m)
        qm = tbnb.quantize_model(m, tbnb.BitsAndBytesConfig(load_in_4bit=True))
        after = tbnb.get_memory_footprint(qm)
        assert after["quantized_params"] > 0
        assert after["actual_size_gb"] < before["actual_size_gb"]


class TestPatchTransformers:
    """The reference ships _patch_transformers permanently disabled
    (integration.py:331); here it is a working opt-in."""

    def test_patch_roundtrip_tiny_llama(self, tmp_path):
        transformers = pytest.importorskip("transformers")
        import torch
        cfg = transformers.LlamaConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=2,
            num_key_value_heads=2, max_position_embeddings=64)
        torch.manual_seed(0)
        model = transformers.LlamaForCausalLM(cfg)
        model.save_pretrained(str(tmp_path / "tiny"))
        try:
            assert tbnb.patch_transformers()
            qm = transformers.LlamaForCausalLM.from_pretrained(
                str(tmp_path / "tiny"),
                quantization_config=tbnb.BitsAndBytesConfig(
                    load_in_4bit=True))
        finally:
            tbnb.unpatch_transformers()
        qp = qm.model.layers[0].self_attn.q_proj
        assert qp.__class__.__name__ == "TorchQuantLinear"
        # lm_head stays full precision (default skip)
        assert isinstance(qm.lm_head, torch.nn.Linear)
        ids = torch.randint(0, 128, (1, 8))
        out = qm(ids).logits
        assert out.shape == (1, 8, 128)
        assert torch.isfinite(out).all()

    def test_unpatched_is_untouched(self, tmp_path):
        transformers = pytest.importorskip("transformers")
        orig = transformers.modeling_utils.PreTrainedModel.from_pretrained
        assert tbnb.patch_transformers()
        tbnb.unpatch_transformers()
        now = transformers.modeling_utils.PreTrainedModel.from_pretrained
        assert now.__func__ is orig.__func__
