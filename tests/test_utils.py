"""Checkpoint, metrics, and HF-conversion utility tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_bitsandbytes.models import llama
from tpu_bitsandbytes.utils import (
    save_checkpoint, load_checkpoint, load_quantized,
    matmul4bit_bytes, MetricsLogger,
    llama_config_from_hf, llama_params_from_state_dict,
)


@pytest.fixture
def tiny(rng):
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


class TestCheckpoint:
    def test_quantized_roundtrip(self, tiny, tmp_path, rng):
        cfg, params = tiny
        qparams = llama.quantize_params(params, dtype=jnp.float32)
        path = os.path.join(tmp_path, "ckpt.npz")
        save_checkpoint(path, qparams)
        restored = load_checkpoint(path)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6)))
        l1 = np.asarray(llama.forward(qparams, tokens, cfg), np.float32)
        l2 = np.asarray(llama.forward(restored, tokens, cfg), np.float32)
        assert np.allclose(l1, l2, atol=1e-5)

    def test_double_quant_state_roundtrip(self, tmp_path, rng):
        import tpu_bitsandbytes.functional as F
        W = rng.standard_normal((32, 128)).astype(np.float32)
        packed, st = F.quantize_4bit(jnp.asarray(W), compress_statistics=True)
        path = os.path.join(tmp_path, "qs.npz")
        save_checkpoint(path, {"packed": packed, "state": st})
        r = load_checkpoint(path)
        w1 = np.asarray(F.dequantize_4bit(packed, st))
        w2 = np.asarray(F.dequantize_4bit(r["packed"], r["state"]))
        assert np.array_equal(w1, w2)

    def test_bf16_preserved(self, tmp_path):
        x = jnp.asarray([1.5, -2.25], jnp.bfloat16)
        path = os.path.join(tmp_path, "bf16.npz")
        save_checkpoint(path, {"x": x})
        r = load_checkpoint(path)
        assert r["x"].dtype == jnp.bfloat16
        assert np.array_equal(np.asarray(r["x"], np.float32),
                              np.asarray(x, np.float32))

    def test_requantize_on_load(self, tiny, tmp_path, rng):
        cfg, params = tiny
        path = os.path.join(tmp_path, "fp.npz")
        save_checkpoint(path, params)
        q = load_quantized(path)
        assert hasattr(q["layers"][0]["q_proj"], "packed")
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 5)))
        out = llama.forward(q, tokens, cfg)
        assert np.all(np.isfinite(np.asarray(out, np.float32)))

    def test_lora_roundtrip(self, tiny, tmp_path):
        cfg, params = tiny
        from tpu_bitsandbytes.models.lora import attach_lora
        qp = llama.quantize_params(params, dtype=jnp.float32)
        lp = attach_lora(qp, jax.random.PRNGKey(1), rank=4, dtype=jnp.float32)
        path = os.path.join(tmp_path, "lora.npz")
        save_checkpoint(path, lp)
        r = load_checkpoint(path)
        assert r["layers"][0]["q_proj"].lora_A.shape == (4, cfg.hidden_size)


class TestMetrics:
    def test_matmul_bytes(self):
        b = matmul4bit_bytes(4096, 4096, m=1)
        assert b > 4096 * 4096 // 2
        assert b < 4096 * 4096

    def test_logger(self):
        log = MetricsLogger()
        for _ in range(5):
            log.record(tokens=8, wall_s=0.01)
        s = log.summary()
        assert s["steps"] == 5
        assert abs(s["tokens_per_s"] - 800) < 1


class TestHFConversion:
    def _fake_state_dict(self, cfg):
        rng = np.random.default_rng(0)
        sd = {}
        h, hd = cfg.hidden_size, cfg.hd
        nq, nkv = cfg.num_heads * hd, cfg.num_kv_heads * hd
        def w(shape):
            return rng.standard_normal(shape).astype(np.float32) * 0.02
        sd["model.embed_tokens.weight"] = w((cfg.vocab_size, h))
        for li in range(cfg.num_layers):
            p = f"model.layers.{li}."
            sd[p + "self_attn.q_proj.weight"] = w((nq, h))
            sd[p + "self_attn.k_proj.weight"] = w((nkv, h))
            sd[p + "self_attn.v_proj.weight"] = w((nkv, h))
            sd[p + "self_attn.o_proj.weight"] = w((h, nq))
            sd[p + "mlp.gate_proj.weight"] = w((cfg.intermediate_size, h))
            sd[p + "mlp.up_proj.weight"] = w((cfg.intermediate_size, h))
            sd[p + "mlp.down_proj.weight"] = w((h, cfg.intermediate_size))
            sd[p + "input_layernorm.weight"] = np.ones(h, np.float32)
            sd[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        sd["model.norm.weight"] = np.ones(h, np.float32)
        sd["lm_head.weight"] = w((cfg.vocab_size, h))
        return sd

    def test_config_mapping(self):
        cfg = llama_config_from_hf({
            "vocab_size": 32000, "hidden_size": 4096,
            "intermediate_size": 11008, "num_hidden_layers": 32,
            "num_attention_heads": 32, "num_key_value_heads": 32,
            "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
            "max_position_embeddings": 4096})
        assert cfg.hidden_size == 4096
        assert cfg.num_kv_heads == 32
        assert cfg.max_seq_len == 4096

    def test_state_dict_conversion_fp_and_quantized(self, rng):
        cfg = llama.LlamaConfig.tiny()
        sd = self._fake_state_dict(cfg)
        params_fp = llama_params_from_state_dict(sd, cfg, dtype=jnp.float32)
        params_q = llama_params_from_state_dict(sd, cfg, dtype=jnp.float32,
                                                quantize=True)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6)))
        lf = np.asarray(llama.forward(params_fp, tokens, cfg), np.float32)
        lq = np.asarray(llama.forward(params_q, tokens, cfg), np.float32)
        c = (lf.ravel() @ lq.ravel()) / (
            np.linalg.norm(lf) * np.linalg.norm(lq) + 1e-9)
        assert c > 0.95


class TestGPT2Conversion:
    def test_gpt2_state_dict_conversion(self, rng):
        from tpu_bitsandbytes.models.gpt2 import GPT2Config
        from tpu_bitsandbytes.utils import gpt2_params_from_state_dict
        cfg = GPT2Config.tiny()
        e = cfg.n_embd
        sd = {}
        sd["transformer.wte.weight"] = rng.standard_normal(
            (cfg.vocab_size, e)).astype(np.float32) * 0.02
        sd["transformer.wpe.weight"] = rng.standard_normal(
            (cfg.n_positions, e)).astype(np.float32) * 0.02
        for li in range(cfg.n_layer):
            p = f"transformer.h.{li}."
            sd[p + "ln_1.weight"] = np.ones(e, np.float32)
            sd[p + "ln_1.bias"] = np.zeros(e, np.float32)
            sd[p + "ln_2.weight"] = np.ones(e, np.float32)
            sd[p + "ln_2.bias"] = np.zeros(e, np.float32)
            # HF Conv1D: [in, out]
            sd[p + "attn.c_attn.weight"] = rng.standard_normal(
                (e, 3 * e)).astype(np.float32) * 0.02
            sd[p + "attn.c_attn.bias"] = np.zeros(3 * e, np.float32)
            sd[p + "attn.c_proj.weight"] = rng.standard_normal(
                (e, e)).astype(np.float32) * 0.02
            sd[p + "attn.c_proj.bias"] = np.zeros(e, np.float32)
            sd[p + "mlp.c_fc.weight"] = rng.standard_normal(
                (e, 4 * e)).astype(np.float32) * 0.02
            sd[p + "mlp.c_fc.bias"] = np.zeros(4 * e, np.float32)
            sd[p + "mlp.c_proj.weight"] = rng.standard_normal(
                (4 * e, e)).astype(np.float32) * 0.02
            sd[p + "mlp.c_proj.bias"] = np.zeros(e, np.float32)
        sd["transformer.ln_f.weight"] = np.ones(e, np.float32)
        sd["transformer.ln_f.bias"] = np.zeros(e, np.float32)
        model = gpt2_params_from_state_dict(sd, cfg, dtype=jnp.float32)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)))
        out = model(ids)
        assert out.shape == (1, 8, cfg.vocab_size)
        assert np.all(np.isfinite(np.asarray(out, np.float32)))
        # tied head: lm_head falls back to wte
        assert np.array_equal(np.asarray(model.lm_head.weight),
                              np.asarray(model.wte.weight))


class TestPodMesh:
    def test_make_pod_mesh_shapes(self):
        from tpu_bitsandbytes.parallel import make_pod_mesh
        import jax
        n = len(jax.devices())
        mesh = make_pod_mesh(tp=n, dp=1)
        assert mesh.shape == {"dp": 1, "tp": n}
        if n % 2 == 0:
            mesh = make_pod_mesh(tp=n // 2, dp=2)
            assert mesh.shape == {"dp": 2, "tp": n // 2}
