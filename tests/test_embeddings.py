"""Quantized embedding tests (reference: tests/test_embeddings.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpu_bitsandbytes as tbnb
import tpu_bitsandbytes.nn as nn
import tpu_bitsandbytes.functional as F


def make_embedding(rng, v=500, d=128, padding_idx=None):
    src = nn.Embedding(v, d, padding_idx=padding_idx, dtype=jnp.float32,
                       key=jax.random.PRNGKey(1))
    src.weight = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32))
    return src


class TestEmbedding4bit:
    def test_forward_accuracy(self, rng):
        src = make_embedding(rng)
        e4 = tbnb.Embedding4bit.from_embedding(src)
        ids = jnp.asarray(rng.integers(0, 500, (2, 7)))
        out = np.asarray(e4(ids), np.float32)
        ref = np.asarray(src(ids), np.float32)
        rel = np.abs(out - ref).mean() / np.abs(ref).mean()
        assert rel < 0.2  # reference threshold (:64-65)

    def test_differential_vs_functional(self, rng):
        """Gather-dequant must equal row-by-row dequantize_4bit (the
        native-vs-fallback oracle pattern, reference :199-284)."""
        src = make_embedding(rng, v=50, d=64)
        e4 = tbnb.Embedding4bit.from_embedding(src)
        ids = np.arange(50)
        out = np.asarray(e4(jnp.asarray(ids)), np.float32)
        packed, state = F.quantize_4bit(src.weight, blocksize=64)
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        assert np.abs(out - Wd).max() < 2e-2

    def test_padding_idx(self, rng):
        src = make_embedding(rng, padding_idx=3)
        e4 = tbnb.Embedding4bit.from_embedding(src)
        out = np.asarray(e4(jnp.asarray([1, 3, 5])), np.float32)
        assert np.allclose(out[1], 0.0)
        assert not np.allclose(out[0], 0.0)

    def test_odd_dim_padded(self, rng):
        src = make_embedding(rng, v=20, d=65)
        e4 = tbnb.Embedding4bit.from_embedding(src)
        assert e4.embedding_dim == 66      # padded storage
        out = e4(jnp.asarray([0, 1]))
        assert out.shape == (2, 65)        # logical output width preserved
        ref = np.asarray(src(jnp.asarray([0, 1])), np.float32)
        rel = np.abs(np.asarray(out, np.float32) - ref).mean() / np.abs(ref).mean()
        assert rel < 0.2

    def test_constructor_validation(self):
        with pytest.raises(ValueError, match="must be even"):
            tbnb.Embedding4bit(10, 65)
        with pytest.raises(ValueError, match="quant_type"):
            tbnb.Embedding4bit(10, 64, quant_type="int8")

    def test_aliases(self, rng):
        src = make_embedding(rng, v=20, d=64)
        nf4 = tbnb.EmbeddingNF4.from_embedding(src)
        fp4 = tbnb.EmbeddingFP4.from_embedding(src)
        assert nf4.quant_type == "nf4"
        assert fp4.quant_type == "fp4"
        assert isinstance(nf4, tbnb.Embedding4bit)


class TestEmbedding8bit:
    def test_forward_accuracy(self, rng):
        src = make_embedding(rng)
        e8 = tbnb.Embedding8bit.from_embedding(src)
        ids = jnp.asarray(rng.integers(0, 500, (4, 5)))
        out = np.asarray(e8(ids), np.float32)
        ref = np.asarray(src(ids), np.float32)
        rel = np.abs(out - ref).mean() / np.abs(ref).mean()
        assert rel < 0.05

    def test_differential_vs_rowwise(self, rng):
        src = make_embedding(rng, v=30, d=64)
        e8 = tbnb.Embedding8bit.from_embedding(src)
        ids = np.arange(30)
        out = np.asarray(e8(jnp.asarray(ids)), np.float32)
        ref = np.asarray(F.dequantize_rowwise(
            e8.weight_int8, e8.weight_scales, jnp.float32))
        # module computes in its storage dtype (bf16 for f32 sources)
        assert np.abs(out - ref).max() < 1e-2

    def test_padding_idx(self, rng):
        src = make_embedding(rng, padding_idx=0)
        e8 = tbnb.Embedding8bit.from_embedding(src)
        out = np.asarray(e8(jnp.asarray([0, 2])), np.float32)
        assert np.allclose(out[0], 0.0)
