"""Core NF4/FP4 contract tests.

Mirrors the reference suite tests/test_nf4.py: statistical tolerances
(normalized MAE < 0.25, matmul cosine similarity > 0.9), packing layout,
validation errors, and QuantState serialization.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpu_bitsandbytes as tbnb
import tpu_bitsandbytes.functional as F


def _cossim(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


class TestQuantizeDequantize:
    @pytest.mark.parametrize("quant_type", ["nf4", "fp4"])
    def test_roundtrip_2d(self, rng, quant_type):
        W = rng.standard_normal((128, 256)).astype(np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(W), quant_type=quant_type)
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        assert Wd.shape == W.shape
        nmae = np.abs(Wd - W).mean() / np.abs(W).mean()
        assert nmae < 0.25  # reference threshold (tests/test_nf4.py:54-60)

    def test_packed_size_and_dtype(self, rng):
        W = rng.standard_normal((64, 128)).astype(np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(W))
        assert packed.dtype == jnp.uint8
        assert packed.size == 64 * 128 // 2
        assert state.absmax.size == 64 * (128 // 64)
        assert tuple(state.shape) == (64, 128)

    def test_k_padding_rule(self, rng):
        # K=100 with blocksize 64 -> K_padded = 128 (functional.py:218-222)
        W = rng.standard_normal((8, 100)).astype(np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(W), blocksize=64)
        assert packed.size == 8 * 128 // 2
        Wd = np.asarray(F.dequantize_4bit(packed, state))
        assert Wd.shape == (8, 100)

    def test_flat_path_roundtrip(self, rng):
        x = rng.standard_normal((3, 5, 7)).astype(np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(x))
        xd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        assert xd.shape == x.shape
        assert np.abs(xd - x).mean() / np.abs(x).mean() < 0.25

    def test_nibble_packing_layout(self):
        # Element 2j in the low nibble, 2j+1 in the high nibble.
        W = np.array([[1.0, -1.0] * 32], dtype=np.float32)  # one block
        packed, state = F.quantize_4bit(jnp.asarray(W), blocksize=64)
        b = np.asarray(packed)
        # +1 -> code 15 (nf4 max), -1 -> code 0
        assert np.all(b == (15 | (0 << 4)))

    def test_absmax_clamp(self):
        W = np.zeros((8, 64), dtype=np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(W))
        assert np.all(np.asarray(state.absmax) == 1e-8)
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        # code for 0.0 is exact in nf4 -> perfect zeros
        assert np.allclose(Wd, 0.0, atol=1e-7)

    def test_preserves_dtype(self, rng):
        W = rng.standard_normal((16, 64)).astype(np.float32)
        for dt in [jnp.float32, jnp.bfloat16, jnp.float16]:
            packed, state = F.quantize_4bit(jnp.asarray(W, dtype=dt))
            assert state.dtype == jnp.dtype(dt)
            assert F.dequantize_4bit(packed, state).dtype == jnp.dtype(dt)


class TestValidation:
    def test_bad_quant_type(self, rng):
        with pytest.raises(ValueError, match="quant_type must be"):
            F.quantize_4bit(jnp.zeros((4, 4)), quant_type="int3")

    @pytest.mark.parametrize("bs,msg", [
        (0, "must be positive"),
        (-64, "must be positive"),
        (131072, "too large"),
        (48, "power of 2"),
    ])
    def test_bad_blocksize(self, bs, msg):
        with pytest.raises(ValueError, match=msg):
            F.quantize_4bit(jnp.zeros((4, 4)), blocksize=bs)

    def test_dequantize_needs_state_or_absmax(self):
        with pytest.raises(ValueError, match="quant_state or absmax"):
            F.dequantize_4bit(jnp.zeros(8, dtype=jnp.uint8))


class TestDoubleQuant:
    def test_compress_statistics(self, rng):
        W = rng.standard_normal((64, 256)).astype(np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(W), compress_statistics=True)
        assert state.state2 is not None
        assert state.absmax.dtype == jnp.int8
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        # reference: rel err < 0.20 with double quant on
        assert np.abs(Wd - W).mean() / np.abs(W).mean() < 0.20

    def test_double_quant_memory_win(self, rng):
        W = rng.standard_normal((64, 4096)).astype(np.float32)
        _, st_off = F.quantize_4bit(jnp.asarray(W))
        _, st_on = F.quantize_4bit(jnp.asarray(W), compress_statistics=True)
        bytes_off = st_off.absmax.size * 4
        bytes_on = (st_on.absmax.size * 1
                    + st_on.state2.absmax.size * 4)
        assert bytes_on < bytes_off / 2


class TestMatmul:
    @pytest.mark.parametrize("quant_type", ["nf4", "fp4"])
    def test_matmul_cossim(self, rng, quant_type):
        W = rng.standard_normal((128, 256)).astype(np.float32)
        x = rng.standard_normal((4, 256)).astype(np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(W), quant_type=quant_type)
        y = np.asarray(F.matmul_4bit(jnp.asarray(x), packed, state), np.float32)
        y_ref = x @ W.T
        assert _cossim(y, y_ref) > 0.9  # reference tests/test_nf4.py:153-163

    def test_matmul_batched_input(self, rng):
        W = rng.standard_normal((32, 64)).astype(np.float32)
        x = rng.standard_normal((2, 3, 64)).astype(np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(W))
        y = F.matmul_4bit(jnp.asarray(x), packed, state)
        assert y.shape == (2, 3, 32)

    def test_matmul_bias(self, rng):
        W = rng.standard_normal((32, 64)).astype(np.float32)
        x = rng.standard_normal((4, 64)).astype(np.float32)
        bias = rng.standard_normal(32).astype(np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(W))
        y = np.asarray(F.matmul_4bit(jnp.asarray(x), packed, state,
                                     bias=jnp.asarray(bias)), np.float32)
        y_nobias = np.asarray(F.matmul_4bit(jnp.asarray(x), packed, state),
                              np.float32)
        assert np.allclose(y - y_nobias, bias[None, :], atol=1e-2)

    def test_aliases(self, rng):
        W = rng.standard_normal((16, 64)).astype(np.float32)
        p1, s1 = F.quantize_nf4(jnp.asarray(W))
        p2, s2 = F.quantize_4bit(jnp.asarray(W), quant_type="nf4")
        assert np.array_equal(np.asarray(p1), np.asarray(p2))
        d1 = F.dequantize_nf4(p1, s1)
        assert np.array_equal(np.asarray(d1), np.asarray(F.dequantize_4bit(p2, s2)))
        p3, s3 = F.quantize_fp4(jnp.asarray(W))
        assert s3.quant_type == "fp4"


class TestQuantState:
    def test_dict_roundtrip(self, rng):
        W = rng.standard_normal((32, 128)).astype(np.float32)
        _, state = F.quantize_4bit(jnp.asarray(W), compress_statistics=True)
        d = state.as_dict()
        state2 = F.QuantState.from_dict(d)
        assert tuple(state2.shape) == tuple(state.shape)
        assert state2.blocksize == state.blocksize
        assert state2.quant_type == state.quant_type
        assert state2.state2 is not None
        assert np.array_equal(np.asarray(state2.absmax), np.asarray(state.absmax))

    def test_pytree(self, rng):
        W = rng.standard_normal((16, 64)).astype(np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(W))

        @jax.jit
        def dequant(p, st):
            return F.dequantize_4bit(p, st)

        out = dequant(packed, state)
        assert np.array_equal(np.asarray(out),
                              np.asarray(F.dequantize_4bit(packed, state)))

    def test_codebooks_exported(self):
        assert tbnb.NF4_CODEBOOK.shape == (16,)
        assert tbnb.FP4_CODEBOOK.shape == (16,)
        assert np.isclose(float(tbnb.NF4_CODEBOOK[0]), -1.0)
        assert np.isclose(float(tbnb.NF4_CODEBOOK[7]), 0.0)
        assert np.isclose(float(tbnb.NF4_CODEBOOK[15]), 1.0)
        assert np.array_equal(np.asarray(tbnb.create_normal_map()),
                              np.asarray(tbnb.NF4_CODEBOOK))


class TestMemorySavings:
    def test_footprint_accounting(self, rng):
        import tpu_bitsandbytes.nn as nn
        m = nn.Linear(256, 256, dtype=jnp.float32)
        q = tbnb.Linear4bit.from_linear(m)
        info = tbnb.get_memory_footprint(q)
        assert info["total_params"] > 0
        assert info["savings_pct"] > 30
