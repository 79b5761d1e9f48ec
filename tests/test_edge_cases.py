"""Edge-case / robustness suite (reference: tests/test_edge_cases.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

import tpu_bitsandbytes as tbnb
import tpu_bitsandbytes.functional as F


class TestExtremeValues:
    def test_all_zeros(self):
        W = jnp.zeros((16, 64))
        packed, state = F.quantize_4bit(W)
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        assert np.allclose(Wd, 0.0, atol=1e-7)

    def test_denormal_inputs(self):
        W = jnp.full((8, 64), 1e-38)
        packed, state = F.quantize_4bit(W)
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        assert np.all(np.isfinite(Wd))

    def test_large_values(self):
        W = jnp.full((8, 64), 6.0e4)
        packed, state = F.quantize_4bit(W)
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        assert np.allclose(Wd, 6.0e4, rtol=1e-2)

    def test_mixed_magnitudes(self, rng):
        W = rng.standard_normal((16, 128)).astype(np.float32)
        W[:, 0] = 1e4  # one huge column
        packed, state = F.quantize_4bit(jnp.asarray(W))
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        assert np.all(np.isfinite(Wd))
        assert np.allclose(Wd[:, 0], 1e4, rtol=0.05)

    def test_repeated_matmul_no_nan(self, rng):
        """Reference NaN stress (:234-252)."""
        W = rng.standard_normal((64, 64)).astype(np.float32) * 0.1
        packed, state = F.quantize_4bit(jnp.asarray(W))
        x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
        for _ in range(10):
            x = F.matmul_4bit(x, packed, state)
            x = x / (jnp.abs(x).max() + 1e-6)
        assert np.all(np.isfinite(np.asarray(x, np.float32)))


class TestUnusualShapes:
    @pytest.mark.parametrize("shape", [(1, 64), (64, 2), (3, 7), (1, 1),
                                       (13, 17), (128, 1)])
    def test_roundtrip_shapes(self, rng, shape):
        W = rng.standard_normal(shape).astype(np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(W))
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        assert Wd.shape == shape
        assert np.all(np.isfinite(Wd))

    @pytest.mark.parametrize("blocksize", [32, 64, 128, 256, 512, 1024])
    def test_blocksize_sweep(self, rng, blocksize):
        """Reference blocksize sweep (:216-224)."""
        W = rng.standard_normal((8, 2048)).astype(np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(W), blocksize=blocksize)
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        assert np.abs(Wd - W).mean() / np.abs(W).mean() < 0.3

    def test_absmax_shape_consistency(self, rng):
        """Reference absmax consistency (:287-306)."""
        for n, k, bs in [(8, 128, 64), (16, 100, 64), (4, 64, 32)]:
            W = rng.standard_normal((n, k)).astype(np.float32)
            packed, state = F.quantize_4bit(jnp.asarray(W), blocksize=bs)
            k_padded = F._pad_k(k, bs)
            assert state.absmax.size == n * (k_padded // bs)
            assert packed.size == n * k_padded // 2


class TestBiasDtypes:
    def test_bias_not_silently_ignored(self, rng):
        """Reference (:77-100)."""
        W = rng.standard_normal((32, 64)).astype(np.float32)
        bias = np.full(32, 7.0, np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(W))
        x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
        y_b = np.asarray(F.matmul_4bit(x, packed, state, bias=jnp.asarray(bias)),
                         np.float32)
        y = np.asarray(F.matmul_4bit(x, packed, state), np.float32)
        assert np.abs((y_b - y) - 7.0).max() < 1e-2

    @pytest.mark.parametrize("bias_dtype", [jnp.float32, jnp.bfloat16,
                                            jnp.float16])
    def test_bias_dtype_mismatch_ok(self, rng, bias_dtype):
        W = rng.standard_normal((16, 64)).astype(np.float32)
        packed, state = F.quantize_4bit(jnp.asarray(W))
        x = jnp.ones((2, 64), jnp.float32)
        bias = jnp.ones((16,), bias_dtype)
        y = F.matmul_4bit(x, packed, state, bias=bias)
        assert np.all(np.isfinite(np.asarray(y, np.float32)))


class TestNumelGuard:
    def test_numel_guard_message(self):
        class FakeBig:
            pass
        # construct a tiny array but test validation via monkeypatched size
        # (a real 2^31 tensor is too big for CI) — call the validator directly
        import types
        fake = types.SimpleNamespace(size=2**31)
        with pytest.raises(ValueError, match="Tensor too large"):
            F._validate_numel(fake)
