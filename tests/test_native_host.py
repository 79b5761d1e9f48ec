"""Differential tests: native C++ host packer vs the jnp oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

import tpu_bitsandbytes.functional as F
from tpu_bitsandbytes.utils import native


class TestHostPacker:
    @pytest.mark.parametrize("quant_type", ["nf4", "fp4"])
    @pytest.mark.parametrize("shape", [(64, 128), (33, 100), (8, 64)])
    def test_matches_jnp_quantizer(self, rng, quant_type, shape):
        W = rng.standard_normal(shape).astype(np.float32)
        packed_c, absmax_c = native.quantize_4bit_host(W, 64, quant_type)
        packed_j, state = F.quantize_4bit(jnp.asarray(W), blocksize=64,
                                          quant_type=quant_type)
        n = shape[0]
        assert np.array_equal(packed_c.reshape(-1), np.asarray(packed_j))
        assert np.allclose(absmax_c.reshape(-1), np.asarray(state.absmax),
                           rtol=1e-6)

    def test_dequantize_roundtrip(self, rng):
        W = rng.standard_normal((32, 256)).astype(np.float32)
        packed, absmax = native.quantize_4bit_host(W)
        Wd = native.dequantize_4bit_host(packed, absmax, 32, 256)
        ref = np.asarray(F.dequantize_4bit(
            jnp.asarray(packed.reshape(-1)),
            absmax=jnp.asarray(absmax.reshape(-1)), blocksize=64), np.float32)
        # flat dequant path reshapes differently; compare against jnp 2D
        packed_j, state = F.quantize_4bit(jnp.asarray(W))
        ref2 = np.asarray(F.dequantize_4bit(packed_j, state), np.float32)
        assert np.allclose(Wd, ref2, atol=1e-6)

    def test_rowwise_matches(self, rng):
        W = rng.standard_normal((16, 64)).astype(np.float32)
        q_c, s_c = native.quantize_rowwise_host(W)
        q_j, s_j = F.quantize_rowwise(jnp.asarray(W))
        assert np.allclose(s_c, np.asarray(s_j), rtol=1e-6)
        # round-half-even vs nearbyint: both banker's rounding
        assert np.array_equal(q_c, np.asarray(q_j))

    def test_native_lib_present(self):
        # the .so is built in-repo; if missing this still passes via fallback
        # but we record availability for debugging
        print("native host lib:", native.has_native_host())


class TestNativeFallback:
    def test_numpy_fallback_matches(self, rng, monkeypatch):
        """With the .so unavailable the numpy fallback must give identical
        results (it is the same math)."""
        from tpu_bitsandbytes.utils import native
        W = rng.standard_normal((16, 128)).astype(np.float32)
        p_native, a_native = native.quantize_4bit_host(W)
        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_LIB_TRIED", True)
        p_fb, a_fb = native.quantize_4bit_host(W)
        assert np.array_equal(p_native, p_fb)
        assert np.allclose(a_native, a_fb, rtol=1e-6)
        d_fb = native.dequantize_4bit_host(p_fb, a_fb, 16, 128)
        assert np.all(np.isfinite(d_fb))
        q_fb, s_fb = native.quantize_rowwise_host(W)
        assert q_fb.dtype == np.int8
