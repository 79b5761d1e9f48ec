"""FP4 / FP8 / API-surface tests (reference: tests/test_fp4_fp8_double.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

import tpu_bitsandbytes as tbnb
import tpu_bitsandbytes.functional as F


def _cossim(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


class TestFP4:
    def test_codebook_values(self):
        cb = np.asarray(F.FP4_CODEBOOK)
        assert cb[0] == 0.0
        assert cb[7] == 1.0
        assert cb[15] == -1.0

    def test_roundtrip(self, rng):
        W = rng.standard_normal((64, 128)).astype(np.float32)
        packed, state = F.quantize_fp4(jnp.asarray(W))
        Wd = np.asarray(F.dequantize_fp4(packed, state), np.float32)
        assert _cossim(Wd, W) > 0.9


class TestFP8E4M3:
    def test_roundtrip_cossim(self, rng):
        W = rng.standard_normal((64, 128)).astype(np.float32)
        q, scales = F.quantize_fp8_e4m3(jnp.asarray(W))
        assert q.dtype == jnp.uint8
        assert scales.shape == (64,)
        Wd = np.asarray(F.dequantize_fp8_e4m3(q, scales, jnp.float32))
        assert _cossim(Wd, W) > 0.95  # reference threshold (:100-107)

    def test_requires_2d(self):
        with pytest.raises(ValueError, match="must be 2D"):
            F.quantize_fp8_e4m3(jnp.zeros(16))

    def test_exact_encode_values(self):
        # values exactly representable in e4m3 must round-trip bit-exactly
        vals = np.array([[1.0, 2.0, 0.5, 448.0, -448.0, 0.0, 1.5, -3.5]],
                        np.float32)
        q, scales = F.quantize_fp8_e4m3(jnp.asarray(vals))
        Wd = np.asarray(F.dequantize_fp8_e4m3(q, scales, jnp.float32))
        # scale = 448/448 = 1 -> all values exact
        assert np.allclose(Wd, vals, rtol=1e-6)

    def test_nan_encodes_to_0x7f(self):
        vals = np.array([[np.nan, 1.0, 448.0, 4.0]], np.float32)
        q, _ = F.quantize_fp8_e4m3(jnp.asarray(vals))
        assert np.asarray(q)[0, 0] == 0x7F

    def test_matmul(self, rng):
        W = rng.standard_normal((32, 64)).astype(np.float32)
        x = rng.standard_normal((4, 64)).astype(np.float32)
        q, scales = F.quantize_fp8_e4m3(jnp.asarray(W))
        y = np.asarray(F.matmul_fp8_e4m3(jnp.asarray(x), q, scales,
                                         dtype=jnp.float32))
        assert _cossim(y, x @ W.T) > 0.95

    def test_matmul_1d_input(self, rng):
        W = rng.standard_normal((32, 64)).astype(np.float32)
        x = rng.standard_normal(64).astype(np.float32)
        q, scales = F.quantize_fp8_e4m3(jnp.asarray(W))
        y = F.matmul_fp8_e4m3(jnp.asarray(x), q, scales, dtype=jnp.float32)
        assert y.shape == (32,)

    def test_fused_matmul_matches_dequant(self, rng):
        """The fused convert-in-dot matmul must match explicitly
        dequantizing the weight then GEMMing (the reference fallback,
        functional.py:796-807)."""
        W = rng.standard_normal((32, 64)).astype(np.float32)
        x = rng.standard_normal((4, 64)).astype(np.float32)
        q, scales = F.quantize_fp8_e4m3(jnp.asarray(W))
        fused = np.asarray(F.matmul_fp8_e4m3(jnp.asarray(x), q, scales,
                                             dtype=jnp.float32))
        Wd = np.asarray(F.dequantize_fp8_e4m3(q, scales, jnp.float32))
        ref = x @ Wd.T
        assert np.abs(fused - ref).max() < 1e-3 * np.abs(ref).max()

    def test_matmul_bias_and_3d(self, rng):
        W = rng.standard_normal((32, 64)).astype(np.float32)
        x = rng.standard_normal((2, 3, 64)).astype(np.float32)
        b = rng.standard_normal(32).astype(np.float32)
        q, scales = F.quantize_fp8_e4m3(jnp.asarray(W))
        y = F.matmul_fp8_e4m3(jnp.asarray(x), q, scales,
                              bias=jnp.asarray(b), dtype=jnp.float32)
        assert y.shape == (2, 3, 32)
        Wd = np.asarray(F.dequantize_fp8_e4m3(q, scales, jnp.float32))
        ref = x @ Wd.T + b
        assert np.abs(np.asarray(y) - ref).max() < 1e-3 * np.abs(ref).max()


class TestFP8E5M2:
    def test_roundtrip_cossim(self, rng):
        W = rng.standard_normal((64, 128)).astype(np.float32)
        q, scales = F.quantize_fp8_e5m2(jnp.asarray(W))
        Wd = np.asarray(F.dequantize_fp8_e5m2(q, scales, jnp.float32))
        assert _cossim(Wd, W) > 0.92  # 2 mantissa bits: looser than e4m3


class TestDoubleQuantAccuracy:
    """Reference: rel err < 0.15 (off) / < 0.20 (on) (:179-187)."""

    def test_accuracy_cost(self, rng):
        W = rng.standard_normal((64, 512)).astype(np.float32)
        p_off, st_off = F.quantize_4bit(jnp.asarray(W))
        p_on, st_on = F.quantize_4bit(jnp.asarray(W), compress_statistics=True)
        err_off = np.abs(np.asarray(F.dequantize_4bit(p_off, st_off),
                                    np.float32) - W).mean() / np.abs(W).mean()
        err_on = np.abs(np.asarray(F.dequantize_4bit(p_on, st_on),
                                   np.float32) - W).mean() / np.abs(W).mean()
        assert err_off < 0.15
        assert err_on < 0.20
        assert err_on >= err_off - 1e-6


class TestExportCompleteness:
    """Reference: tests/test_fp4_fp8_double.py:360-408."""

    EXPECTED = [
        "QuantState",
        "quantize_4bit", "dequantize_4bit", "matmul_4bit",
        "quantize_nf4", "dequantize_nf4", "matmul_nf4", "NF4_CODEBOOK",
        "create_normal_map",
        "quantize_fp4", "dequantize_fp4", "matmul_fp4", "FP4_CODEBOOK",
        "create_fp4_map",
        "quantize_blockwise", "dequantize_blockwise",
        "quantize_fp8_e4m3", "dequantize_fp8_e4m3", "matmul_fp8_e4m3",
        "quantize_rowwise", "dequantize_rowwise", "matmul_int8",
        "quantize_colrow", "dequantize_colrow", "matmul_colrow",
        "double_quant", "dequant_absmax",
        "spmm_coo", "spmm_coo_int8", "sparse_coo_from_dense",
        "quantize_sparse_coo",
        "Linear4bit", "Linear8bit", "LinearFP8",
        "Embedding4bit", "Embedding8bit", "EmbeddingNF4", "EmbeddingFP4",
        "OutlierAwareLinear", "SwitchBackLinear", "SwitchBackLinearCallback",
        "Adam8bit", "AdamW8bit", "Lion8bit", "SGD8bit",
        "PagedAdam", "PagedAdamW", "PagedLion",
        "quantize_state", "dequantize_state",
        "BitsAndBytesConfig", "quantize_model",
        "replace_linear_with_4bit", "replace_linear_with_8bit",
        "get_memory_footprint",
        "is_available", "has_native_kernels", "__version__",
    ]

    def test_all_exports_present(self):
        for name in self.EXPECTED:
            assert hasattr(tbnb, name), f"missing export: {name}"

    def test_all_list(self):
        for name in self.EXPECTED:
            if name.startswith("__"):
                continue
            assert name in tbnb.__all__, f"{name} not in __all__"
