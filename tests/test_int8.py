"""Blockwise / row-wise INT8 and int8 matmul tests (reference: tests/test_int8.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

import tpu_bitsandbytes.functional as F


class TestBlockwise:
    def test_roundtrip(self, rng):
        x = rng.standard_normal(10000).astype(np.float32)
        q, state = F.quantize_blockwise(jnp.asarray(x))
        assert q.dtype == jnp.int8
        xd = np.asarray(F.dequantize_blockwise(q, state), np.float32)
        rel = np.abs(xd - x).mean() / np.abs(x).mean()
        assert rel < 0.05  # int8 reference threshold

    def test_shape_preserved(self, rng):
        x = rng.standard_normal((33, 55)).astype(np.float32)
        q, state = F.quantize_blockwise(jnp.asarray(x), blocksize=256)
        assert q.shape == (33, 55)
        xd = F.dequantize_blockwise(q, state)
        assert xd.shape == (33, 55)

    def test_nested(self, rng):
        x = rng.standard_normal(8192).astype(np.float32)
        q, state = F.quantize_blockwise(jnp.asarray(x), nested=True)
        assert state.state2 is not None
        xd = np.asarray(F.dequantize_blockwise(q, state), np.float32)
        assert np.abs(xd - x).mean() / np.abs(x).mean() < 0.08

    def test_blocksize_validation(self):
        with pytest.raises(ValueError, match="must be positive"):
            F.quantize_blockwise(jnp.zeros(16), blocksize=0)
        with pytest.raises(ValueError, match="too large"):
            F.quantize_blockwise(jnp.zeros(16), blocksize=1 << 20)


class TestRowwise:
    def test_roundtrip(self, rng):
        x = rng.standard_normal((64, 128)).astype(np.float32)
        q, scales = F.quantize_rowwise(jnp.asarray(x))
        assert q.dtype == jnp.int8
        assert scales.shape == (64,)
        xd = np.asarray(F.dequantize_rowwise(q, scales, jnp.float32))
        rel = np.abs(xd - x).mean() / np.abs(x).mean()
        assert rel < 0.05

    def test_3d_rowwise(self, rng):
        x = rng.standard_normal((2, 8, 32)).astype(np.float32)
        q, scales = F.quantize_rowwise(jnp.asarray(x))
        assert q.shape == (2, 8, 32)
        assert scales.shape == (16,)
        xd = F.dequantize_rowwise(q, scales, jnp.float32)
        assert xd.shape == (2, 8, 32)

    def test_int8_range(self, rng):
        x = rng.standard_normal((8, 64)).astype(np.float32) * 100
        q, _ = F.quantize_rowwise(jnp.asarray(x))
        qn = np.asarray(q)
        assert qn.max() <= 127 and qn.min() >= -127


class TestMatmulInt8:
    def test_cossim(self, rng):
        A = rng.standard_normal((16, 64)).astype(np.float32)
        B = rng.standard_normal((32, 64)).astype(np.float32)  # weight [N,K]
        Aq, As = F.quantize_rowwise(jnp.asarray(A))
        Bq, Bs = F.quantize_rowwise(jnp.asarray(B))
        # matmul_int8 contracts A[M,K] @ B[K,N]: pass B transposed
        y = np.asarray(F.matmul_int8(Aq, jnp.asarray(Bq).T, As, Bs, jnp.float32))
        y_ref = A @ B.T
        c = (y.ravel() @ y_ref.ravel()) / (
            np.linalg.norm(y) * np.linalg.norm(y_ref))
        assert c > 0.99

    def test_int32_accumulation_exact(self):
        # int8 x int8 contraction must be exact in int32 before scaling
        A = np.full((2, 256), 3, np.float32)
        B = np.full((4, 256), 5, np.float32)
        Aq, As = F.quantize_rowwise(jnp.asarray(A))
        Bq, Bs = F.quantize_rowwise(jnp.asarray(B))
        y = np.asarray(F.matmul_int8(Aq, jnp.asarray(Bq).T, As, Bs, jnp.float32))
        assert np.allclose(y, A @ B.T, rtol=1e-3)


class TestColrow:
    def test_roundtrip(self, rng):
        x = rng.standard_normal((32, 64)).astype(np.float32)
        q, row_s, col_s = F.quantize_colrow(jnp.asarray(x))
        xd = np.asarray(F.dequantize_colrow(q, row_s, col_s, jnp.float32))
        rel = np.abs(xd - x).mean() / np.abs(x).mean()
        assert rel < 0.06

    def test_requires_2d(self):
        with pytest.raises(ValueError, match="must be 2D"):
            F.quantize_colrow(jnp.zeros((2, 3, 4)))

    def test_matmul_colrow(self, rng):
        W = rng.standard_normal((32, 64)).astype(np.float32)
        x = rng.standard_normal((4, 64)).astype(np.float32)
        q, rs, cs = F.quantize_colrow(jnp.asarray(W))
        y = np.asarray(F.matmul_colrow(jnp.asarray(x), q, rs, cs,
                                       dtype=jnp.float32))
        y_ref = x @ W.T
        c = (y.ravel() @ y_ref.ravel()) / (
            np.linalg.norm(y) * np.linalg.norm(y_ref))
        assert c > 0.98


class TestDoubleQuantLLMint8:
    def test_shapes(self, rng):
        x = rng.standard_normal((16, 32)).astype(np.float32)
        out_col, out_row, col_stats, row_stats, outliers = F.double_quant(
            jnp.asarray(x))
        assert out_col.shape == (16, 32) and out_col.dtype == jnp.int8
        assert out_row.shape == (16, 32) and out_row.dtype == jnp.int8
        assert col_stats.shape == (32,)
        assert row_stats.shape == (16,)
        assert outliers is None

    def test_row_quantization_correct(self, rng):
        x = rng.standard_normal((8, 16)).astype(np.float32)
        _, out_row, _, row_stats, _ = F.double_quant(jnp.asarray(x))
        xd = np.asarray(out_row, np.float32) * np.asarray(row_stats)[:, None] / 127.0
        assert np.abs(xd - x).max() < np.abs(x).max() * 0.05

    def test_dequant_absmax(self, rng):
        absmax = np.abs(rng.standard_normal((4, 300))).astype(np.float32)
        q, state = F.quantize_blockwise(jnp.asarray(absmax.ravel()), blocksize=256)
        out = np.asarray(F.dequant_absmax(q, state))
        assert np.abs(out.reshape(4, 300) - absmax).mean() < 0.02
        # raw (non-QuantState) path
        qq = np.asarray(q).reshape(4, 300)
        scales = np.ones((4, 2), np.float32)
        out2 = F.dequant_absmax(jnp.asarray(qq), jnp.asarray(scales))
        assert out2.shape == (4, 300)
