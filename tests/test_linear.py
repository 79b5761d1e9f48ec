"""Quantized linear module tests (reference: tests/test_advanced_linear.py etc.)."""

import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpu_bitsandbytes as tbnb
import tpu_bitsandbytes.nn as nn
import tpu_bitsandbytes.functional as F


def make_linear(rng, in_f=128, out_f=64, bias=True):
    src = nn.Linear(in_f, out_f, bias=bias, dtype=jnp.float32,
                    key=jax.random.PRNGKey(0))
    src.weight = jnp.asarray(rng.standard_normal((out_f, in_f)).astype(np.float32))
    if bias:
        src.bias = jnp.asarray(rng.standard_normal(out_f).astype(np.float32))
    return src


class TestLinear4bit:
    def test_forward_matches_dequant(self, rng):
        src = make_linear(rng)
        q = tbnb.Linear4bit.from_linear(src, compute_dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
        y = np.asarray(q(x), np.float32)
        Wd = np.asarray(q.dequantize(), np.float32)
        ref = np.asarray(x) @ Wd.T + np.asarray(q.bias, np.float32)
        assert np.abs(y - ref).max() < 5e-2

    def test_forward_unquantized_raises(self):
        layer = tbnb.Linear4bit(16, 8)
        with pytest.raises(RuntimeError, match="not quantized"):
            layer(jnp.ones((2, 16)))

    def test_batched_forward(self, rng):
        src = make_linear(rng)
        q = tbnb.Linear4bit.from_linear(src)
        x = jnp.asarray(rng.standard_normal((2, 3, 128)).astype(np.float32))
        assert q(x).shape == (2, 3, 64)

    def test_jit_module(self, rng):
        src = make_linear(rng)
        q = tbnb.Linear4bit.from_linear(src, compute_dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))

        @jax.jit
        def apply(mod, xx):
            return mod(xx)

        y1 = np.asarray(apply(q, x))
        y2 = np.asarray(q(x))
        assert np.allclose(y1, y2, atol=1e-5)

    def test_state_dict_roundtrip(self, rng):
        src = make_linear(rng)
        q = tbnb.Linear4bit.from_linear(src, compute_dtype=jnp.float32)
        sd = q.state_dict()
        assert "weight" in sd and "weight_quant_state" in sd
        q2 = tbnb.Linear4bit(128, 64, compute_dtype=jnp.float32)
        q2.load_state_dict(sd)
        x = jnp.asarray(rng.standard_normal((2, 128)).astype(np.float32))
        assert np.allclose(np.asarray(q(x)), np.asarray(q2(x)), atol=1e-5)

    def test_load_fp32_weight_requantizes(self, rng):
        W = rng.standard_normal((64, 128)).astype(np.float32)
        q = tbnb.Linear4bit(128, 64, bias=False, compute_dtype=jnp.float32)
        q.load_state_dict({"weight": jnp.asarray(W)})
        assert q.weight_quant_state is not None
        Wd = np.asarray(q.dequantize(), np.float32)
        assert np.abs(Wd - W).mean() / np.abs(W).mean() < 0.25

    def test_blocksize_mismatch_warns(self, rng):
        src = make_linear(rng)
        q = tbnb.Linear4bit.from_linear(src, blocksize=64)
        sd = q.state_dict()
        q2 = tbnb.Linear4bit(128, 64, blocksize=128)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            q2.load_state_dict(sd)
        assert any("blocksize mismatch" in str(x.message) for x in w)
        assert q2.blocksize == 64

    def test_params4bit_logical_shape(self, rng):
        src = make_linear(rng)
        q = tbnb.Linear4bit.from_linear(src)
        p = tbnb.Params4bit(q.weight, quant_state=q.weight_quant_state)
        assert p.shape == (64, 128)


class TestLinear8bit:
    def test_forward_close_to_fp(self, rng):
        src = make_linear(rng)
        q = tbnb.Linear8bit.from_linear(src, compute_dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
        y = np.asarray(q(x), np.float32)
        ref = np.asarray(src(x), np.float32)
        rel = np.abs(y - ref).mean() / np.abs(ref).mean()
        assert rel < 0.05

    def test_cache(self, rng):
        src = make_linear(rng)
        q = tbnb.Linear8bit.from_linear(src, use_cache=True)
        _ = q._get_weight()
        assert q._weight_cache is not None
        q.clear_cache()
        assert q._weight_cache is None

    def test_fused_matches_materialized(self, rng):
        """The fused int8-MXU forward (convert+dot, output-side scaling)
        must match the reference-style dequant-then-GEMM path."""
        src = make_linear(rng)
        fused = tbnb.Linear8bit.from_linear(src, compute_dtype=jnp.float32)
        mat = tbnb.Linear8bit.from_linear(src, use_cache=True,
                                          compute_dtype=jnp.float32)
        assert not fused.use_cache
        x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
        yf = np.asarray(fused(x), np.float32)
        ym = np.asarray(mat(x), np.float32)
        assert np.abs(yf - ym).max() < 1e-3 * np.abs(ym).max()


class TestLinearFP8:
    def test_forward_close_to_fp(self, rng):
        src = make_linear(rng)
        q = tbnb.LinearFP8.from_linear(src, compute_dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
        y = np.asarray(q(x), np.float32)
        ref = np.asarray(src(x), np.float32)
        rel = np.abs(y - ref).mean() / np.abs(ref).mean()
        assert rel < 0.05

    def test_dequantize_shape(self, rng):
        src = make_linear(rng)
        q = tbnb.LinearFP8.from_linear(src)
        assert q.dequantize().shape == (64, 128)


class TestOutlierAware:
    def test_no_outliers_pure_int8(self, rng):
        src = make_linear(rng)
        q = tbnb.OutlierAwareLinear.from_linear(src, threshold=100.0)
        assert q.num_outliers == 0
        x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
        ref = np.asarray(src(x), np.float32)
        y = np.asarray(q(x), np.float32)
        assert np.abs(y - ref).mean() / np.abs(ref).mean() < 0.05

    def test_outlier_detection_and_mixed_path(self, rng):
        src = make_linear(rng, bias=False)
        W = np.asarray(src.weight).copy()
        W[:, 5] *= 50.0  # inject an outlier column
        W[:, 77] *= 80.0
        src.weight = jnp.asarray(W)
        q = tbnb.OutlierAwareLinear.from_linear(src, threshold=6.0)
        assert q.num_outliers >= 2
        assert 5 in np.asarray(q.outlier_indices)
        x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
        ref = np.asarray(src(x), np.float32)
        y = np.asarray(q(x), np.float32)
        # outlier columns computed in full precision -> good accuracy overall
        assert np.abs(y - ref).mean() / np.abs(ref).mean() < 0.05

    def test_outlier_weights_stored_fp(self, rng):
        src = make_linear(rng, bias=False)
        W = np.asarray(src.weight).copy()
        W[:, 3] *= 100.0
        src.weight = jnp.asarray(W)
        q = tbnb.OutlierAwareLinear.from_linear(src)
        idx = list(np.asarray(q.outlier_indices))
        col = np.asarray(q.outlier_weights, np.float32)[:, idx.index(3)]
        assert np.allclose(col, W[:, 3], rtol=1e-2)


class TestSwitchBack:
    def test_forward_uses_int8(self, rng):
        src = make_linear(rng, bias=False)
        q = tbnb.SwitchBackLinear.from_linear(src)
        x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
        y = np.asarray(q(x), np.float32)
        w_deq = np.asarray(F.dequantize_rowwise(
            q.weight_int8, q.weight_scales, q.compute_dtype), np.float32)
        ref = np.asarray(x, np.float32) @ w_deq.T
        assert np.abs(y - ref).max() < 0.35  # bf16 compute tolerance

    def test_backward_uses_fp_weights(self, rng):
        """The custom VJP must route dx through the fp master weight and
        produce dW for the master (reference SwitchBackFunction:66-89)."""
        from tpu_bitsandbytes.nn import switchback_matmul
        x = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
        w_q = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))
        w_fp = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))
        bias = jnp.zeros((16,), jnp.float32)

        def loss(xx, wfp):
            return jnp.sum(switchback_matmul(xx, w_q, wfp, bias))

        dx, dwfp = jax.grad(loss, argnums=(0, 1))(x, w_fp)
        g = np.ones((4, 16), np.float32)
        # dx = g @ w_fp (NOT w_q) — the switchback property
        assert np.allclose(np.asarray(dx), g @ np.asarray(w_fp), atol=1e-4)
        assert not np.allclose(np.asarray(dx), g @ np.asarray(w_q), atol=1e-2)
        assert np.allclose(np.asarray(dwfp), g.T @ np.asarray(x), atol=1e-4)

    def test_sync_weights(self, rng):
        src = make_linear(rng, bias=False)
        q = tbnb.SwitchBackLinear.from_linear(src)
        q.weight_fp = q.weight_fp * 2.0
        old = np.asarray(q.weight_scales).copy()
        q.sync_weights()
        assert not np.allclose(np.asarray(q.weight_scales), old)

    def test_callback_collects_layers(self, rng):
        class Tiny(nn.Module):
            def __init__(self):
                self.a = tbnb.SwitchBackLinear(8, 8)
                self.b = nn.Linear(8, 8)
            def forward(self, x):
                return self.b(self.a(x))

        m = Tiny()
        cb = tbnb.SwitchBackLinearCallback(m)
        assert len(cb.switchback_layers) == 1
        cb.sync()  # must not raise
