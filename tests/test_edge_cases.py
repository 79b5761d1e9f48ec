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


class TestLargeValues:
    """fp16-max / overflow analogues (reference :161-185)."""

    def test_quantize_fp16_max(self):
        x = jnp.full((64, 64), 65504.0, jnp.float16)   # fp16 max
        packed, state = F.quantize_4bit(x)
        assert np.all(np.isfinite(np.asarray(state.absmax)))
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        assert np.all(np.isfinite(Wd))
        assert np.allclose(Wd, 65504.0, rtol=1e-2)

    def test_quantize_mixed_extreme(self):
        x = np.zeros((128, 128), np.float32)
        x[0, 0] = 65504.0
        x[1, 1] = 1e-4
        x[2, 2] = -65504.0
        packed, state = F.quantize_4bit(jnp.asarray(x))
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        assert np.all(np.isfinite(Wd))
        assert np.allclose(Wd[0, 0], 65504.0, rtol=0.05)
        assert np.allclose(Wd[2, 2], -65504.0, rtol=0.05)

    def test_fp16_max_through_matmul(self, rng):
        """A weight at fp16-max must survive quantize -> fused matmul in a
        half-precision compute dtype without overflowing to inf."""
        W = rng.standard_normal((16, 64)).astype(np.float32)
        W[0, :] = 60000.0
        packed, state = F.quantize_4bit(jnp.asarray(W))
        x = jnp.full((2, 64), 1e-3, jnp.float32)
        y = np.asarray(F.matmul_4bit(x, packed, state), np.float32)
        assert np.all(np.isfinite(y))


class TestZeroInputs:
    """Division-by-zero guards (reference :108-155)."""

    def test_single_nonzero_per_block(self):
        blocksize = 64
        x = np.zeros((256, 256), np.float32)
        x[::4, 0] = 1.0
        packed, state = F.quantize_4bit(jnp.asarray(x), blocksize=blocksize)
        assert np.all(np.isfinite(np.asarray(state.absmax)))
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        assert np.all(np.isfinite(Wd))
        assert np.allclose(Wd[::4, 0], 1.0, rtol=1e-2)
        # all-zero blocks stay zero
        assert np.allclose(Wd[1::4], 0.0, atol=1e-6)

    def test_int8_quantize_zeros(self):
        x = jnp.zeros((128, 128), jnp.float32)
        q, state = F.quantize_blockwise(x, blocksize=64)
        assert np.all(np.isfinite(np.asarray(state.absmax)))
        back = np.asarray(F.dequantize_blockwise(q, state), np.float32)
        assert np.allclose(back, 0.0, atol=1e-7)


class TestMatmulStress:
    """NaN stress across seeds and awkward sizes (reference :234-305)."""

    def test_matmul_repeated_seeds_no_nan(self, rng):
        M, N, K = 32, 128, 256
        W = rng.standard_normal((N, K)).astype(np.float32)
        bias = jnp.asarray(rng.standard_normal(N).astype(np.float32))
        packed, state = F.quantize_4bit(jnp.asarray(W))
        for i in range(20):
            x = jnp.asarray(np.random.default_rng(i)
                            .standard_normal((M, K)).astype(np.float32))
            y = np.asarray(F.matmul_4bit(x, packed, state, bias=bias),
                           np.float32)
            assert np.all(np.isfinite(y)), f"NaN at seed {i}"

    @pytest.mark.parametrize("mnk", [(1, 64, 128), (7, 64, 128),
                                     (32, 63, 127), (32, 64, 65),
                                     (128, 256, 512)])
    def test_matmul_awkward_sizes_no_nan(self, rng, mnk):
        m, n, k = mnk
        W = rng.standard_normal((n, k)).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        packed, state = F.quantize_4bit(jnp.asarray(W))
        y = np.asarray(F.matmul_4bit(x, packed, state, bias=bias), np.float32)
        assert y.shape == (m, n)
        assert np.all(np.isfinite(y))


class TestBufferIntegrity:
    """Adjacent state-buffer integrity analogues (reference :311-344).

    JAX arrays are immutable, so raw buffer-overflow corruption cannot
    happen the Metal way — the analogues here guard the places where this
    codebase *does* alias/mutate buffers: donated KV-cache writes and
    packed-layout padding regions.
    """

    def test_quantize_leaves_neighbors_unchanged(self, rng):
        a = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
        sentinel = jnp.full((64, 64), 42.0, jnp.float32)
        b = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
        ref = np.asarray(sentinel).copy()
        F.quantize_4bit(a)
        F.quantize_4bit(b)
        assert np.array_equal(np.asarray(sentinel), ref)

    def test_kv_write_does_not_touch_other_slots(self, rng):
        """Donated-buffer decode writes must stay inside the target slot
        (the one true in-place mutation path in the library)."""
        from tpu_bitsandbytes.engine import KVCache
        cache = KVCache.create(1, 4, 16, 2, 8, quantized=True)
        k0 = np.asarray(cache.k).copy()
        k_new = jnp.asarray(rng.standard_normal((4, 1, 2, 8)), jnp.float32)
        # only slots 1 and 3 advance (positions differ per slot)
        positions = jnp.asarray([0, 3, 0, 7], jnp.int32)
        cache2 = cache.write_decode(0, k_new, k_new, positions)
        k2 = np.asarray(cache2.k)
        # every position except the written (slot, pos) pairs is untouched
        # (head-major storage: [L, B, H, S, D])
        mask = np.ones_like(k2, bool)
        for s in range(4):
            mask[0, s, :, int(positions[s])] = False
        assert np.array_equal(k2[mask], k0[mask])

    def test_padding_region_roundtrip_isolated(self, rng):
        """K-padding must not leak into dequantized output columns."""
        W = rng.standard_normal((8, 100)).astype(np.float32)  # pads to 128
        packed, state = F.quantize_4bit(jnp.asarray(W), blocksize=64)
        Wd = np.asarray(F.dequantize_4bit(packed, state), np.float32)
        assert Wd.shape == (8, 100)
        assert np.abs(Wd - W).max() < 2.0          # corruption-scale check
        assert np.abs(Wd - W).mean() < 0.5


class TestUnusualShapes:
    @pytest.mark.parametrize("shape", [(1, 64), (64, 2), (3, 7), (1, 1),
                                       (13, 17), (128, 1), (1, 63), (1, 65),
                                       (128, 127), (1, 1024), (1024, 1)])
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
