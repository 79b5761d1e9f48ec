"""Differential tests: fused Pallas dequant-matmul vs the jnp oracle.

The native-vs-fallback pattern of the reference suite
(tests/test_fused_nf4.py:19-31, test_embeddings.py:199-284): the pure-jnp
functional implementation is the oracle; the Pallas kernel (interpret mode
on CPU, compiled on TPU) must agree within tight tolerance in exact (f32)
mode and loose tolerance in bf16 mode.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

import tpu_bitsandbytes.functional as F
from tpu_bitsandbytes.ops.matmul4bit import fused_matmul_4bit


def _ref(x, packed, state):
    W = np.asarray(F.dequantize_4bit(packed, state), np.float32)
    return np.asarray(x, np.float32) @ W.T


@pytest.mark.parametrize("quant_type", ["nf4", "fp4"])
@pytest.mark.parametrize("m", [1, 7, 16])
def test_fused_matches_oracle(rng, quant_type, m):
    W = rng.standard_normal((64, 256)).astype(np.float32)
    x = rng.standard_normal((m, 256)).astype(np.float32)
    packed, state = F.quantize_4bit(jnp.asarray(W), quant_type=quant_type)
    y = np.asarray(fused_matmul_4bit(jnp.asarray(x), packed, state), np.float32)
    assert np.abs(y - _ref(x, packed, state)).max() < 1e-3


def test_fused_large_m_no_crossover(rng):
    """The reference falls back to a vendor GEMM at M>512
    (functional.py:714-717); our fused kernel must handle it directly."""
    W = rng.standard_normal((32, 128)).astype(np.float32)
    x = rng.standard_normal((600, 128)).astype(np.float32)
    packed, state = F.quantize_4bit(jnp.asarray(W))
    y = np.asarray(fused_matmul_4bit(jnp.asarray(x), packed, state), np.float32)
    assert y.shape == (600, 32)
    assert np.abs(y - _ref(x, packed, state)).max() < 2e-3


@pytest.mark.parametrize("blocksize", [32, 64, 128])
def test_fused_blocksizes(rng, blocksize):
    W = rng.standard_normal((16, 256)).astype(np.float32)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    packed, state = F.quantize_4bit(jnp.asarray(W), blocksize=blocksize)
    y = np.asarray(fused_matmul_4bit(jnp.asarray(x), packed, state), np.float32)
    assert np.abs(y - _ref(x, packed, state)).max() < 1e-3


def test_fused_double_quant_absmax(rng):
    W = rng.standard_normal((32, 256)).astype(np.float32)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    packed, state = F.quantize_4bit(jnp.asarray(W), compress_statistics=True)
    y = np.asarray(fused_matmul_4bit(jnp.asarray(x), packed, state), np.float32)
    assert np.abs(y - _ref(x, packed, state)).max() < 1e-3


def test_fused_unaligned_shapes(rng):
    # K not a lane multiple after packing; N not tile aligned -> pad path
    W = rng.standard_normal((100, 300)).astype(np.float32)
    x = rng.standard_normal((3, 300)).astype(np.float32)
    packed, state = F.quantize_4bit(jnp.asarray(W))
    y = np.asarray(fused_matmul_4bit(jnp.asarray(x), packed, state), np.float32)
    assert y.shape == (3, 100)
    assert np.abs(y - _ref(x, packed, state)).max() < 1e-3


def test_fused_bf16_mode(rng):
    W = rng.standard_normal((64, 256)).astype(np.float32)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    packed, state = F.quantize_4bit(jnp.asarray(W))
    y = np.asarray(fused_matmul_4bit(jnp.asarray(x), packed, state,
                                     mxu_dtype=jnp.bfloat16), np.float32)
    ref = _ref(x, packed, state)
    # reference fused-vs-dequant threshold: max abs diff < 0.1
    assert np.abs(y - ref).max() < 0.1 * max(1.0, np.abs(ref).max())


def test_fused_odd_blocksize_raises(rng):
    W = rng.standard_normal((16, 64)).astype(np.float32)
    packed, state = F.quantize_4bit(jnp.asarray(W), blocksize=1)
    with pytest.raises(NotImplementedError):
        fused_matmul_4bit(jnp.ones((2, 64)), packed, state)


def test_matmul_4bit_dispatch_fallback_matches(rng):
    """matmul_4bit (dispatch layer) equals the oracle regardless of path."""
    W = rng.standard_normal((32, 128)).astype(np.float32)
    x = rng.standard_normal((5, 128)).astype(np.float32)
    packed, state = F.quantize_4bit(jnp.asarray(W))
    y = np.asarray(F.matmul_4bit(jnp.asarray(x), packed, state), np.float32)
    assert np.abs(y - _ref(x, packed, state)).max() < 1e-2


def test_fused_path_is_differentiable(rng):
    """QLoRA differentiates through frozen quantized linears; the fused
    kernel's custom VJP must route dx through the dequantized weight."""
    W = rng.standard_normal((32, 128)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    packed, state = F.quantize_4bit(jnp.asarray(W))

    def loss_fused(xx):
        return jnp.sum(fused_matmul_4bit(xx, packed, state) ** 2)

    def loss_ref(xx):
        Wd = F.dequantize_4bit(packed, state).astype(jnp.float32)
        return jnp.sum((xx @ Wd.T) ** 2)

    g_fused = np.asarray(jax.grad(loss_fused)(x))
    g_ref = np.asarray(jax.grad(loss_ref)(x))
    assert np.allclose(g_fused, g_ref, rtol=1e-3, atol=1e-3)


def test_matmul_4bit_1d_input(rng):
    W = rng.standard_normal((32, 64)).astype(np.float32)
    packed, state = F.quantize_4bit(jnp.asarray(W))
    x = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    y = F.matmul_4bit(x, packed, state)
    assert y.shape == (32,)
    assert np.allclose(np.asarray(y), _ref(np.asarray(x)[None], packed, state)[0],
                       atol=1e-2)
