"""W4A8 packed-bytes kernel: differential tests (interpret mode on CPU).

Oracle pattern per SURVEY §4.3: the kernel's own arithmetic (i8 codebook,
A8 row-quantized activations, per-block partial scaling) has an exact jnp
reference (`_dequant_planes_i8cb` + explicit A8 quantization) — the kernel
must match it to float tolerance; and the whole W4A8 path must track the
TRUE NF4 dequant matmul within the int8-class statistical tolerance
(cosine similarity, same contract as tests/test_runtime_cache.py).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_bitsandbytes.functional import (
    quantize_4bit, dequantize_4bit, matmul_4bit, _pad_k)
from tpu_bitsandbytes.models.layers import QLinear4
from tpu_bitsandbytes.ops.w4a8 import (
    w4a8_matmul_4bit, _dequant_planes_i8cb, NF4_I8_NP)


def _mk(n, k, m, blocksize=64, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.05
    x = rng.standard_normal((m, k)).astype(np.float32)
    packed, state = quantize_4bit(jnp.asarray(w), blocksize=blocksize)
    return jnp.asarray(x), packed, state, w


def _a8_reference(x, packed, state):
    """Exact jnp model of the kernel's arithmetic."""
    n, k = state.shape
    kp = _pad_k(k, state.blocksize)
    bs2 = state.blocksize // 2
    amT = state.absmax.reshape(n, kp // state.blocksize).astype(jnp.float32).T
    vlo, vhi = _dequant_planes_i8cb(packed.reshape(n, kp // 2), amT, bs2)
    x32 = x.astype(jnp.float32)
    if kp != k:
        x32 = jnp.pad(x32, ((0, 0), (0, kp - k)))
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=1, keepdims=True) / 127.0,
                    1e-12)
    xq = jnp.clip(jnp.round(x32 / s), -127, 127)
    return (xq[:, 0::2] @ vlo.T + xq[:, 1::2] @ vhi.T) * s


class TestW4A8Kernel:
    @pytest.mark.parametrize("m,n,k", [(1, 256, 512), (8, 256, 512),
                                       (16, 384, 256)])
    def test_matches_own_arithmetic_exactly(self, m, n, k):
        x, packed, state, _ = _mk(n, k, m)
        got = w4a8_matmul_4bit(x, packed, state, out_dtype=jnp.float32)
        ref = _a8_reference(x, packed, state)
        err = np.abs(np.asarray(got) - np.asarray(ref)).max()
        scale = np.abs(np.asarray(ref)).max() + 1e-9
        assert err / scale < 1e-5

    def test_tracks_true_nf4_matmul(self):
        x, packed, state, _ = _mk(512, 1024, 8, seed=3)
        got = np.asarray(w4a8_matmul_4bit(x, packed, state,
                                          out_dtype=jnp.float32))
        ref = np.asarray(matmul_4bit(x, packed, state,
                                     compute_dtype=jnp.float32))
        cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
        assert cos > 0.995
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert rel < 0.05

    def test_chunked_scratch_path(self, monkeypatch):
        # force the big-K2 chunked-decode path (scratch planes) on a small
        # shape and check it matches the whole-tile arithmetic exactly
        import tpu_bitsandbytes.ops.w4a8 as W
        monkeypatch.setattr(W, "_whole_tile", lambda n_t, k2: False)
        monkeypatch.setattr(W, "_DECODE_CHUNK", 128)
        x, packed, state, _ = _mk(256, 768, 4, seed=9)
        got = np.asarray(w4a8_matmul_4bit(x, packed, state,
                                          out_dtype=jnp.float32))
        ref = np.asarray(_a8_reference(x, packed, state))
        assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9) < 1e-5

    def test_odd_k_padding(self):
        # K not a blocksize multiple: padded region must contribute zero
        x, packed, state, w = _mk(256, 200, 4, blocksize=64, seed=5)
        got = np.asarray(w4a8_matmul_4bit(x, packed, state,
                                          out_dtype=jnp.float32))
        ref = np.asarray(_a8_reference(x, packed, state))
        assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9) < 1e-5

    def test_bias_and_dtype(self):
        x, packed, state, _ = _mk(256, 256, 2)
        bias = jnp.arange(256, dtype=jnp.float32) * 0.01
        got = w4a8_matmul_4bit(x, packed, state, bias=bias,
                               out_dtype=jnp.bfloat16)
        assert got.dtype == jnp.bfloat16
        base = w4a8_matmul_4bit(x, packed, state, out_dtype=jnp.float32)
        diff = np.asarray(got, np.float32) - np.asarray(base)
        assert np.allclose(diff, np.asarray(bias)[None, :], atol=0.05)

    def test_unsupported_raises(self):
        x, packed, state, _ = _mk(256, 512, 4)
        import dataclasses
        fp4 = dataclasses.replace(state, quant_type="fp4")
        with pytest.raises(NotImplementedError):
            w4a8_matmul_4bit(x, packed, fp4)
        big_m = jnp.zeros((128, 512), jnp.float32)
        with pytest.raises(NotImplementedError):
            w4a8_matmul_4bit(big_m, packed, state)

    def test_grad_flows_to_x(self):
        x, packed, state, _ = _mk(256, 512, 4, seed=7)

        def loss(xx):
            return jnp.sum(w4a8_matmul_4bit(xx, packed, state,
                                            out_dtype=jnp.float32) ** 2)

        g = jax.grad(loss)(x)
        assert np.isfinite(np.asarray(g)).all()
        # straight-through reference: d_x = 2 * y @ W_dq (i8 codebook)
        n, k = state.shape
        kp = _pad_k(k, state.blocksize)
        amT = state.absmax.reshape(n, kp // state.blocksize).astype(
            jnp.float32).T
        vlo, vhi = _dequant_planes_i8cb(packed.reshape(n, kp // 2), amT,
                                        state.blocksize // 2)
        y = w4a8_matmul_4bit(x, packed, state, out_dtype=jnp.float32)
        d_e = 2 * y @ vlo
        d_o = 2 * y @ vhi
        ref = np.stack([np.asarray(d_e), np.asarray(d_o)],
                       axis=-1).reshape(x.shape)
        got = np.asarray(g)
        assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9) < 1e-4


class TestQLinear4Routing:
    def test_packed_path_routes_to_w4a8(self, monkeypatch):
        monkeypatch.setenv("TBNB_W4A8_INTERPRET", "1")
        rng = np.random.default_rng(11)
        w = rng.standard_normal((256, 512)).astype(np.float32) * 0.05
        q = QLinear4.quantize(jnp.asarray(w), dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
        got = np.asarray(q(x))
        ref = np.asarray(w4a8_matmul_4bit(x, q.packed.reshape(-1),
                                          q.quant_state(),
                                          out_dtype=jnp.float32))
        assert np.allclose(got, ref, atol=1e-5)

    def test_w4a8_disabled_env(self, monkeypatch):
        monkeypatch.setenv("TBNB_W4A8_INTERPRET", "1")
        monkeypatch.setenv("TBNB_W4A8", "0")
        rng = np.random.default_rng(11)
        w = rng.standard_normal((256, 512)).astype(np.float32) * 0.05
        q = QLinear4.quantize(jnp.asarray(w), dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
        got = np.asarray(q(x))
        ref = np.asarray(matmul_4bit(x, q.packed.reshape(-1),
                                     q.quant_state(),
                                     compute_dtype=jnp.float32))
        assert np.allclose(got, ref, atol=1e-5)

    def test_large_m_falls_back(self, monkeypatch):
        # M > 64: w4a8 raises NotImplementedError internally; QLinear4 must
        # still produce the exact bf16-prescale/XLA result
        monkeypatch.setenv("TBNB_W4A8_INTERPRET", "1")
        rng = np.random.default_rng(13)
        w = rng.standard_normal((256, 256)).astype(np.float32) * 0.05
        q = QLinear4.quantize(jnp.asarray(w), dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((128, 256)), jnp.float32)
        got = np.asarray(q(x))
        ref = np.asarray(matmul_4bit(x, q.packed.reshape(-1),
                                     q.quant_state(),
                                     compute_dtype=jnp.float32))
        assert np.allclose(got, ref, atol=1e-4)


def test_i8_codebook_error_bound():
    err = np.abs(NF4_I8_NP / 127.0
                 - np.asarray(
                     __import__("tpu_bitsandbytes.functional",
                                fromlist=["NF4_CODEBOOK_NP"]
                                ).NF4_CODEBOOK_NP))
    assert err.max() <= 0.5 / 127.0 + 1e-7
