"""Differential tests for the fused flash-decode attention kernel
(ops/flash_decode.py) against the XLA staged-attention oracle
(models.layers.gqa_attention_kv_quant) — the native-vs-fallback pattern
(SURVEY §4.3). Interpret mode on CPU; the compiled path is gated by
scripts/tpu_selftest.py.

Tolerance: the kernel row-quantizes q and the (v_scale-folded)
probabilities to int8 — ~1% relative error on the attention output, the
same class as the int8 KV quantization both paths share.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_bitsandbytes.ops.flash_decode import flash_decode_attention
from tpu_bitsandbytes.models.layers import gqa_attention_kv_quant

TOL = 0.02


def make(rng, b, h, h_kv, d, t, c):
    q = jnp.asarray(rng.standard_normal((b, h, d)) * 0.3, jnp.bfloat16)
    k_q = jnp.asarray(rng.integers(-127, 128, (b, h_kv, t, d)), jnp.int8)
    v_q = jnp.asarray(rng.integers(-127, 128, (b, h_kv, t, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.5, 2.0, (b, h_kv, t)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.5, 2.0, (b, h_kv, t)), jnp.float32)
    stk = jnp.asarray(rng.integers(-127, 128, (b, h_kv, c, d)), jnp.int8)
    stv = jnp.asarray(rng.integers(-127, 128, (b, h_kv, c, d)), jnp.int8)
    stks = jnp.asarray(rng.uniform(0.5, 2.0, (b, h_kv, c)), jnp.float32)
    stvs = jnp.asarray(rng.uniform(0.5, 2.0, (b, h_kv, c)), jnp.float32)
    off = jnp.asarray(rng.integers(t // 2, t, (b,)), jnp.int32)
    return q, k_q, ks, v_q, vs, (stk, stks, stv, stvs), off


def rel_err(got, ref):
    ref = np.asarray(ref, np.float32)
    return np.abs(np.asarray(got) - ref).max() / (np.abs(ref).max() + 1e-9)


class TestFlashDecodeAttention:
    @pytest.mark.parametrize("h,h_kv", [(8, 8), (8, 4), (14, 2)])
    def test_staged_matches_oracle(self, rng, h, h_kv):
        b, d, t, c = 3, 128, 128, 16
        q, kq, ks, vq, vs, st, off = make(rng, b, h, h_kv, d, t, c)
        step = jnp.int32(c // 2)
        sc = 1.0 / np.sqrt(d)
        got = flash_decode_attention(q, kq, ks, vq, vs, off,
                                     staged=st + (step,), scale=sc)
        ref = gqa_attention_kv_quant(q[:, None], kq, ks, vq, vs,
                                     causal_offset=off[:, None], scale=sc,
                                     staged=st + (step,))[:, 0]
        assert rel_err(got, ref) < TOL

    def test_unstaged_matches_oracle(self, rng):
        b, h, h_kv, d, t = 2, 8, 4, 128, 128
        q, kq, ks, vq, vs, _, off = make(rng, b, h, h_kv, d, t, 16)
        sc = 1.0 / np.sqrt(d)
        got = flash_decode_attention(q, kq, ks, vq, vs, off, scale=sc)
        ref = gqa_attention_kv_quant(q[:, None], kq, ks, vq, vs,
                                     causal_offset=off[:, None],
                                     scale=sc)[:, 0]
        assert rel_err(got, ref) < TOL

    @pytest.mark.parametrize("staged", [False, True])
    def test_window(self, rng, staged):
        b, h, h_kv, d, t, c = 2, 8, 4, 128, 128, 16
        q, kq, ks, vq, vs, st, off = make(rng, b, h, h_kv, d, t, c)
        sc, win = 1.0 / np.sqrt(d), 32
        stg = st + (jnp.int32(c // 2),) if staged else None
        got = flash_decode_attention(q, kq, ks, vq, vs, off, staged=stg,
                                     scale=sc, window=win)
        ref = gqa_attention_kv_quant(q[:, None], kq, ks, vq, vs,
                                     causal_offset=off[:, None], scale=sc,
                                     window=win, staged=stg)[:, 0]
        assert rel_err(got, ref) < TOL

    def test_softcap(self, rng):
        b, h, h_kv, d, t = 2, 4, 4, 128, 128
        q, kq, ks, vq, vs, _, off = make(rng, b, h, h_kv, d, t, 16)
        sc = 1.0 / np.sqrt(d)
        got = flash_decode_attention(q, kq, ks, vq, vs, off, scale=sc,
                                     softcap=30.0)
        ref = gqa_attention_kv_quant(q[:, None], kq, ks, vq, vs,
                                     causal_offset=off[:, None], scale=sc,
                                     softcap=30.0)[:, 0]
        assert rel_err(got, ref) < TOL

    def test_kpos_start(self, rng):
        """Windowed lower-bound read: the kernel's kpos offset must match
        the sliced-oracle's."""
        b, h, h_kv, d, t = 2, 8, 4, 128, 256,
        q, kq, ks, vq, vs, _, off = make(rng, b, h, h_kv, d, t, 16)
        off = off + 128
        start = 128
        sc = 1.0 / np.sqrt(d)
        got = flash_decode_attention(
            q, kq[:, :, start:], ks[:, :, start:], vq[:, :, start:],
            vs[:, :, start:], off, scale=sc, kpos_start=start)
        ref = gqa_attention_kv_quant(
            q[:, None], kq[:, :, start:], ks[:, :, start:],
            vq[:, :, start:], vs[:, :, start:],
            causal_offset=off[:, None], scale=sc, kpos_start=start)[:, 0]
        assert rel_err(got, ref) < TOL

    def test_fresh_slot_zero_length(self, rng):
        """off=0 (empty slot, unstaged): everything masked except nothing —
        output must be finite (the engine keeps such slots inactive)."""
        b, h, h_kv, d, t = 2, 4, 4, 128, 128
        q, kq, ks, vq, vs, _, _ = make(rng, b, h, h_kv, d, t, 16)
        off = jnp.zeros((b,), jnp.int32)
        out = flash_decode_attention(q, kq, ks, vq, vs, off,
                                     scale=1.0 / np.sqrt(d))
        assert np.isfinite(np.asarray(out)).all()
