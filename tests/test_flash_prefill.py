"""Tiled Pallas flash-prefill kernel: differential tests (interpret, CPU).

Oracle: models.layers.gqa_attention_flash's jnp scan path (itself tested
against the one-shot einsum attention) — the kernel must match it within
bf16-dot tolerance across causal/GQA/window/softcap/padding variants.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_bitsandbytes.models.layers import gqa_attention_flash
from tpu_bitsandbytes.ops.flash_prefill import flash_prefill_attention


def _mk(b, s, h, h_kv, d, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h_kv, d)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h_kv, d)) * 0.3, jnp.float32)
    return q, k, v


def _run_kernel(q, k, v, s_real=None, **kw):
    s = q.shape[1]
    s_pad = -(-s // 512) * 512
    pad = ((0, 0), (0, s_pad - s), (0, 0), (0, 0))
    out = flash_prefill_attention(
        jnp.pad(q, pad).astype(jnp.bfloat16),
        jnp.pad(k, pad).astype(jnp.bfloat16),
        jnp.pad(v, pad).astype(jnp.bfloat16),
        s_real=s_real if s_real is not None else s,
        scale=1.0 / np.sqrt(q.shape[-1]), **kw)
    return np.asarray(out[:, :s], np.float32)


def _assert_close(got, ref, tol=3e-2):
    ref = np.asarray(ref, np.float32)
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref)
                               + 1e-9)
    assert cos > 0.999, cos
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < tol, rel


class TestFlashPrefillKernel:
    def test_causal_mha(self):
        q, k, v = _mk(2, 1024, 4, 4, 128)
        ref = gqa_attention_flash(q, k, v)
        _assert_close(_run_kernel(q, k, v), ref)

    def test_gqa_rep4(self):
        q, k, v = _mk(2, 1024, 8, 2, 128, seed=1)
        ref = gqa_attention_flash(q, k, v)
        _assert_close(_run_kernel(q, k, v), ref)

    def test_sliding_window(self):
        q, k, v = _mk(1, 1024, 2, 2, 128, seed=2)
        ref = gqa_attention_flash(q, k, v, window=300)
        _assert_close(_run_kernel(q, k, v, window=300), ref)

    def test_softcap(self):
        q, k, v = _mk(1, 1024, 2, 2, 128, seed=3)
        ref = gqa_attention_flash(q, k, v, softcap=30.0)
        _assert_close(_run_kernel(q, k, v, softcap=30.0), ref)

    def test_unaligned_s_key_padding(self):
        # S=1100 pads to 1536; padded keys must not leak into real rows
        q, k, v = _mk(1, 1100, 2, 2, 128, seed=4)
        ref = gqa_attention_flash(q, k, v)
        _assert_close(_run_kernel(q, k, v), ref)

    def test_first_block_exactness_small_scale(self):
        # early rows attend to few keys — denominators are tiny; make sure
        # the online rescale stays stable
        q, k, v = _mk(1, 512, 2, 2, 128, seed=5)
        q = q * 3.0
        ref = gqa_attention_flash(q, k, v)
        _assert_close(_run_kernel(q, k, v), ref)
