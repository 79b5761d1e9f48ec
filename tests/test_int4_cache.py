"""int4 runtime execution cache: differential tests (interpret mode, CPU).

Oracle pattern per SURVEY §4.3: the Pallas kernel's arithmetic (A8 row
quantization, per-64-block s4 dots, f32 partial scaling) has an exact jnp
reference; the whole int4 path must track the TRUE NF4 weight within its
documented FP4-class statistical tolerance (cosine, same contract as
tests/test_runtime_cache.py / test_w4a8.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_bitsandbytes.models.layers import QLinear4
from tpu_bitsandbytes.ops.int4cache import (
    INT4_BLOCK, dequant_int4, int4_matmul, quantize_int4)


def _mk(n, k, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, k)).astype(np.float32) * 0.05


class TestQuantizeInt4:
    def test_round_trip_error_bound(self):
        w = _mk(128, 256)
        q4, s = quantize_int4(jnp.asarray(w))
        assert q4.dtype == jnp.int4 and q4.shape == (128, 256)
        assert s.shape == (256 // INT4_BLOCK, 128)
        wd = np.asarray(dequant_int4(q4, s))
        # symmetric int4 per-64: |err| <= scale/2 = amax/14 per block
        wb = w.reshape(128, -1, INT4_BLOCK)
        bound = np.abs(wb).max(-1, keepdims=True) / 14.0 + 1e-6
        assert (np.abs(wd.reshape(wb.shape) - wb) <= bound).all()

    def test_k_padding(self):
        w = _mk(64, 200, seed=1)
        q4, s = quantize_int4(jnp.asarray(w))
        assert q4.shape == (64, 256)
        wd = np.asarray(dequant_int4(q4, s))
        assert np.abs(wd[:, 200:]).max() == 0.0

    def test_codes_symmetric(self):
        q4, _ = quantize_int4(jnp.asarray(_mk(64, 128, seed=2)))
        codes = np.asarray(q4.astype(jnp.int8))
        assert codes.min() >= -7 and codes.max() <= 7

    def test_n_padding_to_grid_tile(self, monkeypatch):
        """N pads to the kernel's preferred grid tile (zero rows) and
        int4_matmul(n_out=) slices them back off — the gateup-22016 case
        scaled down via a shrunk VMEM budget."""
        import tpu_bitsandbytes.ops.int4cache as I
        monkeypatch.setattr(I, "_VMEM_BUDGET", 128 * 256 * 3 // 2)
        w = _mk(200, 256, seed=13)          # t=128 -> N pads 200 -> 256
        q4, s = quantize_int4(jnp.asarray(w))
        assert q4.shape == (256, 256)
        assert s.shape == (256 // INT4_BLOCK, 256)
        assert np.abs(np.asarray(
            q4.astype(jnp.int8))[200:]).max() == 0
        x = jnp.asarray(np.random.default_rng(14).standard_normal((4, 256)),
                        jnp.float32)
        out = int4_matmul(x, q4, s, out_dtype=jnp.float32, n_out=200)
        assert out.shape == (4, 200)
        # float oracle: the kernel row-quantizes x to A8 (<=0.8% class)
        ref = np.asarray(x) @ np.asarray(dequant_int4(q4, s)).T[:, :200]
        assert np.abs(np.asarray(out) - ref).max() / (
            np.abs(ref).max() + 1e-9) < 0.02


class TestInt4Matmul:
    def _a8_reference(self, x, q4, s):
        """Exact jnp model of the kernel arithmetic."""
        n, kp = q4.shape
        x32 = np.asarray(x, np.float32)
        if x32.shape[1] != kp:
            x32 = np.pad(x32, ((0, 0), (0, kp - x32.shape[1])))
        sx = np.maximum(np.abs(x32).max(1, keepdims=True) / 127.0, 1e-12)
        xq = np.clip(np.round(x32 / sx), -127, 127)
        w = np.asarray(q4.astype(jnp.int8), np.float32)
        sc = np.asarray(s)
        acc = sum((xq[:, b*INT4_BLOCK:(b+1)*INT4_BLOCK]
                   @ w[:, b*INT4_BLOCK:(b+1)*INT4_BLOCK].T) * sc[b][None, :]
                  for b in range(kp // INT4_BLOCK))
        return acc * sx

    @pytest.mark.parametrize("m,n,k", [(1, 256, 512), (8, 384, 256),
                                       (16, 256, 200)])
    def test_kernel_matches_own_arithmetic(self, m, n, k):
        rng = np.random.default_rng(3)
        q4, s = quantize_int4(jnp.asarray(_mk(n, k, seed=4)))
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        got = np.asarray(int4_matmul(x, q4, s, out_dtype=jnp.float32))
        ref = self._a8_reference(x, q4, s)
        assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9) < 1e-5

    def test_large_m_xla_path_matches_dequant(self):
        q4, s = quantize_int4(jnp.asarray(_mk(256, 256, seed=5)))
        x = jnp.asarray(np.random.default_rng(6).standard_normal((128, 256)),
                        jnp.float32)
        got = np.asarray(int4_matmul(x, q4, s, out_dtype=jnp.float32))
        ref = np.asarray(x) @ np.asarray(dequant_int4(q4, s)).T
        assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9) < 1e-3

    def test_bias_and_dtype(self):
        q4, s = quantize_int4(jnp.asarray(_mk(256, 256, seed=7)))
        x = jnp.asarray(np.random.default_rng(8).standard_normal((2, 256)),
                        jnp.float32)
        bias = jnp.arange(256, dtype=jnp.float32) * 0.01
        got = int4_matmul(x, q4, s, bias=bias, out_dtype=jnp.bfloat16)
        assert got.dtype == jnp.bfloat16
        base = int4_matmul(x, q4, s, out_dtype=jnp.float32)
        diff = np.asarray(got, np.float32) - np.asarray(base)
        assert np.allclose(diff, np.asarray(bias)[None, :], atol=0.05)

    def test_grad_flows_to_x(self):
        q4, s = quantize_int4(jnp.asarray(_mk(128, 256, seed=9)))
        x = jnp.asarray(np.random.default_rng(10).standard_normal((4, 256)),
                        jnp.float32)

        def loss(xx):
            return jnp.sum(int4_matmul(xx, q4, s,
                                       out_dtype=jnp.float32) ** 2)

        g = jax.grad(loss)(x)
        y = int4_matmul(x, q4, s, out_dtype=jnp.float32)
        ref = 2 * np.asarray(y) @ np.asarray(dequant_int4(q4, s))
        assert np.abs(np.asarray(g) - ref).max() / (np.abs(ref).max()
                                                    + 1e-9) < 1e-4


class TestQLinear4Int4Cache:
    def test_tracks_true_nf4_linear(self):
        """The int4 cache is a REQUANTIZATION: FP4-class tolerance vs the
        exact NF4 forward (looser than the int8 cache's contract)."""
        rng = np.random.default_rng(11)
        w = _mk(512, 1024, seed=11)
        q = QLinear4.quantize(jnp.asarray(w), dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal((8, 1024)), jnp.float32)
        exact = np.asarray(q(x))
        qi4 = q.with_runtime_cache("int4")
        assert qi4.w_cache.dtype == jnp.int4
        got = np.asarray(qi4(x))
        assert not np.allclose(exact, got)
        cos = (exact * got).sum() / (np.linalg.norm(exact)
                                     * np.linalg.norm(got) + 1e-9)
        assert cos > 0.99
        rel = np.abs(got - exact).max() / (np.abs(exact).max() + 1e-9)
        assert rel < 0.08

    def test_footprint_counts_packed_s4(self):
        from tpu_bitsandbytes.utils.metrics import param_footprint
        q = QLinear4.quantize(jnp.asarray(_mk(128, 256, seed=12)),
                              dtype=jnp.float32)
        qi4 = q.with_runtime_cache("int4")
        fp = param_footprint({"layers": [{"w": qi4}]})
        assert fp["exec_cache"] == (128 * 256 // 2
                                    + (256 // INT4_BLOCK) * 128 * 4)
        assert qi4.hbm_bytes() == fp["exec_cache"]

    def test_engine_decodes_with_int4_cache(self):
        from tpu_bitsandbytes.models import llama
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg = llama.LlamaConfig(
            vocab_size=128, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=2, num_kv_heads=2, max_seq_len=64,
            dtype=jnp.float32)
        params = llama.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
        q = llama.quantize_params(params, blocksize=32, dtype=jnp.float32)
        ref = DecodeEngine(q, cfg, max_batch=2, max_seq=64,
                           runtime_cache="int8").generate(
            [[1, 2, 3]], SamplingParams(max_new_tokens=6))[0]
        out = DecodeEngine(q, cfg, max_batch=2, max_seq=64,
                           runtime_cache="int4").generate(
            [[1, 2, 3]], SamplingParams(max_new_tokens=6))[0]
        assert len(out) == 6
        assert all(0 <= t < cfg.vocab_size for t in out)
        # int4 is a lossier format: tokens may diverge from int8, but both
        # decode the same model — require agreement on the first token at
        # least (tiny random model, wide logit gaps)
        assert out[0] == ref[0]
