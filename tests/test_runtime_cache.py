"""Runtime execution cache tests.

The int8/bf16 runtime cache is the TPU decode execution format (NF4 stays
the storage format): XLA's convert+dot reaches ~750 GB/s where every
in-kernel 4-bit decode formulation hits a VPU wall (kbench/probe2,
KERNEL_NOTES.md). These tests pin the numerics contract of that trade:

* bf16 cache = exact NF4 numerics (same dequantized weight, bf16-rounded);
* int8 cache adds bounded re-quantization error on top of NF4
  (per-output-row symmetric, <= 0.5/127 of the row max);
* cache leaves shard like dense weights, never enter checkpoints, and are
  rebuildable from the packed codes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_bitsandbytes.models.layers import QLinear4
from tpu_bitsandbytes.models import llama
from tpu_bitsandbytes.functional import dequantize_4bit


@pytest.fixture
def qlin(rng):
    w = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32)) * 0.05
    return QLinear4.quantize(w, blocksize=32, dtype=jnp.float32)


class TestWithRuntimeCache:
    def test_bf16_cache_matches_dequant(self, qlin):
        """bf16 cache must be exactly the bf16-rounded NF4 dequant."""
        q = qlin.with_runtime_cache("bf16")
        ref = dequantize_4bit(qlin.packed.reshape(-1), qlin.quant_state())
        assert q.w_cache.dtype == jnp.bfloat16
        assert np.array_equal(
            np.asarray(q.w_cache, np.float32),
            np.asarray(ref.astype(jnp.bfloat16), np.float32))
        assert q.cache_scale is None

    def test_int8_cache_rowmax_error_bound(self, qlin):
        """int8 requantization error <= (0.5/127) * per-row max |w|."""
        q = qlin.with_runtime_cache("int8")
        ref = np.asarray(
            dequantize_4bit(qlin.packed.reshape(-1), qlin.quant_state()),
            np.float32)
        got = (np.asarray(q.w_cache, np.float32)
               * np.asarray(q.cache_scale)[:, None])
        rowmax = np.abs(ref).max(axis=1, keepdims=True)
        assert np.all(np.abs(got - ref) <= 0.5 / 127.0 * rowmax + 1e-12)

    def test_forward_consistency(self, qlin, rng):
        """Cached forwards track the packed NF4 forward closely."""
        x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
        base = np.asarray(qlin(x), np.float32)
        for fmt, tol in (("bf16", 2e-2), ("int8", 2e-2)):
            got = np.asarray(qlin.with_runtime_cache(fmt)(x), np.float32)
            denom = np.abs(base).mean() + 1e-9
            assert np.abs(got - base).mean() / denom < tol, fmt

    def test_unknown_format_raises(self, qlin):
        with pytest.raises(ValueError, match="runtime cache"):
            qlin.with_runtime_cache("fp42")

    def test_hbm_bytes_reflect_execution_format(self, qlin):
        packed_bytes = qlin.hbm_bytes()
        q8 = qlin.with_runtime_cache("int8")
        q16 = qlin.with_runtime_cache("bf16")
        n, k = qlin.shape
        assert q8.hbm_bytes() == n * k + n * 4     # int8 + f32 row scale
        assert q16.hbm_bytes() == n * k * 2
        assert packed_bytes < q8.hbm_bytes() < q16.hbm_bytes()

    def test_drop_packed_frees_storage(self, qlin):
        q = qlin.with_runtime_cache("int8", drop_packed=True)
        assert q.packed is None and q.absmax is None
        # forward still works off the cache
        x = jnp.zeros((1, qlin.shape[1]), jnp.float32)
        assert q(x).shape == (1, qlin.shape[0])

    def test_drop_packed_refuses_checkpoint(self, qlin, tmp_path):
        from tpu_bitsandbytes.utils.checkpoint import save_checkpoint
        q = qlin.with_runtime_cache("int8", drop_packed=True)
        with pytest.raises(TypeError, match="packed codes were dropped"):
            save_checkpoint(str(tmp_path / "ck"), {"lin": q})

    def test_cache_not_checkpointed(self, qlin, tmp_path):
        """Runtime caches are derived state: save packed-only, rebuild."""
        from tpu_bitsandbytes.utils.checkpoint import (save_checkpoint,
                                                       load_checkpoint)
        q = qlin.with_runtime_cache("int8")
        save_checkpoint(str(tmp_path / "ck"), {"lin": q})
        loaded = load_checkpoint(str(tmp_path / "ck"))["lin"]
        assert loaded.w_cache is None
        rebuilt = loaded.with_runtime_cache("int8")
        assert np.array_equal(np.asarray(rebuilt.w_cache),
                              np.asarray(q.w_cache))


class TestBuildRuntimeCache:
    def test_model_decode_consistency(self, rng):
        """Greedy decode with the int8 cache matches the packed NF4 path
        on first tokens (same contract as quantized-KV closeness)."""
        cfg = llama.LlamaConfig.tiny()
        params = llama.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
        qparams = llama.quantize_params(params, dtype=jnp.float32)
        cparams = llama.build_runtime_cache(qparams, "int8")

        n_q = sum(isinstance(l, QLinear4)
                  for l in jax.tree_util.tree_leaves(
                      cparams,
                      is_leaf=lambda x: isinstance(x, QLinear4)))
        n_cached = sum(l.w_cache is not None
                       for l in jax.tree_util.tree_leaves(
                           cparams,
                           is_leaf=lambda x: isinstance(x, QLinear4))
                       if isinstance(l, QLinear4))
        assert n_q == n_cached > 0

        ids = jnp.asarray([list(rng.integers(0, cfg.vocab_size, 6))])
        la = llama.forward(qparams, ids, cfg)
        lb = llama.forward(cparams, ids, cfg)
        assert int(jnp.argmax(la[0, -1])) == int(jnp.argmax(lb[0, -1]))

    def test_engine_runtime_cache_arg(self, rng):
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg = llama.LlamaConfig.tiny()
        params = llama.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
        qparams = llama.quantize_params(params, dtype=jnp.float32)
        e = DecodeEngine(qparams, cfg, max_batch=2, max_seq=64,
                         runtime_cache="int8")
        prompts = [list(rng.integers(0, cfg.vocab_size, 4))]
        outs = e.generate(prompts, SamplingParams(max_new_tokens=3))
        assert len(outs[0]) == 3
