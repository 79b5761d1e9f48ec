"""Multi-device SPMD tests on the 8-device virtual CPU mesh (SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_bitsandbytes.models import llama
from tpu_bitsandbytes.models.lora import attach_lora, lora_trainable
from tpu_bitsandbytes.engine import KVCache, DecodeEngine, SamplingParams
from tpu_bitsandbytes.parallel import (
    make_mesh, shard_params, llama_param_specs, make_tp_decode_step,
    make_qlora_train_step, kv_cache_spec,
)
from jax.sharding import NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def tp_model():
    # dims divisible by tp=4: heads 4, kv heads 4, hidden 128, inter 256
    cfg = llama.LlamaConfig(vocab_size=512, hidden_size=128,
                            intermediate_size=256, num_layers=2, num_heads=4,
                            num_kv_heads=4, max_seq_len=64, dtype=jnp.float32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


class TestShardParams:
    def test_quantized_params_shard(self, tp_model):
        cfg, params = tp_model
        qparams = llama.quantize_params(params, blocksize=32,
                                        dtype=jnp.float32)
        mesh = make_mesh(tp=4, dp=2)
        sharded = shard_params(qparams, mesh)
        q = sharded["layers"][0]["q_proj"]
        # column-parallel: packed rows sharded over tp
        assert q.packed.sharding.spec == P("tp", None)
        assert q.absmax.sharding.spec == P("tp", None)
        d = sharded["layers"][0]["down_proj"]
        assert d.packed.sharding.spec == P(None, "tp")

    def test_fp_params_shard(self, tp_model):
        cfg, params = tp_model
        mesh = make_mesh(tp=4, dp=2)
        sharded = shard_params(params, mesh)
        assert sharded["layers"][0]["q_proj"].sharding.spec == P("tp", None)


class TestTPDecode:
    @pytest.mark.parametrize("quantize_weights", [False, True])
    def test_tp_decode_matches_single_device(self, tp_model, rng,
                                             quantize_weights):
        cfg, params = tp_model
        if quantize_weights:
            params = llama.quantize_params(params, blocksize=32,
                                           dtype=jnp.float32)
        mesh = make_mesh(tp=4, dp=2)
        sharded = shard_params(params, mesh)
        batch = 4  # dp-sharded into 2x2
        cache = KVCache.create(cfg.num_layers, batch, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
        cache = jax.device_put(
            cache, jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), kv_cache_spec(cache),
                is_leaf=lambda x: isinstance(x, P)))
        step = make_tp_decode_step(mesh, sharded, cfg, cache)

        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)),
                             dtype=jnp.int32)
        active = jnp.ones((batch,), bool)
        logits_tp, cache2 = step(sharded, cache, tokens, active)

        # single-device oracle
        from tpu_bitsandbytes.engine import decode_step
        cache_ref = KVCache.create(cfg.num_layers, batch, 32,
                                   cfg.num_kv_heads, cfg.hd, quantized=False,
                                   dtype=jnp.float32)
        logits_ref, _ = decode_step(params, cache_ref, tokens, active, cfg)
        np.testing.assert_allclose(np.asarray(logits_tp),
                                   np.asarray(logits_ref), atol=2e-3)
        assert np.all(np.asarray(cache2.lengths) == 1)

    def test_tp_decode_dq_absmax_matches_single_device(self, tp_model, rng):
        """Double-quantized absmax shards (per-row nested layout): TP decode
        must reproduce the single-device decode on the same params."""
        cfg, params = tp_model
        qparams = llama.quantize_params(params, blocksize=32,
                                        dtype=jnp.float32,
                                        compress_statistics=True)
        q = qparams["layers"][0]["q_proj"]
        assert q.absmax is None and q.absmax_q is not None
        mesh = make_mesh(tp=4, dp=2)
        sharded = shard_params(qparams, mesh)
        sq = sharded["layers"][0]["q_proj"]
        assert sq.absmax_q.sharding.spec == P("tp", None)
        assert sq.absmax_state.absmax.sharding.spec == P("tp")
        sd = sharded["layers"][0]["down_proj"]
        assert sd.absmax_q.sharding.spec == P(None, "tp")

        batch = 4
        cache = KVCache.create(cfg.num_layers, batch, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
        cache = jax.device_put(
            cache, jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), kv_cache_spec(cache),
                is_leaf=lambda x: isinstance(x, P)))
        step = make_tp_decode_step(mesh, sharded, cfg, cache)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)),
                             dtype=jnp.int32)
        active = jnp.ones((batch,), bool)
        logits_tp, _ = step(sharded, cache, tokens, active)

        from tpu_bitsandbytes.engine import decode_step
        cache_ref = KVCache.create(cfg.num_layers, batch, 32,
                                   cfg.num_kv_heads, cfg.hd, quantized=False,
                                   dtype=jnp.float32)
        logits_ref, _ = decode_step(qparams, cache_ref, tokens, active, cfg)
        np.testing.assert_allclose(np.asarray(logits_tp),
                                   np.asarray(logits_ref), atol=2e-3)

    def test_tp_fused_projections_match_unfused(self, tp_model, rng):
        """Shard-interleaved fused qkv/gateup layout: TP decode over the
        fused params must match the single-device unfused decode."""
        cfg, params = tp_model
        q_unfused = llama.quantize_params(params, blocksize=32,
                                          dtype=jnp.float32)
        q_fused = llama.quantize_params(params, blocksize=32,
                                        dtype=jnp.float32,
                                        fuse_projections=True, tp=4)
        assert "qkv_proj" in q_fused["layers"][0]
        mesh = make_mesh(tp=4, dp=2)
        sharded = shard_params(q_fused, mesh)
        assert (sharded["layers"][0]["qkv_proj"].packed.sharding.spec
                == P("tp", None))

        batch = 4
        cache = KVCache.create(cfg.num_layers, batch, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
        cache = jax.device_put(
            cache, jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), kv_cache_spec(cache),
                is_leaf=lambda x: isinstance(x, P)))
        step = make_tp_decode_step(mesh, sharded, cfg, cache)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)),
                             dtype=jnp.int32)
        active = jnp.ones((batch,), bool)
        logits_tp, _ = step(sharded, cache, tokens, active)

        from tpu_bitsandbytes.engine import decode_step
        cache_ref = KVCache.create(cfg.num_layers, batch, 32,
                                   cfg.num_kv_heads, cfg.hd, quantized=False,
                                   dtype=jnp.float32)
        logits_ref, _ = decode_step(q_unfused, cache_ref, tokens, active, cfg)
        np.testing.assert_allclose(np.asarray(logits_tp),
                                   np.asarray(logits_ref), atol=2e-3)

    def test_interleave_rows_layout(self):
        """Shard i of the interleaved fused weight == concat of shard i of
        each constituent matrix."""
        q = jnp.arange(8 * 3).reshape(8, 3) * 1.0
        k = jnp.arange(4 * 3).reshape(4, 3) + 100.0
        v = jnp.arange(4 * 3).reshape(4, 3) + 200.0
        fused = llama._interleave_rows([q, k, v], tp=4)
        rows_per = fused.shape[0] // 4
        for i in range(4):
            shard = fused[i * rows_per:(i + 1) * rows_per]
            expect = jnp.concatenate([q[i * 2:(i + 1) * 2],
                                      k[i * 1:(i + 1) * 1],
                                      v[i * 1:(i + 1) * 1]], axis=0)
            np.testing.assert_array_equal(np.asarray(shard),
                                          np.asarray(expect))

    def test_multi_step_consistency(self, tp_model, rng):
        cfg, params = tp_model
        mesh = make_mesh(tp=4, dp=2)
        sharded = shard_params(params, mesh)
        batch = 2
        mesh2 = make_mesh(tp=4, dp=2)
        cache = KVCache.create(cfg.num_layers, batch, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
        cache = jax.device_put(
            cache, jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh2, s), kv_cache_spec(cache),
                is_leaf=lambda x: isinstance(x, P)))
        step = make_tp_decode_step(mesh2, sharded, cfg, cache)
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)),
                           dtype=jnp.int32)
        active = jnp.ones((batch,), bool)
        for i in range(3):
            logits, cache = step(sharded, cache, toks, active)
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        assert np.all(np.asarray(cache.lengths) == 3)
        assert np.all(np.isfinite(np.asarray(logits)))


class TestQLoRATrainStep:
    def test_sharded_qlora_step_runs(self, tp_model, rng):
        cfg, params = tp_model
        qparams = llama.quantize_params(params, dtype=jnp.float32)
        lparams = attach_lora(qparams, jax.random.PRNGKey(1), rank=4,
                              dtype=jnp.float32)
        mesh = make_mesh(tp=4, dp=2)
        # LoRA-attached params: shard base leaves; adapters replicated
        trainable = lora_trainable(lparams)
        init_opt, train_step = make_qlora_train_step(cfg)
        opt_state = init_opt(trainable)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 16)),
                             dtype=jnp.int32)
        t2, opt2, loss1 = train_step(trainable, opt_state, lparams, tokens)
        t3, opt3, loss2 = train_step(t2, opt2, lparams, tokens)
        assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
        assert float(loss2) < float(loss1)  # same batch: loss must drop
        # base packed weights untouched; adapters changed
        a0 = np.asarray(trainable["layers/0/q_proj"]["B"])
        a2 = np.asarray(t2["layers/0/q_proj"]["B"])
        assert not np.allclose(a0, a2)


class TestMeshEngine:
    def test_engine_with_mesh_matches_single_device(self, tp_model, rng):
        """Multi-chip serving engine: mesh-mode generate must reproduce the
        single-device engine's greedy tokens."""
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg, params = tp_model
        prompts = [list(rng.integers(0, cfg.vocab_size, 5)) for _ in range(3)]
        sp = SamplingParams(max_new_tokens=4)

        single = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                              quantized_kv=False)
        ref = single.generate(prompts, sp)

        mesh = make_mesh(tp=4, dp=2)
        multi = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                             quantized_kv=False, mesh=mesh)
        out = multi.generate(prompts, sp)
        assert out == ref

    def test_engine_mesh_quantized(self, tp_model, rng):
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg, params = tp_model
        qparams = llama.quantize_params(params, blocksize=32,
                                        dtype=jnp.float32)
        mesh = make_mesh(tp=4, dp=2)
        eng = DecodeEngine(qparams, cfg, max_batch=2, max_seq=64,
                           quantized_kv=True, mesh=mesh)
        outs = eng.generate(
            [list(rng.integers(0, cfg.vocab_size, 4)) for _ in range(3)],
            SamplingParams(max_new_tokens=3))
        assert all(len(o) == 3 for o in outs)

    def test_engine_mesh_mixed_sampling_and_step_path(self, tp_model, rng):
        """Chunked mesh decode: mixed per-slot sampling params run in one
        device chunk; greedy slots stay token-identical to single-device,
        on both the pipelined generate() and the per-chunk step() paths."""
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg, params = tp_model
        prompts = [list(rng.integers(0, cfg.vocab_size, 5)) for _ in range(3)]
        sps = [SamplingParams(max_new_tokens=6),
               SamplingParams(max_new_tokens=6, temperature=0.8, top_k=20),
               SamplingParams(max_new_tokens=6, temperature=0.7, top_p=0.9)]

        def run(eng, pipelined):
            uids = [eng.add_request(p, s) for p, s in zip(prompts, sps)]
            if pipelined:
                eng.run_pipelined(2)
            else:
                while eng.step():
                    pass
            by = {r.uid: r.generated for r in eng.finished}
            return [by[u] for u in uids]

        single = DecodeEngine(params, cfg, max_batch=4, max_seq=64,
                              quantized_kv=False)
        ref = run(single, pipelined=True)

        mesh = make_mesh(tp=4, dp=2)
        multi = DecodeEngine(params, cfg, max_batch=4, max_seq=64,
                             quantized_kv=False, mesh=mesh)
        out = run(multi, pipelined=True)
        assert out[0] == ref[0]          # greedy slot: token-identical
        for o in out[1:]:                # sampled slots: valid emissions
            assert len(o) == 6
            assert all(0 <= t < cfg.vocab_size for t in o)

        mesh2 = make_mesh(tp=4, dp=2)
        stepper = DecodeEngine(params, cfg, max_batch=4, max_seq=64,
                               quantized_kv=False, mesh=mesh2)
        out2 = run(stepper, pipelined=False)
        assert out2[0] == ref[0]

    def test_engine_mesh_runtime_cache_matches_single_device(self, tp_model,
                                                             rng):
        """The production decode config — NF4 storage + int8 runtime
        execution cache — must produce identical greedy tokens on the mesh
        (w_cache/cache_scale shard like dense weights) and single-device."""
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg, params = tp_model
        qparams = llama.quantize_params(params, blocksize=32,
                                        dtype=jnp.float32)
        prompts = [list(rng.integers(0, cfg.vocab_size, 5)) for _ in range(3)]
        sp = SamplingParams(max_new_tokens=5)

        single = DecodeEngine(qparams, cfg, max_batch=2, max_seq=64,
                              runtime_cache="int8")
        ref = single.generate(prompts, sp)

        mesh = make_mesh(tp=4, dp=2)
        multi = DecodeEngine(qparams, cfg, max_batch=2, max_seq=64,
                             runtime_cache="int8", mesh=mesh)
        out = multi.generate(prompts, sp)
        assert out == ref

    def test_engine_mesh_int4_cache_shards_and_serves(self, tp_model, rng):
        """runtime_cache='int4' under a mesh (VERDICT r4 #2): the cache is
        built PER SHARD (parallel.sharding.build_sharded_int4_cache — jax
        0.9 cannot device_put S4 under a NamedSharding) with the documented
        shardings, and the engine generates. This config's row-parallel
        K/tp=32 < INT4_BLOCK, so per-shard scale blocks are finer than the
        unsharded engine's — correct but not bit-identical (the exact-parity
        contract, aligned K/tp, is the next test)."""
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg, params = tp_model
        qparams = llama.quantize_params(params, blocksize=32,
                                        dtype=jnp.float32)
        prompts = [list(rng.integers(0, cfg.vocab_size, 5)) for _ in range(3)]
        sp = SamplingParams(max_new_tokens=5)

        mesh = make_mesh(tp=4, dp=2)
        multi = DecodeEngine(qparams, cfg, max_batch=2, max_seq=64,
                             runtime_cache="int4", mesh=mesh)
        q = multi.params["layers"][0]["q_proj"]
        assert q.w_cache.dtype == jnp.int4
        assert q.w_cache.sharding.spec == P("tp", None)
        assert q.cache_scale.sharding.spec == P(None, "tp")
        down = multi.params["layers"][0]["down_proj"]
        assert down.w_cache.sharding.spec == P(None, "tp")
        assert down.cache_scale.sharding.spec == P("tp", None)
        out = multi.generate(prompts, sp)
        assert all(len(o) == 5 for o in out)
        assert all(0 <= t < cfg.vocab_size for o in out for t in o)

    def test_engine_mesh_int4_cache_kernel_tile_path(self, rng):
        """Same parity with per-shard dims large enough (>=128 rows/shard)
        that int4_matmul takes the Pallas kernel path inside shard_map, and
        with drop_packed serving mode (packed leaves stripped after the
        per-shard build — _localize derives dims from the global shape)."""
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg = llama.LlamaConfig(vocab_size=256, hidden_size=512,
                                intermediate_size=512, num_layers=1,
                                num_heads=4, num_kv_heads=4, max_seq_len=64,
                                dtype=jnp.float32)
        params = llama.init_params(jax.random.PRNGKey(3), cfg,
                                   dtype=jnp.float32)
        qparams = llama.quantize_params(params, blocksize=64,
                                        dtype=jnp.float32)
        prompts = [list(rng.integers(0, cfg.vocab_size, 5)) for _ in range(2)]
        sp = SamplingParams(max_new_tokens=4)

        single = DecodeEngine(qparams, cfg, max_batch=2, max_seq=64,
                              runtime_cache="int4", drop_packed=True)
        ref = single.generate(prompts, sp)

        mesh = make_mesh(tp=4, dp=2)
        multi = DecodeEngine(qparams, cfg, max_batch=2, max_seq=64,
                             runtime_cache="int4", drop_packed=True,
                             mesh=mesh)
        assert multi.params["layers"][0]["q_proj"].packed is None
        out = multi.generate(prompts, sp)
        assert out == ref

    def test_engine_mesh_batch_divisibility(self, tp_model):
        from tpu_bitsandbytes.engine import DecodeEngine
        cfg, params = tp_model
        mesh = make_mesh(tp=4, dp=2)
        with pytest.raises(ValueError, match="must divide"):
            DecodeEngine(params, cfg, max_batch=3, mesh=mesh)

    def test_engine_mesh_speculative_matches_plain_greedy(self, tp_model,
                                                          rng):
        """Mesh speculative decoding (VERDICT r3 #8): the ngram verify step
        runs through the shard_map verify (parallel.tp.make_tp_verify_step)
        on the (dp=2, tp=4) mesh and stays token-identical to plain greedy
        decoding on the single-device engine."""
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg, params = tp_model
        base = list(rng.integers(0, cfg.vocab_size, 4))
        prompts = [(base * 5)[:14],             # repetitive: ngram hits
                   list(rng.integers(0, cfg.vocab_size, 6))]
        sp = SamplingParams(max_new_tokens=8)

        plain = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                             quantized_kv=False)
        ref = plain.generate(prompts, sp)

        mesh = make_mesh(tp=4, dp=2)
        spec = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                            quantized_kv=False, mesh=mesh,
                            speculative="ngram", spec_gamma=3)
        out = spec.generate(prompts, sp)
        assert out == ref
        assert spec.spec_stats["verify_steps"] > 0
        assert spec.spec_stats["accepted"] <= spec.spec_stats["drafted"]


class TestTPQwen2Bias:
    """Qwen2-style q/k/v biases under TP: column-parallel bias shards with
    its rows (quantized QLinear4.bias and fp {'w','b'} dict leaves both)."""

    @pytest.fixture(scope="class")
    def qwen_model(self):
        cfg = llama.LlamaConfig(vocab_size=512, hidden_size=128,
                                intermediate_size=256, num_layers=2,
                                num_heads=4, num_kv_heads=4, max_seq_len=64,
                                dtype=jnp.float32, attention_bias=True,
                                rope_theta=1000000.0)
        params = llama.init_params(jax.random.PRNGKey(5), cfg,
                                   dtype=jnp.float32)
        return cfg, params

    @pytest.mark.parametrize("quantize_weights", [False, True])
    def test_tp_biased_decode_matches_single_device(self, qwen_model, rng,
                                                    quantize_weights):
        cfg, params = qwen_model
        if quantize_weights:
            params = llama.quantize_params(params, blocksize=32,
                                           dtype=jnp.float32)
            assert params["layers"][0]["q_proj"].bias is not None
        mesh = make_mesh(tp=4, dp=2)
        sharded = shard_params(params, mesh)
        if quantize_weights:
            assert (sharded["layers"][0]["q_proj"].bias.sharding.spec
                    == P("tp"))
        else:
            assert (sharded["layers"][0]["q_proj"]["b"].sharding.spec
                    == P("tp"))
        batch = 4
        cache = KVCache.create(cfg.num_layers, batch, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
        cache = jax.device_put(
            cache, jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), kv_cache_spec(cache),
                is_leaf=lambda x: isinstance(x, P)))
        step = make_tp_decode_step(mesh, sharded, cfg, cache)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)),
                             dtype=jnp.int32)
        active = jnp.ones((batch,), bool)
        logits_tp, _ = step(sharded, cache, tokens, active)

        from tpu_bitsandbytes.engine import decode_step
        cache_ref = KVCache.create(cfg.num_layers, batch, 32,
                                   cfg.num_kv_heads, cfg.hd, quantized=False,
                                   dtype=jnp.float32)
        logits_ref, _ = decode_step(params, cache_ref, tokens, active, cfg)
        np.testing.assert_allclose(np.asarray(logits_tp),
                                   np.asarray(logits_ref), atol=2e-3)

    def test_tp_fused_biased_projections(self, qwen_model, rng):
        """Fused qkv with interleaved biases stays TP-shardable and exact
        vs the unfused quantized model."""
        cfg, params = qwen_model
        q_unf = llama.quantize_params(params, blocksize=32,
                                      dtype=jnp.float32)
        q_fus = llama.quantize_params(params, blocksize=32,
                                      dtype=jnp.float32,
                                      fuse_projections=True, tp=4)
        mesh = make_mesh(tp=4, dp=2)
        sh_f = shard_params(q_fus, mesh)
        assert sh_f["layers"][0]["qkv_proj"].bias.sharding.spec == P("tp")
        batch = 4
        cache = KVCache.create(cfg.num_layers, batch, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
        cache = jax.device_put(
            cache, jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), kv_cache_spec(cache),
                is_leaf=lambda x: isinstance(x, P)))
        step = make_tp_decode_step(mesh, sh_f, cfg, cache)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)),
                             dtype=jnp.int32)
        active = jnp.ones((batch,), bool)
        logits_tp, _ = step(sh_f, cache, tokens, active)

        from tpu_bitsandbytes.engine import decode_step
        cache_ref = KVCache.create(cfg.num_layers, batch, 32,
                                   cfg.num_kv_heads, cfg.hd, quantized=False,
                                   dtype=jnp.float32)
        logits_ref, _ = decode_step(q_unf, cache_ref, tokens, active, cfg)
        np.testing.assert_allclose(np.asarray(logits_tp),
                                   np.asarray(logits_ref), atol=2e-3)


class TestTPGemma2:
    """Gemma2 knobs (sandwich norms, softcaps, alternating window, fixed
    attention scale) flow through the shard_map TP decode unchanged."""

    def test_tp_gemma2_decode_matches_single_device(self, rng):
        cfg = llama.LlamaConfig(vocab_size=512, hidden_size=128,
                                intermediate_size=256, num_layers=4,
                                num_heads=4, num_kv_heads=4, head_dim=32,
                                max_seq_len=64, dtype=jnp.float32,
                                rms_eps=1e-6, tie_embeddings=True,
                                hidden_act="gelu_tanh", rms_weight_offset=1.0,
                                scale_embeddings=True, post_norms=True,
                                attn_logit_softcap=20.0,
                                final_logit_softcap=10.0,
                                query_pre_attn_scalar=16.0, sliding_window=8,
                                sliding_window_pattern=2)
        params = llama.init_params(jax.random.PRNGKey(9), cfg,
                                   dtype=jnp.float32)
        qparams = llama.quantize_params(params, blocksize=32,
                                        dtype=jnp.float32)
        mesh = make_mesh(tp=4, dp=2)
        sharded = shard_params(qparams, mesh)
        batch = 4
        cache = KVCache.create(cfg.num_layers, batch, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
        cache = jax.device_put(
            cache, jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), kv_cache_spec(cache),
                is_leaf=lambda x: isinstance(x, P)))
        step = make_tp_decode_step(mesh, sharded, cfg, cache)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)),
                             dtype=jnp.int32)
        active = jnp.ones((batch,), bool)
        logits_tp, _ = step(sharded, cache, tokens, active)

        from tpu_bitsandbytes.engine import decode_step
        cache_ref = KVCache.create(cfg.num_layers, batch, 32,
                                   cfg.num_kv_heads, cfg.hd, quantized=False,
                                   dtype=jnp.float32)
        logits_ref, _ = decode_step(qparams, cache_ref, tokens, active, cfg)
        np.testing.assert_allclose(np.asarray(logits_tp),
                                   np.asarray(logits_ref), atol=2e-3)


class TestQLoRARemat:
    def test_remat_step_matches_plain(self, tp_model, rng):
        """jax.checkpoint per layer must not change loss or updates."""
        from tpu_bitsandbytes.parallel.train import make_qlora_train_step
        cfg, params = tp_model
        qp = llama.quantize_params(params, blocksize=32, dtype=jnp.float32)
        qp = attach_lora(qp, rank=4, key=jax.random.PRNGKey(1))
        trainable = lora_trainable(qp)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)),
                             dtype=jnp.int32)
        init_a, step_a = make_qlora_train_step(cfg)
        init_b, step_b = make_qlora_train_step(cfg, remat=True)
        ta, oa, la = step_a(trainable, init_a(trainable), qp, tokens)
        tb, ob, lb = step_b(trainable, init_b(trainable), qp, tokens)
        assert np.allclose(float(la), float(lb), rtol=1e-6)
        for x, y in zip(jax.tree_util.tree_leaves(ta),
                        jax.tree_util.tree_leaves(tb)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-6)


class TestTPMixtral:
    """MoE experts shard like the dense MLP (gate/up columns, down rows);
    expert partials sum locally before ONE psum per layer."""

    def test_tp_moe_decode_matches_single_device(self, rng):
        cfg = llama.LlamaConfig(vocab_size=512, hidden_size=128,
                                intermediate_size=256, num_layers=2,
                                num_heads=4, num_kv_heads=4, max_seq_len=64,
                                dtype=jnp.float32, num_experts=4,
                                experts_per_token=2)
        params = llama.init_params(jax.random.PRNGKey(11), cfg,
                                   dtype=jnp.float32)
        qparams = llama.quantize_params(params, blocksize=32,
                                        dtype=jnp.float32)
        mesh = make_mesh(tp=4, dp=2)
        sharded = shard_params(qparams, mesh)
        e0 = sharded["layers"][0]["moe"]["experts"][0]
        assert e0["gate_proj"].packed.sharding.spec == P("tp", None)
        assert e0["down_proj"].packed.sharding.spec == P(None, "tp")
        assert (sharded["layers"][0]["moe"]["router"].sharding.spec
                == P())
        batch = 4
        cache = KVCache.create(cfg.num_layers, batch, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
        cache = jax.device_put(
            cache, jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), kv_cache_spec(cache),
                is_leaf=lambda x: isinstance(x, P)))
        step = make_tp_decode_step(mesh, sharded, cfg, cache)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)),
                             dtype=jnp.int32)
        active = jnp.ones((batch,), bool)
        logits_tp, _ = step(sharded, cache, tokens, active)

        from tpu_bitsandbytes.engine import decode_step
        cache_ref = KVCache.create(cfg.num_layers, batch, 32,
                                   cfg.num_kv_heads, cfg.hd, quantized=False,
                                   dtype=jnp.float32)
        logits_ref, _ = decode_step(qparams, cache_ref, tokens, active, cfg)
        np.testing.assert_allclose(np.asarray(logits_tp),
                                   np.asarray(logits_ref), atol=2e-3)


class TestMeshServingFeatures:
    def test_mesh_penalty_and_logprobs_match_single_device(self, tp_model,
                                                           rng):
        """Greedy + strong repetition penalty is deterministic, so the mesh
        engine must reproduce the single-device engine token-for-token, and
        logprobs must arrive for every generated token."""
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg, params = tp_model
        qparams = llama.quantize_params(params, blocksize=32,
                                        dtype=jnp.float32)
        prompts = [list(rng.integers(0, cfg.vocab_size, n))
                   for n in (6, 9, 5, 11)]
        sp = SamplingParams(max_new_tokens=6, repetition_penalty=2.0,
                            logprobs=True)
        ref_eng = DecodeEngine(qparams, cfg, max_batch=4, max_seq=64,
                               quantized_kv=False)
        ref = ref_eng.generate(prompts, sp)
        mesh = make_mesh(tp=4, dp=2)
        eng = DecodeEngine(qparams, cfg, max_batch=4, max_seq=64,
                           quantized_kv=False, mesh=mesh)
        got = eng.generate(prompts, sp)
        assert got == ref
        by_uid = {r.uid: r for r in eng.finished}
        for uid, out in zip(range(1, 5), got):
            assert len(by_uid[uid].logprobs) == len(out)
        # penalty actually engaged: no repeats under a strong penalty
        assert all(len(set(o)) == len(o) for o in got)


class TestTPQwen2Moe:
    def test_tp_shared_expert_decode_matches_single_device(self, rng):
        cfg = llama.LlamaConfig(vocab_size=512, hidden_size=128,
                                intermediate_size=256, num_layers=2,
                                num_heads=4, num_kv_heads=4, max_seq_len=64,
                                dtype=jnp.float32, num_experts=4,
                                experts_per_token=2, moe_norm_topk=False,
                                # K dims must divide tp*blocksize = 128 for
                                # row-parallel absmax blocks
                                moe_intermediate_size=128,
                                moe_shared_expert_size=256)
        params = llama.init_params(jax.random.PRNGKey(17), cfg,
                                   dtype=jnp.float32)
        qparams = llama.quantize_params(params, blocksize=32,
                                        dtype=jnp.float32)
        mesh = make_mesh(tp=4, dp=2)
        sharded = shard_params(qparams, mesh)
        se = sharded["layers"][0]["moe"]["shared_expert"]
        assert se["gate_proj"].packed.sharding.spec == P("tp", None)
        assert se["down_proj"].packed.sharding.spec == P(None, "tp")
        assert (sharded["layers"][0]["moe"]["shared_gate"].sharding.spec
                == P())
        batch = 4
        cache = KVCache.create(cfg.num_layers, batch, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
        cache = jax.device_put(
            cache, jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), kv_cache_spec(cache),
                is_leaf=lambda x: isinstance(x, P)))
        step = make_tp_decode_step(mesh, sharded, cfg, cache)
        tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch,)),
                             dtype=jnp.int32)
        active = jnp.ones((batch,), bool)
        logits_tp, _ = step(sharded, cache, tokens, active)

        from tpu_bitsandbytes.engine import decode_step
        cache_ref = KVCache.create(cfg.num_layers, batch, 32,
                                   cfg.num_kv_heads, cfg.hd, quantized=False,
                                   dtype=jnp.float32)
        logits_ref, _ = decode_step(qparams, cache_ref, tokens, active, cfg)
        np.testing.assert_allclose(np.asarray(logits_tp),
                                   np.asarray(logits_ref), atol=2e-3)


class TestMeshChunkedPrefill:
    """VERDICT r2 #6: chunked prefill must work under the (dp, tp) mesh —
    the shard_map chunk step (parallel/tp.py make_tp_prefill_chunk) with
    dp-ownership-masked KV writes and owner-broadcast hidden states."""

    def test_mesh_chunked_matches_single_device(self, tp_model, rng):
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg, params = tp_model
        prompts = [list(rng.integers(0, cfg.vocab_size, n))
                   for n in (40, 7, 33)]
        sp = SamplingParams(max_new_tokens=5)
        ref = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                           quantized_kv=False).generate(prompts, sp)
        mesh = make_mesh(tp=4, dp=2)
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                         quantized_kv=False, mesh=mesh, prefill_chunk=16)
        got = e.generate(prompts, sp)
        assert got == ref

    def test_mesh_chunked_matches_unchunked_mesh(self, tp_model, rng):
        """Both engines on the mesh: chunked == whole-prompt prefill, on the
        step() path (per-chunk admission interleaving)."""
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg, params = tp_model
        prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (40, 9)]
        sp = SamplingParams(max_new_tokens=4)
        ref = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                           quantized_kv=False,
                           mesh=make_mesh(tp=4, dp=2)).generate(
            prompts, sp, pipeline_depth=1)
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                         quantized_kv=False, mesh=make_mesh(tp=4, dp=2),
                         prefill_chunk=16)
        got = e.generate(prompts, sp, pipeline_depth=1)
        assert got == ref

    def test_mesh_chunked_quantized_kv_first_token(self, tp_model, rng):
        """int8 KV: chunked mesh attends to requantized history — same
        quant-noise class as single-device chunked; first tokens agree."""
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg, params = tp_model
        prompt = list(rng.integers(0, cfg.vocab_size, 45))
        sp = SamplingParams(max_new_tokens=3)
        ref = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                           quantized_kv=True,
                           prefill_chunk=16).generate([prompt], sp)[0]
        mesh = make_mesh(tp=4, dp=2)
        got = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                           quantized_kv=True, mesh=mesh,
                           prefill_chunk=16).generate([prompt], sp)[0]
        assert got[0] == ref[0]


class TestMeshRingKV:
    """VERDICT r2 #6: the rolling KV buffer must work under the mesh —
    ring writes/reads operate on dp/tp-local shards, and kv_cache_spec
    carries the ring static aux."""

    def _cfg(self, max_seq=512, window=32):
        import dataclasses as _dc
        cfg = _dc.replace(llama.LlamaConfig.tiny_mistral(),
                          sliding_window=window, max_seq_len=max_seq,
                          dtype=jnp.float32)
        params = llama.init_params(jax.random.PRNGKey(31), cfg,
                                   dtype=jnp.float32)
        return cfg, params

    @pytest.mark.parametrize("quantized_kv", [False, True])
    def test_mesh_ring_matches_full_cache(self, rng, quantized_kv):
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg, params = self._cfg()
        prompt = list(rng.integers(0, cfg.vocab_size, 150))
        sp = SamplingParams(max_new_tokens=10)
        mesh = make_mesh(tp=2, dp=2)     # kv_heads=2 -> 1 head/device
        ref = DecodeEngine(params, cfg, max_batch=2, max_seq=512,
                           quantized_kv=quantized_kv,
                           mesh=mesh).generate([prompt], sp)
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=512,
                         quantized_kv=quantized_kv,
                         mesh=make_mesh(tp=2, dp=2), ring_kv=True)
        assert e.cache.ring and e.cache.max_seq < 512
        got = e.generate([prompt], sp)
        assert got == ref

    def test_mesh_ring_matches_single_device_ring(self, rng):
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg, params = self._cfg()
        prompt = list(rng.integers(0, cfg.vocab_size, 20))
        sp = SamplingParams(max_new_tokens=100)   # 120 >> ring (~64)
        ref = DecodeEngine(params, cfg, max_batch=2, max_seq=512,
                           quantized_kv=False, ring_kv=True
                           ).generate([prompt], sp)
        mesh = make_mesh(tp=2, dp=2)
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=512,
                         quantized_kv=False, ring_kv=True, mesh=mesh)
        got = e.generate([prompt], sp)
        assert got == ref

    def test_mesh_ring_chunked_prefill(self, rng):
        """All three at once: mesh + ring + chunked prefill."""
        from tpu_bitsandbytes.engine import DecodeEngine, SamplingParams
        cfg, params = self._cfg()
        prompt = list(rng.integers(0, cfg.vocab_size, 150))
        sp = SamplingParams(max_new_tokens=8)
        ref = DecodeEngine(params, cfg, max_batch=2, max_seq=512,
                           quantized_kv=False).generate([prompt], sp)
        mesh = make_mesh(tp=2, dp=2)
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=512,
                         quantized_kv=False, ring_kv=True, mesh=mesh,
                         prefill_chunk=32)
        got = e.generate([prompt], sp)
        assert got == ref
