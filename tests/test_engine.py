"""Decode-engine tests: KV cache correctness, cached-decode-vs-full-forward
equivalence, continuous batching semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_bitsandbytes.models import llama
from tpu_bitsandbytes.engine import (
    DecodeEngine, KVCache, SamplingParams, decode_step, prefill_step,
)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = llama.LlamaConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


class TestScaleFoldedAttention:
    def test_matches_dequant_attention(self, rng):
        """gqa_attention_kv_quant (no dequant materialization, bf16 MXU
        contractions) must match dequant-then-attend within bf16 rounding."""
        from tpu_bitsandbytes.models.layers import (
            gqa_attention, gqa_attention_kv_quant)
        b, s, t, h, h_kv, d = 2, 1, 24, 8, 4, 32
        q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
        k = rng.standard_normal((b, t, h_kv, d)).astype(np.float32)
        v = rng.standard_normal((b, t, h_kv, d)).astype(np.float32)
        cache = KVCache.create(1, b, t, h_kv, d, quantized=True,
                               dtype=jnp.bfloat16)
        for slot in range(b):
            cache = cache.write_prefill(0, jnp.int32(slot),
                                        jnp.asarray(k[slot]),
                                        jnp.asarray(v[slot]))
        offs = jnp.full((b, s), t - 1, jnp.int32)
        k_deq, v_deq = cache.read(0)
        ref = gqa_attention(q, k_deq, v_deq, causal_offset=offs)
        kq, ks, vq, vs = cache.read_raw(0)
        out = gqa_attention_kv_quant(q, kq, ks, vq, vs, causal_offset=offs)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=0.03, rtol=0.03)

    def test_decode_bf16_quantized_kv_close_to_fp(self, rng):
        """End-to-end: bf16 decode_step (which takes the scale-folded path)
        vs the same model with an unquantized cache."""
        cfg = llama.LlamaConfig.tiny()  # bf16 compute dtype
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        b = 2
        steps = rng.integers(0, cfg.vocab_size, (4, b))
        out = {}
        for quant in (False, True):
            cache = KVCache.create(cfg.num_layers, b, 32, cfg.num_kv_heads,
                                   cfg.hd, quantized=quant, dtype=cfg.dtype)
            active = jnp.ones((b,), bool)
            logits = None
            for i in range(4):   # teacher-forced: same tokens both runs
                toks = jnp.asarray(steps[i], jnp.int32)
                logits, cache = decode_step(params, cache, toks, active, cfg)
            out[quant] = np.asarray(logits, np.float32)
        # int8 KV + scale-folded attention stays close to the fp cache
        ref, got = out[False], out[True]
        cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
        assert cos > 0.99, cos


class TestSnapshotRestart:
    def test_restart_is_token_deterministic(self, tiny_model, rng, tmp_path):
        """save_state mid-run, keep decoding -> restore into a FRESH engine
        and decode again: both must emit identical tokens (stochastic
        sampling included — the RNG key is part of the snapshot)."""
        cfg, params = tiny_model
        prompts = [list(rng.integers(0, cfg.vocab_size, 5)) for _ in range(4)]
        sp = SamplingParams(max_new_tokens=12, temperature=0.8, top_k=20)

        eng = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                           quantized_kv=True, seed=7, steps_per_sync=2)
        for p in prompts:
            eng.add_request(p, sp)
        for _ in range(3):          # mid-flight: some active, some waiting
            eng.step()
        snap = str(tmp_path / "engine_state.npz")
        eng.save_state(snap)

        while eng.step():
            pass
        ref = {r.uid: list(r.generated) for r in eng.finished}

        eng2 = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                            quantized_kv=True, seed=999, steps_per_sync=2)
        eng2.load_state(snap)
        while eng2.step():
            pass
        got = {r.uid: list(r.generated) for r in eng2.finished}
        assert got == ref

    def test_save_restores_waiting_queue(self, tiny_model, tmp_path):
        cfg, params = tiny_model
        eng = DecodeEngine(params, cfg, max_batch=1, max_seq=64)
        eng.add_request([1, 2, 3], SamplingParams(max_new_tokens=2))
        eng.add_request([4, 5], SamplingParams(max_new_tokens=2))
        snap = str(tmp_path / "s.npz")
        eng.save_state(snap)
        eng2 = DecodeEngine(params, cfg, max_batch=1, max_seq=64)
        eng2.load_state(snap)
        assert [r.uid for r in eng2.waiting] == [r.uid for r in eng.waiting]
        while eng2.step():
            pass
        assert len(eng2.finished) == 2


class TestKVCache:
    def test_quantized_roundtrip(self, rng):
        cache = KVCache.create(2, 2, 16, 2, 32, quantized=True,
                               dtype=jnp.float32)
        k = jnp.asarray(rng.standard_normal((4, 2, 32)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((4, 2, 32)).astype(np.float32))
        cache = cache.write_prefill(0, jnp.int32(1), k, v)
        k_all, _ = cache.read(0)
        got = np.asarray(k_all[1, :4], np.float32)
        rel = np.abs(got - np.asarray(k)).mean() / np.abs(np.asarray(k)).mean()
        assert rel < 0.02  # int8 per-head quantization error

    def test_unquantized_exact(self, rng):
        cache = KVCache.create(1, 1, 8, 2, 16, quantized=False,
                               dtype=jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 2, 16)).astype(np.float32))
        cache = cache.write_prefill(0, jnp.int32(0), k, k)
        k_all, _ = cache.read(0)
        assert np.allclose(np.asarray(k_all[0, :3]), np.asarray(k))

    def test_write_decode_positions(self, rng):
        cache = KVCache.create(1, 3, 8, 1, 16, quantized=False,
                               dtype=jnp.float32)
        cache = KVCache(k=cache.k, v=cache.v, k_scale=None, v_scale=None,
                        lengths=jnp.asarray([2, 0, 5]), quantized=False,
                        dtype=jnp.float32)
        k_new = jnp.asarray(rng.standard_normal((3, 1, 1, 16)).astype(np.float32))
        cache2 = cache.write_decode(0, k_new, k_new, cache.lengths)
        k_all = np.asarray(cache2.k[0])     # head-major [B, H, S, D]
        assert np.allclose(k_all[0, 0, 2], np.asarray(k_new)[0, 0, 0])
        assert np.allclose(k_all[1, 0, 0], np.asarray(k_new)[1, 0, 0])
        assert np.allclose(k_all[2, 0, 5], np.asarray(k_new)[2, 0, 0])

    def test_bytes_per_token(self):
        cache = KVCache.create(4, 1, 8, 2, 64, quantized=True)
        assert cache.bytes_per_token() == 4 * (2 * 2 * 64 + 2 * 2 * 4)


class TestCachedDecodeEquivalence:
    def test_decode_matches_full_forward(self, tiny_model, rng):
        """Greedy decode through the cache must reproduce the tokens that
        repeated full forwards produce (the engine-correctness oracle)."""
        cfg, params = tiny_model
        prompt = list(rng.integers(0, cfg.vocab_size, 6))

        # oracle: repeated full forward, greedy
        ids = jnp.asarray([prompt])
        oracle = []
        for _ in range(5):
            logits = llama.forward(params, ids, cfg)
            nxt = int(jnp.argmax(logits[0, -1]))
            oracle.append(nxt)
            ids = jnp.concatenate([ids, jnp.asarray([[nxt]])], axis=1)

        engine = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                              quantized_kv=False)
        out = engine.generate([prompt],
                              SamplingParams(max_new_tokens=5))[0]
        assert out == oracle

    def test_quantized_kv_close(self, tiny_model, rng):
        cfg, params = tiny_model
        prompt = list(rng.integers(0, cfg.vocab_size, 6))
        e_fp = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                            quantized_kv=False)
        e_q = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                           quantized_kv=True)
        sp = SamplingParams(max_new_tokens=4)
        out_fp = e_fp.generate([prompt], sp)[0]
        out_q = e_q.generate([prompt], sp)[0]
        # int8 KV may flip late tokens; first tokens should agree
        assert out_fp[0] == out_q[0]


class TestContinuousBatching:
    def test_multiple_requests_batched(self, tiny_model, rng):
        cfg, params = tiny_model
        engine = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                              quantized_kv=False)
        prompts = [list(rng.integers(0, cfg.vocab_size, 4)) for _ in range(5)]
        outs = engine.generate(prompts, SamplingParams(max_new_tokens=3))
        assert len(outs) == 5
        assert all(len(o) == 3 for o in outs)

    def test_batched_equals_sequential(self, tiny_model, rng):
        cfg, params = tiny_model
        prompts = [list(rng.integers(0, cfg.vocab_size, 5)) for _ in range(3)]
        sp = SamplingParams(max_new_tokens=4)
        seq_outs = []
        for p in prompts:
            e = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                             quantized_kv=False)
            seq_outs.append(e.generate([p], sp)[0])
        e2 = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                          quantized_kv=False)
        bat_outs = e2.generate(prompts, sp)
        assert bat_outs == seq_outs

    def test_slot_reuse(self, tiny_model, rng):
        cfg, params = tiny_model
        engine = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                              quantized_kv=False)
        prompts = [list(rng.integers(0, cfg.vocab_size, 3)) for _ in range(3)]
        outs = engine.generate(prompts, SamplingParams(max_new_tokens=2))
        assert len(outs) == 3
        assert len(engine.active) == 0 and len(engine.waiting) == 0

    def test_eos_stops_early(self, tiny_model, rng):
        cfg, params = tiny_model
        engine = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                              quantized_kv=False)
        prompt = list(rng.integers(0, cfg.vocab_size, 4))
        # find what greedy emits first, then use it as "eos"
        probe = engine.generate([prompt], SamplingParams(max_new_tokens=1))[0]
        engine2 = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                               quantized_kv=False)
        out = engine2.generate(
            [prompt], SamplingParams(max_new_tokens=10,
                                     eos_token_id=probe[0]))[0]
        assert out == [probe[0]]

    def test_quantized_weights_engine(self, tiny_model, rng):
        cfg, params = tiny_model
        qparams = llama.quantize_params(params, dtype=jnp.float32)
        engine = DecodeEngine(qparams, cfg, max_batch=2, max_seq=64,
                              quantized_kv=True)
        prompts = [list(rng.integers(0, cfg.vocab_size, 4)) for _ in range(2)]
        outs = engine.generate(prompts, SamplingParams(max_new_tokens=3))
        assert all(len(o) == 3 for o in outs)


class TestSampler:
    def test_greedy(self):
        from tpu_bitsandbytes.engine import sample
        logits = jnp.asarray([[0.0, 5.0, 1.0]])
        t = sample(logits, jax.random.PRNGKey(0), SamplingParams())
        assert int(t[0]) == 1

    def test_topk_restricts(self):
        from tpu_bitsandbytes.engine import sample
        logits = jnp.asarray([[10.0, 9.0, -50.0, -50.0]])
        sp = SamplingParams(temperature=1.0, top_k=2)
        for i in range(10):
            t = sample(logits, jax.random.PRNGKey(i), sp)
            assert int(t[0]) in (0, 1)

    def test_topp_restricts(self):
        from tpu_bitsandbytes.engine import sample
        logits = jnp.asarray([[10.0, 1.0, 0.0, -1.0]])
        sp = SamplingParams(temperature=1.0, top_p=0.5)
        for i in range(10):
            t = sample(logits, jax.random.PRNGKey(i), sp)
            assert int(t[0]) == 0


class TestSamplerBatched:
    """Per-slot sampling arrays: one jitted op, mixed params per row."""

    def test_greedy_rows_match_argmax(self):
        from tpu_bitsandbytes.engine.sampler import (SamplingArrays,
                                                     sample_batched)
        logits = jnp.asarray([[0.0, 5.0, 1.0, 2.0],
                              [3.0, 0.0, 7.0, 1.0]])
        s = SamplingArrays.build({}, 2)   # default: all greedy
        t = sample_batched(logits, jax.random.PRNGKey(0), s)
        assert list(np.asarray(t)) == [1, 2]

    def test_per_row_topk(self):
        from tpu_bitsandbytes.engine.sampler import (SamplingArrays,
                                                     sample_batched)
        # row 0 greedy, row 1 temperature with top_k=2 over clear leaders
        logits = jnp.asarray([[0.0, 5.0, 1.0, 2.0],
                              [10.0, 9.0, -50.0, -50.0]])
        s = SamplingArrays.build(
            {1: SamplingParams(temperature=1.0, top_k=2)}, 2)
        for i in range(10):
            t = np.asarray(sample_batched(logits, jax.random.PRNGKey(i), s))
            assert t[0] == 1
            assert t[1] in (0, 1)

    def test_per_row_topp(self):
        from tpu_bitsandbytes.engine.sampler import (SamplingArrays,
                                                     sample_batched)
        logits = jnp.asarray([[10.0, 1.0, 0.0, -1.0]])
        s = SamplingArrays.build(
            {0: SamplingParams(temperature=1.0, top_p=0.5)}, 1)
        for i in range(10):
            t = np.asarray(sample_batched(logits, jax.random.PRNGKey(i), s))
            assert t[0] == 0

    def test_matches_single_row_sampler(self):
        """Batched greedy/top-k agree with the per-request `sample`."""
        from tpu_bitsandbytes.engine.sampler import (SamplingArrays,
                                                     sample, sample_batched)
        rng = np.random.default_rng(7)
        logits = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
        sp = SamplingParams(temperature=0.0)
        s = SamplingArrays.build({i: sp for i in range(3)}, 3)
        key = jax.random.PRNGKey(0)
        assert list(np.asarray(sample_batched(logits, key, s))) == \
            list(np.asarray(sample(logits, key, sp)))


class TestDecodeChunk:
    def test_chunk_equals_stepwise_greedy(self, tiny_model, rng):
        """n_steps greedy chunk == n sequential decode_step+argmax."""
        from tpu_bitsandbytes.engine.engine import decode_chunk
        from tpu_bitsandbytes.engine.sampler import SamplingArrays
        cfg, params = tiny_model
        B, n = 2, 4
        prompt_len = 5

        prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)),
                             jnp.int32)

        def fresh_cache():
            c = KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
            for slot in range(B):
                _, c = prefill_step(params, c, prompt, jnp.int32(slot),
                                    jnp.int32(prompt_len), cfg)
            return c

        rng = np.random.default_rng(3)
        tokens0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (B,)),
                              jnp.int32)
        active0 = jnp.ones((B,), bool)

        # oracle: stepwise
        cache = fresh_cache()
        tokens, seq = tokens0, []
        for _ in range(n):
            logits, cache = decode_step(params, cache, tokens, active0, cfg)
            tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            seq.append(np.asarray(tokens))

        samp = SamplingArrays.build({}, B)
        toks_seq, act_seq, *_ = decode_chunk(
            params, fresh_cache(), tokens0, active0, jax.random.PRNGKey(0),
            samp, cfg, n_steps=n, all_greedy=True)
        assert np.array_equal(np.asarray(toks_seq), np.stack(seq))
        assert np.asarray(act_seq).all()

    def test_eos_deactivates_mid_chunk(self, tiny_model, rng):
        """A slot hitting EOS stops emitting and stops advancing lengths."""
        from tpu_bitsandbytes.engine.engine import decode_chunk
        from tpu_bitsandbytes.engine.sampler import SamplingArrays
        cfg, params = tiny_model
        cache = KVCache.create(cfg.num_layers, 1, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)), jnp.int32)
        _, cache = prefill_step(params, cache, toks, jnp.int32(0),
                                jnp.int32(5), cfg)
        t0 = jnp.asarray([3], jnp.int32)
        # probe first greedy token, then declare it the EOS
        probe_seq, _, *_ = decode_chunk(
            params, cache, t0, jnp.ones((1,), bool), jax.random.PRNGKey(0),
            SamplingArrays.build({}, 1), cfg, n_steps=4, all_greedy=True)
        eos = int(np.asarray(probe_seq)[0, 0])

        cache2 = KVCache.create(cfg.num_layers, 1, 32, cfg.num_kv_heads,
                                cfg.hd, quantized=False, dtype=jnp.float32)
        _, cache2 = prefill_step(params, cache2, toks, jnp.int32(0),
                                 jnp.int32(5), cfg)
        samp = SamplingArrays.build(
            {0: SamplingParams(eos_token_id=eos)}, 1)
        toks_seq, act_seq, cache2, _, active, *_ = decode_chunk(
            params, cache2, t0, jnp.ones((1,), bool), jax.random.PRNGKey(0),
            samp, cfg, n_steps=4, all_greedy=True)
        act = np.asarray(act_seq)[:, 0]
        assert act[0] and not act[1:].any()       # emitted EOS, then silent
        assert not bool(np.asarray(active)[0])
        # lengths advanced once (the EOS step) and then froze
        assert int(np.asarray(cache2.lengths)[0]) == 6

    def test_attn_span_matches_full(self, tiny_model, rng):
        """Bounded-span attention == full-cache attention when the span
        covers every active length (the engine's invariant)."""
        from tpu_bitsandbytes.engine.engine import decode_chunk
        from tpu_bitsandbytes.engine.sampler import SamplingArrays
        cfg, params = tiny_model
        prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)),
                             jnp.int32)

        def run(span):
            c = KVCache.create(cfg.num_layers, 2, 64, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
            for slot in range(2):
                _, c = prefill_step(params, c, prompt, jnp.int32(slot),
                                    jnp.int32(6), cfg)
            toks_seq, *_ = decode_chunk(
                params, c, jnp.asarray([1, 2], jnp.int32),
                jnp.ones((2,), bool), jax.random.PRNGKey(0),
                SamplingArrays.build({}, 2), cfg, n_steps=5,
                all_greedy=True, attn_span=span)
            return np.asarray(toks_seq)

        assert np.array_equal(run(None), run(16))

    def test_short_prefill_into_reused_long_slot(self, tiny_model, rng):
        """Garbage-KV contract (engine/engine.py prefill docstring): a short
        prefill into a slot previously holding a LONG sequence must never
        attend the stale tail — tokens must match a fresh engine."""
        cfg, params = tiny_model
        long_p = list(rng.integers(0, cfg.vocab_size, 40))
        short_p = list(rng.integers(0, cfg.vocab_size, 4))
        sp = SamplingParams(max_new_tokens=5)

        fresh = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                             quantized_kv=False)
        want = fresh.generate([short_p], sp)[0]

        reused = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                              quantized_kv=False)
        outs = reused.generate([long_p, short_p], sp)
        assert outs[1] == want

    def test_engine_mixed_sampling_single_dispatch(self, tiny_model, rng):
        """Mixed greedy/temperature requests run through the batched
        on-device sampler (no per-slot host loop) and still finish."""
        cfg, params = tiny_model
        engine = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                              quantized_kv=False, steps_per_sync=4)
        p1 = list(rng.integers(0, cfg.vocab_size, 4))
        p2 = list(rng.integers(0, cfg.vocab_size, 4))
        engine.add_request(p1, SamplingParams(max_new_tokens=6))
        engine.add_request(p2, SamplingParams(temperature=0.8, top_k=4,
                                              max_new_tokens=6))
        while engine.step():
            pass
        outs = {r.uid: r.generated for r in engine.finished}
        assert sorted(len(v) for v in outs.values()) == [6, 6]

    def test_steps_per_sync_invariance(self, tiny_model, rng):
        """Generated tokens don't depend on the chunk size (greedy)."""
        cfg, params = tiny_model
        prompts = [list(rng.integers(0, cfg.vocab_size, 5)) for _ in range(3)]
        sp = SamplingParams(max_new_tokens=7)
        outs = []
        for n in (1, 4):
            e = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                             quantized_kv=False, steps_per_sync=n)
            outs.append(e.generate(prompts, sp))
        assert outs[0] == outs[1]


class TestPipelinedDispatch:
    """generate()'s depth-2 pipelined chunk dispatch (run_pipelined) must be
    token-identical to the blocking step() loop for greedy decoding —
    including mid-run slot turnover (more prompts than slots, uneven
    lengths) where the pipeline drains for admission."""

    def test_pipelined_matches_step_loop(self, tiny_model, rng):
        cfg, params = tiny_model
        prompts = [list(rng.integers(0, cfg.vocab_size, 3 + i))
                   for i in range(5)]     # 5 prompts, 2 slots -> turnover
        sp = SamplingParams(max_new_tokens=6)

        ref_e = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                             quantized_kv=False, steps_per_sync=2)
        ref = ref_e.generate(prompts, sp, pipeline_depth=1)

        pipe_e = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                              quantized_kv=False, steps_per_sync=2)
        got = pipe_e.generate(prompts, sp, pipeline_depth=2)
        assert got == ref
        assert not pipe_e.active and not pipe_e.waiting

    def test_pipelined_uneven_finish_and_eos(self, tiny_model, rng):
        """Requests retiring mid-pipeline (max_new_tokens) leave garbage
        device emissions that must be discarded, and eos stops a slot on
        device mid-chunk."""
        cfg, params = tiny_model
        prompts = [list(rng.integers(0, cfg.vocab_size, 4))
                   for _ in range(3)]
        probe_e = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                               quantized_kv=False)
        first = probe_e.generate([prompts[0]],
                                 SamplingParams(max_new_tokens=1))[0][0]

        e = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                         quantized_kv=False, steps_per_sync=3)
        e.add_request(prompts[0], SamplingParams(max_new_tokens=9,
                                                 eos_token_id=first))
        e.add_request(prompts[1], SamplingParams(max_new_tokens=2))
        e.add_request(prompts[2], SamplingParams(max_new_tokens=5))
        e.run_pipelined(depth=2)
        outs = {r.uid: r.generated for r in e.finished}
        assert outs[1] == [first]               # eos after the first token
        assert len(outs[2]) == 2
        assert len(outs[3]) == 5


    def test_pipelined_admits_after_first_token_retirement(self, tiny_model,
                                                           rng):
        """A request that retires at _host_inputs time (max_new_tokens=1:
        its prefill token is its whole output) frees a slot before any chunk
        reports a finish — the pipeline must still break to admit the
        waiting request instead of idling until the long request ends."""
        cfg, params = tiny_model
        prompts = [list(rng.integers(0, cfg.vocab_size, 4))
                   for _ in range(3)]
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                         quantized_kv=False, steps_per_sync=2)
        e.add_request(prompts[0], SamplingParams(max_new_tokens=1))
        e.add_request(prompts[1], SamplingParams(max_new_tokens=40))
        e.add_request(prompts[2], SamplingParams(max_new_tokens=2))
        e.run_pipelined(depth=2)
        outs = {r.uid: r.generated for r in e.finished}
        assert len(outs) == 3 and len(outs[3]) == 2 and len(outs[2]) == 40
        # finish ORDER proves admission wasn't starved: the waiting 2-token
        # request must finish before the 40-token one (starved, it would be
        # admitted only after the long request finished)
        assert [r.uid for r in e.finished] == [1, 3, 2]


class TestBatchedAdmission:
    """_admit groups same-bucket requests into ONE prefill_batch forward;
    groups are padded to power-of-two R with copies of row 0 (duplicate
    slots scatter value-identical rows). Must be token-identical to
    per-request admission."""

    def test_group_matches_sequential_admission(self, tiny_model, rng):
        cfg, params = tiny_model
        # 3 same-bucket prompts -> one R=3 group padded to r_pad=4 (row-0
        # duplicate writes collide on slot 0) + 1 different-bucket prompt
        prompts = [list(rng.integers(0, cfg.vocab_size, n))
                   for n in (5, 6, 7, 20)]
        sp = SamplingParams(max_new_tokens=5)

        batched = DecodeEngine(params, cfg, max_batch=4, max_seq=64,
                               quantized_kv=False)
        got = batched.generate(prompts, sp, pipeline_depth=1)

        # sequential oracle: one slot at a time (admission never groups)
        seq = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                           quantized_kv=False)
        for pr, out in zip(prompts, got):
            ref = seq.generate([pr], sp, pipeline_depth=1)[0]
            assert out == ref

    def test_group_admission_single_dispatch(self, tiny_model, rng,
                                             monkeypatch):
        """All 4 same-bucket admissions go through one prefill_batch call."""
        import tpu_bitsandbytes.engine.engine as eng_mod
        cfg, params = tiny_model
        calls = {"batch": 0, "single": 0}
        orig_batch = eng_mod.prefill_batch
        orig_single = eng_mod.prefill_step

        def spy_batch(*a, **k):
            calls["batch"] += 1
            return orig_batch(*a, **k)

        def spy_single(*a, **k):
            calls["single"] += 1
            return orig_single(*a, **k)

        monkeypatch.setattr(eng_mod, "prefill_batch", spy_batch)
        monkeypatch.setattr(eng_mod, "prefill_step", spy_single)
        e = DecodeEngine(params, cfg, max_batch=4, max_seq=64,
                         quantized_kv=False)
        prompts = [list(rng.integers(0, cfg.vocab_size, 5))
                   for _ in range(4)]
        e.generate(prompts, SamplingParams(max_new_tokens=2))
        assert calls["batch"] == 1 and calls["single"] == 0


class TestEngineLimits:
    def test_long_prompt_truncated(self, tiny_model, rng):
        cfg, params = tiny_model
        engine = DecodeEngine(params, cfg, max_batch=1, max_seq=32,
                              quantized_kv=False)
        prompt = list(rng.integers(0, cfg.vocab_size, 100))  # > max_seq
        outs = engine.generate([prompt], SamplingParams(max_new_tokens=4))
        assert 1 <= len(outs[0]) <= 4

    def test_generation_stops_at_max_seq(self, tiny_model, rng):
        cfg, params = tiny_model
        engine = DecodeEngine(params, cfg, max_batch=1, max_seq=24,
                              quantized_kv=False)
        prompt = list(rng.integers(0, cfg.vocab_size, 16))
        outs = engine.generate([prompt],
                               SamplingParams(max_new_tokens=1000))
        # 16 prompt + generated must stay under max_seq
        assert len(prompt) + len(outs[0]) <= 24

    def test_stats_include_metrics(self, tiny_model, rng):
        cfg, params = tiny_model
        engine = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                              quantized_kv=False)
        engine.generate([list(rng.integers(0, cfg.vocab_size, 4))],
                        SamplingParams(max_new_tokens=3))
        s = engine.stats
        assert s["finished"] == 1
        assert s.get("tokens", 0) >= 2

    def test_warmup_compiles(self, tiny_model):
        cfg, params = tiny_model
        engine = DecodeEngine(params, cfg, max_batch=2, max_seq=32,
                              quantized_kv=False)
        engine.warmup([5, 20])  # must not raise; precompiles buckets + decode


class TestStreamingAndCancel:
    def test_stream_matches_generate(self, tiny_model, rng):
        cfg, params = tiny_model
        prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (5, 9)]
        sp = SamplingParams(max_new_tokens=6)
        ref = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                           quantized_kv=False).generate(prompts, sp)
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                         quantized_kv=False)
        streamed = {}
        dones = {}
        for uid, tok, done in e.generate_stream(prompts, sp):
            streamed.setdefault(uid, []).append(tok)
            dones[uid] = done
        assert sorted(streamed.keys()) == [1, 2]
        assert streamed[1] == ref[0] and streamed[2] == ref[1]
        assert all(dones.values())           # last event per uid marks done

    def test_on_token_fires_for_first_prefill_token(self, tiny_model, rng):
        cfg, params = tiny_model
        e = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                         quantized_kv=False)
        seen = []
        e.add_request(list(rng.integers(0, cfg.vocab_size, 4)),
                      SamplingParams(max_new_tokens=3),
                      on_token=lambda u, t, d: seen.append(t))
        while e.step():
            pass
        assert seen == e.finished[0].generated
        assert len(seen) == 3

    def test_cancel_waiting_request_never_runs(self, tiny_model, rng):
        cfg, params = tiny_model
        e = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                         quantized_kv=False)
        u1 = e.add_request(list(rng.integers(0, cfg.vocab_size, 4)),
                           SamplingParams(max_new_tokens=3))
        u2 = e.add_request(list(rng.integers(0, cfg.vocab_size, 4)),
                           SamplingParams(max_new_tokens=3))
        assert e.cancel(u2)
        while e.step():
            pass
        by_uid = {r.uid: r for r in e.finished}
        assert by_uid[u2].cancelled and by_uid[u2].generated == []
        assert len(by_uid[u1].generated) == 3
        assert not e.cancel(u2)              # already finished

    def test_cancel_active_frees_slot_for_waiting(self, tiny_model, rng):
        cfg, params = tiny_model
        e = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                         quantized_kv=False)
        u1 = e.add_request(list(rng.integers(0, cfg.vocab_size, 4)),
                           SamplingParams(max_new_tokens=50))
        u2 = e.add_request(list(rng.integers(0, cfg.vocab_size, 4)),
                           SamplingParams(max_new_tokens=3))
        e.step()                             # u1 admitted + first chunk
        assert any(r.uid == u1 for r in e.active.values())
        n_before = len({r.uid: r for r in e.finished})
        assert e.cancel(u1)
        while e.step():
            pass
        by_uid = {r.uid: r for r in e.finished}
        assert by_uid[u1].cancelled
        # u1 stopped early; u2 got the slot and finished normally
        assert len(by_uid[u1].generated) < 50
        assert len(by_uid[u2].generated) == 3

    def test_cancelled_slot_reuse_is_clean(self, tiny_model, rng):
        """KV garbage left by a cancelled request must not leak into the
        next request admitted into that slot (prefill overwrite contract)."""
        cfg, params = tiny_model
        prompt2 = list(rng.integers(0, cfg.vocab_size, 6))
        sp = SamplingParams(max_new_tokens=5)
        ref = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                           quantized_kv=False).generate([prompt2], sp)[0]
        e = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                         quantized_kv=False)
        u1 = e.add_request(list(rng.integers(0, cfg.vocab_size, 30)),
                           SamplingParams(max_new_tokens=50))
        e.step()
        e.cancel(u1)
        u2 = e.add_request(prompt2, sp)
        while e.step():
            pass
        got = {r.uid: r.generated for r in e.finished}[u2]
        assert got == ref


class TestChunkedPrefill:
    """vLLM-style chunked prefill: long prompts stream into the KV cache one
    chunk per engine step, interleaved with decode."""

    def test_chunked_matches_unchunked(self, tiny_model, rng):
        cfg, params = tiny_model
        prompts = [list(rng.integers(0, cfg.vocab_size, n))
                   for n in (50, 7, 33)]
        sp = SamplingParams(max_new_tokens=6)
        ref = DecodeEngine(params, cfg, max_batch=2, max_seq=128,
                           quantized_kv=False).generate(prompts, sp)
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=128,
                         quantized_kv=False, prefill_chunk=16)
        got = e.generate(prompts, sp)
        assert got == ref

    def test_chunked_step_path(self, tiny_model, rng):
        cfg, params = tiny_model
        prompts = [list(rng.integers(0, cfg.vocab_size, n)) for n in (40, 9)]
        sp = SamplingParams(max_new_tokens=5)
        ref = DecodeEngine(params, cfg, max_batch=2, max_seq=128,
                           quantized_kv=False).generate(prompts, sp,
                                                        pipeline_depth=1)
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=128,
                         quantized_kv=False, prefill_chunk=16)
        got = e.generate(prompts, sp, pipeline_depth=1)
        assert got == ref

    def test_prefill_interleaves_with_decode(self, tiny_model, rng,
                                             monkeypatch):
        """While a long prompt prefills chunk-by-chunk, the already-running
        request keeps decoding: decode chunks are dispatched between prefill
        chunks."""
        import tpu_bitsandbytes.engine.engine as eng_mod
        cfg, params = tiny_model
        calls = []
        orig_chunk = eng_mod.prefill_chunk_step
        orig_decode = eng_mod.decode_chunk

        def spy_prefill(*a, **k):
            calls.append("p")
            return orig_chunk(*a, **k)

        def spy_decode(*a, **k):
            calls.append("d")
            return orig_decode(*a, **k)

        monkeypatch.setattr(eng_mod, "prefill_chunk_step", spy_prefill)
        monkeypatch.setattr(eng_mod, "decode_chunk", spy_decode)
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=128,
                         quantized_kv=False, prefill_chunk=16,
                         steps_per_sync=2)
        e.add_request(list(rng.integers(0, cfg.vocab_size, 5)),
                      SamplingParams(max_new_tokens=30))
        e.step()                      # short prompt admitted, decoding
        e.add_request(list(rng.integers(0, cfg.vocab_size, 60)),
                      SamplingParams(max_new_tokens=3))
        while e.step():
            pass
        joined = "".join(calls)
        # the 60-token prompt needs 4 chunks of 16; decode chunks must run
        # between them (interleaving), not only after the last
        assert joined.count("p") == 4
        assert "pd" in joined and "dp" in joined

    def test_chunked_quantized_kv_close(self, tiny_model, rng):
        """With int8 KV the chunked path attends to requantized history —
        outputs track the unchunked engine closely (same quant noise class)
        but need not be identical; require the first tokens to agree."""
        cfg, params = tiny_model
        prompt = list(rng.integers(0, cfg.vocab_size, 45))
        sp = SamplingParams(max_new_tokens=4)
        ref = DecodeEngine(params, cfg, max_batch=1, max_seq=128,
                           quantized_kv=True).generate([prompt], sp)[0]
        got = DecodeEngine(params, cfg, max_batch=1, max_seq=128,
                           quantized_kv=True,
                           prefill_chunk=16).generate([prompt], sp)[0]
        assert got[0] == ref[0]

    def test_chunked_snapshot_restart(self, tiny_model, rng, tmp_path):
        """Snapshot taken mid-chunked-prefill resumes token-identically."""
        cfg, params = tiny_model
        prompt = list(rng.integers(0, cfg.vocab_size, 50))
        sp = SamplingParams(max_new_tokens=5)
        ref = DecodeEngine(params, cfg, max_batch=1, max_seq=128,
                           quantized_kv=False,
                           prefill_chunk=16).generate([prompt], sp)[0]
        e = DecodeEngine(params, cfg, max_batch=1, max_seq=128,
                         quantized_kv=False, prefill_chunk=16)
        e.add_request(prompt, sp)
        e.step()                                  # partial prefill
        assert any(r.prefilling for r in e.active.values())
        path = str(tmp_path / "snap.npz")
        e.save_state(path)
        e2 = DecodeEngine(params, cfg, max_batch=1, max_seq=128,
                          quantized_kv=False, prefill_chunk=16)
        e2.load_state(path)
        while e2.step():
            pass
        assert e2.finished[0].generated == ref


class TestServingSamplerFeatures:
    def test_repetition_penalty_breaks_greedy_loops(self, tiny_model, rng):
        """A strong penalty must forbid immediate re-emission of seen
        tokens (greedy path: the argmax is reshaped)."""
        cfg, params = tiny_model
        prompt = list(rng.integers(0, cfg.vocab_size, 6))
        base = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                            quantized_kv=False).generate(
            [prompt], SamplingParams(max_new_tokens=12))[0]
        e = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                         quantized_kv=False)
        pen = e.generate([prompt], SamplingParams(
            max_new_tokens=12, repetition_penalty=1e6))[0]
        # with an effectively-infinite penalty every positive-logit seen
        # token is suppressed: no token may repeat (vocab 512 >> 12+6)
        assert len(set(pen)) == len(pen)
        assert not set(pen) & set(prompt)
        # and the unpenalized engine is unchanged by the feature existing
        base2 = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                             quantized_kv=False).generate(
            [prompt], SamplingParams(max_new_tokens=12))[0]
        assert base == base2

    def test_repetition_penalty_matches_hf_semantics(self, rng):
        """apply_repetition_penalty == torch HF RepetitionPenaltyLogitsProcessor."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")
        from tpu_bitsandbytes.engine.sampler import apply_repetition_penalty
        logits = rng.standard_normal((2, 50)).astype(np.float32)
        hist = [list(rng.integers(0, 50, 8)), list(rng.integers(0, 50, 5))]
        proc = transformers.RepetitionPenaltyLogitsProcessor(penalty=1.7)
        ref = np.stack([
            proc(torch.tensor([hist[b]]),
                 torch.tensor(logits[b:b+1])).numpy()[0]
            for b in range(2)])
        mask = np.zeros((2, 50), bool)
        for b in range(2):
            mask[b, hist[b]] = True
        pen = np.full((2,), 1.7, np.float32)
        got = np.asarray(apply_repetition_penalty(
            jnp.asarray(logits), jnp.asarray(mask), jnp.asarray(pen)))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_penalty_steady_across_chunk_boundaries(self, tiny_model, rng):
        """The seen mask chains on device within a pipelined run and is
        rebuilt across dispatches; steps_per_sync must not change output."""
        cfg, params = tiny_model
        prompt = list(rng.integers(0, cfg.vocab_size, 6))
        sp = SamplingParams(max_new_tokens=10, repetition_penalty=1.5)
        outs = []
        for n_sync in (1, 4):
            e = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                             quantized_kv=False, steps_per_sync=n_sync)
            outs.append(e.generate([prompt], sp)[0])
        assert outs[0] == outs[1]

    def test_logprobs_returned_and_consistent(self, tiny_model, rng):
        """Per-token logprobs match a teacher-forced forward re-scoring."""
        from tpu_bitsandbytes.models import llama as L
        cfg, params = tiny_model
        prompt = list(rng.integers(0, cfg.vocab_size, 5))
        sp = SamplingParams(max_new_tokens=6, logprobs=True)
        e = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                         quantized_kv=False)
        e.add_request(prompt, sp)
        while e.step():
            pass
        req = e.finished[0]
        # every generated token carries a logprob, incl. the first (prefill)
        assert len(req.logprobs) == len(req.generated)
        # teacher-forced re-score: logits at position t predict token t+1
        toks = jnp.asarray([prompt + req.generated])
        logits = L.forward(params, toks, cfg)
        lp = np.asarray(jax.nn.log_softmax(
            np.asarray(logits, np.float32), axis=-1))
        # decode-step logprobs cover generated[1:] (the first token comes
        # from prefill, which doesn't emit a logprob)
        offset = len(req.generated) - len(req.logprobs)
        for j, got in enumerate(req.logprobs):
            pos = len(prompt) - 1 + offset + j      # predicts generated[j+offset]
            want = lp[0, pos, req.generated[j + offset]]
            # decode-path vs teacher-forced forward numerics differ at the
            # 1e-3 level (attention span slicing, einsum order); an indexing
            # bug would be off by whole logits
            assert abs(got - want) < 2e-2

    def test_stop_sequences(self, tiny_model, rng):
        """Generation stops once the output ends with a stop sequence."""
        cfg, params = tiny_model
        prompt = list(rng.integers(0, cfg.vocab_size, 6))
        base = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                            quantized_kv=False).generate(
            [prompt], SamplingParams(max_new_tokens=12))[0]
        assert len(base) == 12
        stop = (tuple(base[3:5]),)
        e = DecodeEngine(params, cfg, max_batch=1, max_seq=64,
                         quantized_kv=False)
        got = e.generate([prompt], SamplingParams(max_new_tokens=12,
                                                  stop=stop))[0]
        assert got == base[:5]              # stopped right after the match


class TestWarmupFidelity:
    def test_warmup_covers_new_paths(self, tiny_model):
        """warmup with group_sizes/features + chunked prefill compiles and
        runs the batched-admission, chunk-prefill, and feature variants."""
        cfg, params = tiny_model
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                         quantized_kv=False, prefill_chunk=16)
        e.warmup([5, 40], group_sizes=(2,),
                 features=("penalty", "sampled", "logprobs"))
        # engine still serves correctly afterwards
        out = e.generate([[1, 2, 3]], SamplingParams(max_new_tokens=3))
        assert len(out[0]) == 3


class TestWindowedKVRead:
    """Fully-windowed models (Mistral-class) bound the decode KV read from
    below: [start, span) with start tracking (shortest position - window).
    Must be token-identical to the full [0, span) read — the mask discards
    the same prefix either way."""

    def test_windowed_start_matches_full_read(self, rng, monkeypatch):
        from tpu_bitsandbytes.models import llama as L
        import dataclasses
        cfg = dataclasses.replace(L.LlamaConfig.tiny_mistral(),
                                  sliding_window=16, max_seq_len=2048,
                                  dtype=jnp.float32)
        params = L.init_params(jax.random.PRNGKey(21), cfg,
                               dtype=jnp.float32)
        # prompt long enough that start = floor1024(len - 16) >= 1024
        prompt = list(rng.integers(0, cfg.vocab_size, 1100))
        sp = SamplingParams(max_new_tokens=8)

        eng = DecodeEngine(params, cfg, max_batch=1, max_seq=2048,
                           quantized_kv=False)
        starts = []
        orig = DecodeEngine._attn_window

        def spy(self, extra_steps=0):
            st, spn = orig(self, extra_steps)
            starts.append(st)
            return st, spn

        monkeypatch.setattr(DecodeEngine, "_attn_window", spy)
        got = eng.generate([prompt], sp)[0]
        assert max(starts) >= 1024         # the bound actually engaged

        ref_eng = DecodeEngine(params, cfg, max_batch=1, max_seq=2048,
                               quantized_kv=False)
        monkeypatch.setattr(DecodeEngine, "_attn_window",
                            lambda self, extra_steps=0:
                            (0, self._attn_span(extra_steps)))
        ref = ref_eng.generate([prompt], sp)[0]
        assert got == ref

    def test_mixed_window_models_keep_full_read(self, rng):
        from tpu_bitsandbytes.models import llama as L
        import dataclasses
        cfg = L.LlamaConfig.tiny_gemma2()       # alternating windows
        params = L.init_params(jax.random.PRNGKey(22), cfg,
                               dtype=jnp.float32)
        qp = L.quantize_params(params, dtype=jnp.float32)
        e = DecodeEngine(qp, cfg, max_batch=1, max_seq=64,
                         quantized_kv=False)
        e.add_request(list(rng.integers(0, cfg.vocab_size, 40)),
                      SamplingParams(max_new_tokens=2))
        e._admit()
        assert e._attn_window() == (0, e._attn_span())


class TestRingKV:
    """Rolling KV buffer for fully-windowed models: O(window) cache memory
    and attention, token-identical to the full-size cache."""

    def _cfg(self, rng, max_seq=512, window=32):
        from tpu_bitsandbytes.models import llama as L
        import dataclasses
        cfg = dataclasses.replace(L.LlamaConfig.tiny_mistral(),
                                  sliding_window=window, max_seq_len=max_seq,
                                  dtype=jnp.float32)
        params = L.init_params(jax.random.PRNGKey(31), cfg,
                               dtype=jnp.float32)
        return cfg, params

    @pytest.mark.parametrize("quantized_kv", [False, True])
    def test_ring_matches_full_cache(self, rng, quantized_kv):
        cfg, params = self._cfg(rng)
        prompt = list(rng.integers(0, cfg.vocab_size, 150))
        sp = SamplingParams(max_new_tokens=12)
        ref = DecodeEngine(params, cfg, max_batch=2, max_seq=512,
                           quantized_kv=quantized_kv).generate([prompt], sp)
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=512,
                         quantized_kv=quantized_kv, ring_kv=True)
        assert e.cache.ring and e.cache.max_seq < 512
        got = e.generate([prompt], sp)
        assert got == ref

    def test_ring_memory_is_window_sized(self, rng):
        cfg, params = self._cfg(rng, max_seq=512, window=32)
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=512,
                         quantized_kv=True, ring_kv=True)
        full = DecodeEngine(params, cfg, max_batch=2, max_seq=512,
                            quantized_kv=True)
        # ring = ceil128(window + slack) = 128 vs max_seq 512
        assert e.cache.k.size * 4 <= full.cache.k.size

    def test_ring_generation_past_ring_size(self, rng):
        """Decode far beyond the ring size: oldest entries recycle and the
        outputs still match the full cache."""
        cfg, params = self._cfg(rng, max_seq=512, window=32)
        prompt = list(rng.integers(0, cfg.vocab_size, 20))
        sp = SamplingParams(max_new_tokens=120)   # 140 >> ring (~64)
        ref = DecodeEngine(params, cfg, max_batch=1, max_seq=512,
                           quantized_kv=False).generate([prompt], sp)
        e = DecodeEngine(params, cfg, max_batch=1, max_seq=512,
                         quantized_kv=False, ring_kv=True)
        got = e.generate([prompt], sp)
        assert got == ref

    def test_ring_speculative_and_snapshot(self, rng, tmp_path):
        cfg, params = self._cfg(rng)
        rep = (list(map(int, rng.integers(0, cfg.vocab_size, 7))) * 6)[:40]
        sp = SamplingParams(max_new_tokens=10)
        ref = DecodeEngine(params, cfg, max_batch=1, max_seq=512,
                           quantized_kv=False).generate([rep], sp)
        spec = DecodeEngine(params, cfg, max_batch=1, max_seq=512,
                            quantized_kv=False, ring_kv=True,
                            speculative="ngram")
        assert spec.generate([rep], sp) == ref
        # snapshot round-trips the ring flags
        e = DecodeEngine(params, cfg, max_batch=1, max_seq=512,
                         quantized_kv=False, ring_kv=True)
        e.add_request(rep, sp)
        e.step()
        path = str(tmp_path / "ring.npz")
        e.save_state(path)
        e2 = DecodeEngine(params, cfg, max_batch=1, max_seq=512,
                          quantized_kv=False, ring_kv=True)
        e2.load_state(path)
        assert e2.cache.ring
        while e2.step():
            pass
        assert e2.finished[0].generated == ref[0]

    def test_ring_rejects_unsuitable_configs(self, tiny_model):
        cfg, params = tiny_model
        with pytest.raises(ValueError):
            DecodeEngine(params, cfg, max_batch=1, max_seq=64, ring_kv=True)


class TestPerRequestSampling:
    def test_generate_with_sampling_list(self, tiny_model, rng):
        cfg, params = tiny_model
        prompts = [list(rng.integers(0, cfg.vocab_size, 5))
                   for _ in range(2)]
        sps = [SamplingParams(max_new_tokens=3),
               SamplingParams(max_new_tokens=7)]
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                         quantized_kv=False)
        outs = e.generate(prompts, sps)
        assert len(outs[0]) == 3 and len(outs[1]) == 7
        with pytest.raises(ValueError):
            DecodeEngine(params, cfg, max_batch=2, max_seq=64,
                         quantized_kv=False).generate(prompts, sps[:1])


class TestHBMFootprint:
    """VERDICT r2 #7: serving-mode HBM budget accounting — the engine
    reports a per-chip footprint table and drop_packed="auto" frees the
    packed NF4 codes when retaining them would blow the budget."""

    def test_footprint_reports_categories(self, tiny_model):
        cfg, params = tiny_model
        qp = llama.quantize_params(params, blocksize=32, dtype=jnp.float32)
        e = DecodeEngine(qp, cfg, max_batch=2, max_seq=64,
                         runtime_cache="int8")
        fp = e.footprint()
        assert fp["packed"] > 0          # tiny model fits: codes retained
        assert fp["exec_cache"] > 0
        assert fp["kv"] > 0 and fp["fp"] > 0
        assert fp["total"] == (fp["packed"] + fp["exec_cache"] + fp["fp"]
                               + fp["kv"] + fp["activations_est"])
        assert fp["fits"]
        from tpu_bitsandbytes.utils.metrics import format_footprint
        txt = format_footprint(fp)
        assert "exec_cache" in txt and "fits" in txt

    def test_auto_drop_over_budget(self, tiny_model, monkeypatch):
        """Force a microscopic HBM budget: auto must drop the packed codes
        (with a warning) and the footprint must reflect it."""
        from tpu_bitsandbytes.utils import metrics
        cfg, params = tiny_model
        qp = llama.quantize_params(params, blocksize=32, dtype=jnp.float32)
        monkeypatch.setitem(metrics.CHIP_SPECS, "fake",
                            {"hbm_gbps": 819, "bf16_tflops": 197,
                             "int8_tops": 394, "hbm_gib": 1e-6})
        monkeypatch.setattr(metrics, "detect_chip", lambda: "fake")
        with pytest.warns(UserWarning, match="dropping packed"):
            e = DecodeEngine(qp, cfg, max_batch=2, max_seq=64,
                             runtime_cache="int8")
        assert e.params["layers"][0]["q_proj"].packed is None
        fp = e.footprint()
        assert fp["packed"] == 0 and fp["exec_cache"] > 0
        assert not fp["fits"]

    def test_forced_retain_overrides_auto(self, tiny_model, monkeypatch):
        from tpu_bitsandbytes.utils import metrics
        cfg, params = tiny_model
        qp = llama.quantize_params(params, blocksize=32, dtype=jnp.float32)
        monkeypatch.setitem(metrics.CHIP_SPECS, "fake",
                            {"hbm_gbps": 819, "bf16_tflops": 197,
                             "int8_tops": 394, "hbm_gib": 1e-6})
        monkeypatch.setattr(metrics, "detect_chip", lambda: "fake")
        e = DecodeEngine(qp, cfg, max_batch=2, max_seq=64,
                         runtime_cache="int8", drop_packed=False)
        assert e.params["layers"][0]["q_proj"].packed is not None

    def test_footprint_without_cache(self, tiny_model):
        """No runtime cache: exec_cache is zero, packed codes dominate."""
        cfg, params = tiny_model
        qp = llama.quantize_params(params, blocksize=32, dtype=jnp.float32)
        e = DecodeEngine(qp, cfg, max_batch=2, max_seq=64)
        fp = e.footprint()
        assert fp["exec_cache"] == 0 and fp["packed"] > 0

    def test_mesh_footprint_divides_shards(self, tiny_model):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from tpu_bitsandbytes.parallel import make_mesh
        cfg, params = tiny_model
        qp = llama.quantize_params(params, blocksize=32, dtype=jnp.float32)
        single = DecodeEngine(qp, cfg, max_batch=2, max_seq=64).footprint()
        mesh = make_mesh(tp=2, dp=2)
        multi = DecodeEngine(qp, cfg, max_batch=2, max_seq=64,
                             mesh=mesh).footprint()
        assert multi["packed"] == single["packed"] // 2
        assert multi["kv"] == single["kv"] // 4


class TestWarmupPlan:
    """VERDICT r2 #8: warmup compile-set growth must be bounded and the
    bound asserted. warmup_plan() is the exact compile set; chunk spans
    bucket geometrically above 2048 so long-context chunked engines stay
    at tens, not hundreds, of compiles."""

    def test_chunk_pairs_bounded_at_8k(self, tiny_model):
        cfg, params = tiny_model
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=8192,
                         quantized_kv=False, prefill_chunk=512)
        plan = e.warmup_plan(prompt_lengths=[8191])
        # spans: 128-multiples up to 2048 reached by 512-chunks (4) +
        # powers of two above (4096, 8192) = 6; one start (no window)
        assert len(plan["chunk_pairs"]) <= 8
        assert plan["n_compiles"] <= 12
        # the old per-128-bucket scheme would have been ~16 pairs
        from tpu_bitsandbytes.engine.engine import _chunk_span_bucket
        assert _chunk_span_bucket(2049, 8192) == 4096
        assert _chunk_span_bucket(4097, 8192) == 8192
        assert _chunk_span_bucket(1920, 8192) == 1920

    def test_chunk_pairs_bounded_at_32k(self, tiny_model):
        """max_seq 32k / chunk 512 (VERDICT's example: 'hundreds of XLA
        compiles'): the plan stays under ~30."""
        cfg, params = tiny_model
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=32768,
                         quantized_kv=False, prefill_chunk=512)
        plan = e.warmup_plan(prompt_lengths=[32767])
        assert len(plan["chunk_pairs"]) <= 24
        assert plan["n_compiles"] <= 32

    def test_warmup_dispatches_match_plan(self, tiny_model, monkeypatch):
        """warmup() must hit exactly the signatures the plan claims — one
        prefill per bucket, one chunk step per pair, one decode chunk per
        (window x variant)."""
        import tpu_bitsandbytes.engine.engine as eng_mod
        cfg, params = tiny_model
        calls = {"prefill": 0, "chunk": 0, "decode": 0}
        orig_p, orig_c, orig_d = (eng_mod.prefill_step,
                                  eng_mod.prefill_chunk_step,
                                  eng_mod.decode_chunk)

        def spy_p(*a, **k):
            calls["prefill"] += 1
            return orig_p(*a, **k)

        def spy_c(*a, **k):
            calls["chunk"] += 1
            return orig_c(*a, **k)

        def spy_d(*a, **k):
            calls["decode"] += 1
            return orig_d(*a, **k)

        monkeypatch.setattr(eng_mod, "prefill_step", spy_p)
        monkeypatch.setattr(eng_mod, "prefill_chunk_step", spy_c)
        monkeypatch.setattr(eng_mod, "decode_chunk", spy_d)
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=128,
                         quantized_kv=False, prefill_chunk=16)
        plan = e.warmup(prompt_lengths=[20, 100],
                        features=("sampled", "penalty"))
        assert calls["prefill"] == len(plan["prefill_buckets"])
        assert calls["chunk"] == len(plan["chunk_pairs"])
        assert calls["decode"] == (len(plan["decode_windows"])
                                   * len(plan["variants"]))
        assert plan["seconds"] > 0

    def test_warmup_covers_serving_no_recompile(self, tiny_model,
                                                monkeypatch):
        """After warmup, a chunked-prefill generate must not hit any NEW
        (span, start) chunk signature (the serving path and the plan use
        the same bucketing function)."""
        import tpu_bitsandbytes.engine.engine as eng_mod
        cfg, params = tiny_model
        rng = np.random.default_rng(3)
        e = DecodeEngine(params, cfg, max_batch=2, max_seq=128,
                         quantized_kv=False, prefill_chunk=16)
        plan = e.warmup(prompt_lengths=[100])
        pairs = set(plan["chunk_pairs"])
        seen = []
        orig_c = eng_mod.prefill_chunk_step

        def spy_c(*a, **k):
            seen.append((k.get("attn_span"), k.get("attn_start", 0)))
            return orig_c(*a, **k)

        monkeypatch.setattr(eng_mod, "prefill_chunk_step", spy_c)
        e.generate([list(rng.integers(0, cfg.vocab_size, 100))],
                   SamplingParams(max_new_tokens=3))
        assert seen and set(seen) <= pairs


class TestRuntimeCacheAuto:
    """runtime_cache="auto": exec-format-per-HBM-budget (VERDICT r3 #2)."""

    def test_auto_picks_int8_when_it_fits(self, tiny_model):
        cfg, params = tiny_model
        qparams = llama.quantize_params(params)
        eng = DecodeEngine(qparams, cfg, max_batch=1, max_seq=64,
                           runtime_cache="auto")
        from tpu_bitsandbytes.models.layers import QLinear4
        leaves = [l for l in jax.tree_util.tree_leaves(
            eng.params, is_leaf=lambda x: isinstance(x, QLinear4))
            if isinstance(l, QLinear4)]
        assert leaves and all(l.w_cache is not None
                              and l.w_cache.dtype == jnp.int8
                              for l in leaves)

    def test_auto_picks_int4_when_int8_over_budget(self, tiny_model,
                                                   monkeypatch):
        """Between the int8 and int4 budgets, auto must now pick int4 —
        its measured proxy ppl (+0.18% at the production 128-block) beats
        the int8 cache's +0.34%, and it decodes ~6x faster than the W4A8
        fallback it used to hand this regime to (VERDICT r4 #4)."""
        cfg, params = tiny_model
        qparams = llama.quantize_params(params)
        probe = DecodeEngine(qparams, cfg, max_batch=1, max_seq=64)
        t8 = sum(v for k, v in probe._footprint_est(
            qparams, "int8", True).items()
            if k in ("exec_cache", "fp", "kv", "activations_est"))
        t4 = sum(v for k, v in probe._footprint_est(
            qparams, "int4", True).items()
            if k in ("exec_cache", "fp", "kv", "activations_est"))
        assert t4 < t8
        budget_gib = ((t8 + t4) / 2) / 0.92 / 2 ** 30
        from tpu_bitsandbytes.utils import metrics
        shrunk = dict(metrics.CHIP_SPECS)
        shrunk["v5e"] = dict(shrunk["v5e"], hbm_gib=budget_gib)
        monkeypatch.setattr(metrics, "CHIP_SPECS", shrunk)
        with pytest.warns(UserWarning, match="int4 execution cache"):
            eng = DecodeEngine(qparams, cfg, max_batch=1, max_seq=64,
                               runtime_cache="auto")
        from tpu_bitsandbytes.models.layers import QLinear4
        leaves = [l for l in jax.tree_util.tree_leaves(
            eng.params, is_leaf=lambda x: isinstance(x, QLinear4))
            if isinstance(l, QLinear4)]
        assert leaves and all(l.w_cache is not None
                              and l.w_cache.dtype == jnp.int4
                              for l in leaves)

    def test_auto_falls_back_to_packed_when_over_budget(self, tiny_model,
                                                        monkeypatch):
        cfg, params = tiny_model
        qparams = llama.quantize_params(params)
        from tpu_bitsandbytes.utils import metrics
        shrunk = dict(metrics.CHIP_SPECS)
        shrunk["v5e"] = dict(shrunk["v5e"], hbm_gib=1e-6)   # nothing fits
        monkeypatch.setattr(metrics, "CHIP_SPECS", shrunk)
        with pytest.warns(UserWarning, match="W4A8"):
            eng = DecodeEngine(qparams, cfg, max_batch=1, max_seq=64,
                               runtime_cache="auto")
        from tpu_bitsandbytes.models.layers import QLinear4
        leaves = [l for l in jax.tree_util.tree_leaves(
            eng.params, is_leaf=lambda x: isinstance(x, QLinear4))
            if isinstance(l, QLinear4)]
        assert leaves and all(l.w_cache is None and l.packed is not None
                              for l in leaves)


class TestWindowStage:
    """Compact-window staged decode (round 5, kvcache.KVStage cut>0): the
    stage carries a contiguous copy of the attention span in front of the
    staged tail. Flush, read_stage, and chunk outputs must be equivalent
    to the plain two-block stage (window=False)."""

    L, B, S, H, D = 2, 3, 16, 2, 8

    def _filled_cache(self, seed=0, lengths=(5, 9, 12)):
        import dataclasses
        rng = np.random.default_rng(seed)
        c = KVCache.create(self.L, self.B, self.S, self.H, self.D,
                           quantized=True, dtype=jnp.float32)
        for p in range(max(lengths)):
            pos = jnp.full((self.B,), p, jnp.int32)
            for li in range(self.L):
                k = jnp.asarray(rng.standard_normal(
                    (self.B, 1, self.H, self.D)), jnp.float32)
                v = jnp.asarray(rng.standard_normal(
                    (self.B, 1, self.H, self.D)), jnp.float32)
                c = c.write_decode(li, k, v, pos)
        return dataclasses.replace(
            c, lengths=jnp.asarray(lengths, jnp.int32))

    def _run_chunk_writes(self, cache, window, n=4, span=None, start=0,
                          seed=7):
        import dataclasses
        c = cache.begin_stage(n, span=span, start=start, window=window)
        assert c.stage is not None
        assert (c.stage.cut > 0) == window
        rng = np.random.default_rng(seed)
        for _ in range(n):
            pos = c.lengths
            for li in range(self.L):
                k = jnp.asarray(rng.standard_normal(
                    (self.B, 1, self.H, self.D)), jnp.float32)
                v = jnp.asarray(rng.standard_normal(
                    (self.B, 1, self.H, self.D)), jnp.float32)
                c = c.write_decode(li, k, v, pos)
            c = dataclasses.replace(c, lengths=c.lengths + 1)
            c = c.advance_stage()
        return c

    @pytest.mark.parametrize("lengths,span", [
        ((5, 9, 12), None),        # plain mid-decode
        ((12, 9, 11), None),       # boundary: len0 == S - C (DUS clamp)
        ((5, 9, 12), 16),          # explicit span == S
    ])
    def test_flush_matches_plain_stage(self, lengths, span):
        base = self._filled_cache(lengths=lengths)
        fw = self._run_chunk_writes(base, window=True, span=span
                                    ).flush_stage()
        fp = self._run_chunk_writes(base, window=False, span=span
                                    ).flush_stage()
        for a, b in ((fw.k, fp.k), (fw.v, fp.v),
                     (fw.k_scale, fp.k_scale), (fw.v_scale, fp.v_scale)):
            assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_read_stage_tail_matches_plain(self):
        base = self._filled_cache()
        cw = self._run_chunk_writes(base, window=True)
        cp = self._run_chunk_writes(base, window=False)
        for li in range(self.L):
            for a, b in zip(cw.read_stage(li)[:4], cp.read_stage(li)[:4]):
                assert np.array_equal(np.asarray(a), np.asarray(b))

    def test_window_prefix_is_the_span_copy(self):
        base = self._filled_cache()
        cw = self._run_chunk_writes(base, window=True, span=8)
        st = cw.stage
        assert st.cut == 8
        assert np.array_equal(np.asarray(st.k[:, :, :, :8]),
                              np.asarray(base.k[:, :, :, :8]))

    def test_chunk_tokens_identical_window_vs_twoblock(self, tiny_model,
                                                       rng):
        """decode_chunk(window_stage=True) == (False) token-for-token on a
        quantized-KV f32 model (single-block vs two-block softmax over the
        same attended set)."""
        from tpu_bitsandbytes.engine.engine import decode_chunk
        from tpu_bitsandbytes.engine.sampler import SamplingArrays
        cfg, params = tiny_model
        B, n, prompt_len = 2, 6, 5
        prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)),
                             jnp.int32)

        def fresh():
            c = KVCache.create(cfg.num_layers, B, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=True, dtype=jnp.float32)
            for slot in range(B):
                _, c = prefill_step(params, c, prompt, jnp.int32(slot),
                                    jnp.int32(prompt_len), cfg)
            return c

        tokens0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (B,)),
                              jnp.int32)
        active0 = jnp.ones((B,), bool)
        samp = SamplingArrays.build({}, B)
        outs = {}
        for window in (True, False):
            toks_seq, *_ = decode_chunk(
                params, fresh(), tokens0, active0, jax.random.PRNGKey(0),
                samp, cfg, n_steps=n, all_greedy=True,
                window_stage=window)
            outs[window] = np.asarray(toks_seq)
        assert np.array_equal(outs[True], outs[False])
