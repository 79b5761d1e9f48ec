"""Speculative decoding: prompt-lookup proposals + greedy-exact verify.

The invariant everything hangs on: a speculative engine must emit EXACTLY
the tokens the plain greedy engine emits — speculation may only change how
many forwards it takes, never the text.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_bitsandbytes.models import llama
from tpu_bitsandbytes.engine import (
    DecodeEngine, KVCache, SamplingParams, decode_step, propose_ngram,
    verify_step,
)


@pytest.fixture(scope="module")
def tiny_model():
    # f32 compute: token-exact equivalence is provable (at bf16, batched
    # S=gamma+1 programs round differently from S=1 programs, so near-tied
    # argmaxes may flip — the batch-size-numerics caveat every serving
    # engine carries; see engine/speculative.py docstring)
    cfg = llama.LlamaConfig(vocab_size=512, hidden_size=128,
                            intermediate_size=256, num_layers=2, num_heads=4,
                            num_kv_heads=2, max_seq_len=128,
                            dtype=jnp.float32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


class TestProposeNgram:
    def test_finds_repeat(self):
        hist = [5, 6, 7, 8, 9, 1, 2, 5, 6, 7]
        assert propose_ngram(hist, gamma=3) == [8, 9, 1]

    def test_most_recent_match_wins(self):
        hist = [1, 2, 3, 1, 2, 4, 1, 2]
        assert propose_ngram(hist, gamma=1, n=2) == [4]

    def test_no_match(self):
        assert propose_ngram([1, 2, 3, 4, 5], gamma=3) == []

    def test_short_history(self):
        assert propose_ngram([1, 2], gamma=3) == []


class TestVerifyStep:
    def test_matches_sequential_greedy(self, tiny_model, rng):
        """Accepted drafts + bonus == what step-by-step greedy would emit."""
        cfg, params = tiny_model
        b, ctx, g = 2, 6, 3
        prompts = rng.integers(0, cfg.vocab_size, (b, ctx))

        # sequential greedy oracle: 1 + g tokens from the same state
        def run_sequential():
            cache = KVCache.create(cfg.num_layers, b, 32, cfg.num_kv_heads,
                                   cfg.hd, quantized=False,
                                   dtype=jnp.float32)
            toks = jnp.asarray(prompts[:, 0], jnp.int32)
            active = jnp.ones((b,), bool)
            seq = [np.asarray(toks)]
            for i in range(ctx - 1):
                logits, cache = decode_step(params, cache, toks, active, cfg)
                toks = jnp.asarray(prompts[:, i + 1], jnp.int32)
                seq.append(np.asarray(toks))
            out = []
            for _ in range(g + 1):
                logits, cache = decode_step(params, cache, toks, active, cfg)
                toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                out.append(np.asarray(toks))
            return np.stack(out, 1)                       # [B, g+1]

        oracle = run_sequential()

        # verify step fed the ORACLE's tokens as drafts: must accept all
        cache = KVCache.create(cfg.num_layers, b, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
        toks = jnp.asarray(prompts[:, 0], jnp.int32)
        active = jnp.ones((b,), bool)
        for i in range(ctx - 1):
            _, cache = decode_step(params, cache, toks, active, cfg)
            toks = jnp.asarray(prompts[:, i + 1], jnp.int32)
        verify_toks = np.concatenate(
            [np.asarray(toks)[:, None], oracle[:, :g]], axis=1)
        from tpu_bitsandbytes.engine.sampler import SamplingArrays
        emitted, counts, cache = verify_step(
            params, cache, jnp.asarray(verify_toks.astype(np.int32)),
            active, jax.random.PRNGKey(0), SamplingArrays.build({}, b), cfg)
        assert np.all(np.asarray(counts) == g + 1)        # all drafts accepted
        np.testing.assert_array_equal(np.asarray(emitted), oracle)

    def test_rejects_wrong_drafts_and_still_advances(self, tiny_model, rng):
        cfg, params = tiny_model
        b, g = 2, 3
        cache = KVCache.create(cfg.num_layers, b, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
        toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (b,)), jnp.int32)
        active = jnp.ones((b,), bool)
        logits, cache = decode_step(params, cache, toks, active, cfg)
        greedy_next = np.asarray(jnp.argmax(logits, axis=-1), np.int32)

        cache2 = KVCache.create(cfg.num_layers, b, 32, cfg.num_kv_heads,
                                cfg.hd, quantized=False, dtype=jnp.float32)
        # drafts chosen to be wrong: greedy_next + 1 (mod vocab)
        wrong = (greedy_next[:, None] + 1 + np.zeros((b, g), np.int32)
                 ) % cfg.vocab_size
        verify_toks = np.concatenate([np.asarray(toks)[:, None], wrong], 1)
        from tpu_bitsandbytes.engine.sampler import SamplingArrays
        emitted, counts, cache2 = verify_step(
            params, cache2, jnp.asarray(verify_toks.astype(np.int32)),
            active, jax.random.PRNGKey(0), SamplingArrays.build({}, b), cfg)
        assert np.all(np.asarray(counts) == 1)            # only the bonus
        np.testing.assert_array_equal(np.asarray(emitted)[:, 0], greedy_next)
        assert np.all(np.asarray(cache2.lengths) == 1)

    def test_inactive_slots_do_not_advance(self, tiny_model, rng):
        cfg, params = tiny_model
        b, g = 2, 2
        cache = KVCache.create(cfg.num_layers, b, 32, cfg.num_kv_heads,
                               cfg.hd, quantized=False, dtype=jnp.float32)
        toks = jnp.zeros((b, g + 1), jnp.int32)
        active = jnp.asarray([True, False])
        from tpu_bitsandbytes.engine.sampler import SamplingArrays
        _, counts, cache = verify_step(params, cache, toks, active,
                                       jax.random.PRNGKey(0),
                                       SamplingArrays.build({}, b), cfg)
        assert int(np.asarray(counts)[1]) == 0
        assert int(np.asarray(cache.lengths)[1]) == 0


class TestSpeculativeEngine:
    def _prompts(self, cfg, rng, repetitive: bool):
        if repetitive:
            pat = list(rng.integers(0, cfg.vocab_size, 4))
            return [pat * 4 for _ in range(3)]            # n-gram goldmine
        return [list(rng.integers(0, cfg.vocab_size, 12)) for _ in range(3)]

    @pytest.mark.parametrize("repetitive", [True, False])
    def test_matches_plain_greedy(self, tiny_model, rng, repetitive):
        cfg, params = tiny_model
        prompts = self._prompts(cfg, rng, repetitive)
        sp = SamplingParams(max_new_tokens=10)

        ref = DecodeEngine(params, cfg, max_batch=2, max_seq=128,
                           quantized_kv=False).generate(prompts, sp)
        spec_eng = DecodeEngine(params, cfg, max_batch=2, max_seq=128,
                                quantized_kv=False, speculative="ngram",
                                spec_gamma=3)
        out = spec_eng.generate(prompts, sp)
        assert out == ref
        assert spec_eng.spec_stats["verify_steps"] > 0
        assert "speculative" in spec_eng.stats

    def test_stochastic_slots_use_rejection_acceptance(self, tiny_model,
                                                       rng):
        """Sampled slots ride the verify step too (rejection acceptance
        preserves the sampling distribution — unit-proved in
        TestAcceptanceDistribution); outputs stay well-formed."""
        cfg, params = tiny_model
        eng = DecodeEngine(params, cfg, max_batch=2, max_seq=128,
                           quantized_kv=False, speculative="ngram")
        outs = eng.generate(
            [list(rng.integers(0, cfg.vocab_size, 6)) for _ in range(2)],
            SamplingParams(max_new_tokens=4, temperature=0.9))
        assert all(len(o) == 4 for o in outs)
        assert eng.spec_stats["verify_steps"] > 0

    def test_penalty_requests_fall_back(self, tiny_model, rng):
        """Repetition-penalty slots bypass speculation (no seen-mask in the
        verify step) and still finish on the chunked path."""
        cfg, params = tiny_model
        eng = DecodeEngine(params, cfg, max_batch=1, max_seq=128,
                           quantized_kv=False, speculative="ngram")
        outs = eng.generate(
            [list(rng.integers(0, cfg.vocab_size, 6))],
            SamplingParams(max_new_tokens=4, repetition_penalty=1.3))
        assert len(outs[0]) == 4
        assert eng.spec_stats["verify_steps"] == 0

    def test_eos_mid_acceptance_stops(self, tiny_model, rng):
        """EOS inside an accepted draft run must end the request there."""
        cfg, params = tiny_model
        prompts = [list(rng.integers(0, cfg.vocab_size, 8))]
        ref_eng = DecodeEngine(params, cfg, max_batch=1, max_seq=128,
                               quantized_kv=False)
        ref = ref_eng.generate(prompts, SamplingParams(max_new_tokens=10))[0]
        # pick the 3rd greedy token as the EOS so it lands mid-run
        eos = ref[2]
        sp = SamplingParams(max_new_tokens=10, eos_token_id=int(eos))
        ref_eos = DecodeEngine(params, cfg, max_batch=1, max_seq=128,
                               quantized_kv=False).generate(prompts, sp)
        spec = DecodeEngine(params, cfg, max_batch=1, max_seq=128,
                            quantized_kv=False, speculative="ngram",
                            spec_gamma=3).generate(prompts, sp)
        assert spec == ref_eos


class TestAcceptanceDistribution:
    """accept_and_emit implements speculative sampling with a point-mass
    proposal: the FIRST emitted token's marginal over keys must equal the
    model's processed sampling distribution exactly (the speculative
    sampling theorem), regardless of which draft was proposed."""

    def test_first_token_marginal_matches_target(self):
        from tpu_bitsandbytes.engine.speculative import accept_and_emit
        from tpu_bitsandbytes.engine.sampler import SamplingArrays
        v, g = 8, 3
        rng = np.random.default_rng(3)
        # one sampled slot, temperature 1: target = softmax(logits[0, 0])
        logits = jnp.asarray(rng.standard_normal((1, g + 1, v)), jnp.float32)
        target = np.asarray(jax.nn.softmax(logits[0, 0]))
        samp = SamplingArrays(jnp.asarray([1.0]), jnp.asarray([0]),
                              jnp.asarray([1.0]), jnp.asarray([-1]),
                              jnp.asarray([1.0]))
        draft = int(np.argmax(target))    # propose the most likely token
        tokens = jnp.asarray([[0] + [draft] * g], jnp.int32)

        @jax.jit
        def first_tok(key):
            emitted, _ = accept_and_emit(logits, tokens, key, samp)
            return emitted[0, 0]

        n = 20000
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        toks = np.asarray(jax.vmap(first_tok)(keys))
        emp = np.bincount(toks, minlength=v) / n
        # 20k draws: max deviation ~4 sigma of a binomial at p=0.25 ≈ 0.012
        np.testing.assert_allclose(emp, target, atol=0.015)

    def test_unlikely_draft_marginal_still_matches(self):
        """Low-probability draft -> mostly rejections; the residual sampling
        must still reproduce the target marginal."""
        from tpu_bitsandbytes.engine.speculative import accept_and_emit
        from tpu_bitsandbytes.engine.sampler import SamplingArrays
        v, g = 8, 2
        rng = np.random.default_rng(4)
        logits = jnp.asarray(rng.standard_normal((1, g + 1, v)) * 2,
                             jnp.float32)
        target = np.asarray(jax.nn.softmax(logits[0, 0]))
        samp = SamplingArrays(jnp.asarray([1.0]), jnp.asarray([0]),
                              jnp.asarray([1.0]), jnp.asarray([-1]),
                              jnp.asarray([1.0]))
        draft = int(np.argmin(target))
        tokens = jnp.asarray([[0] + [draft] * g], jnp.int32)

        @jax.jit
        def first_tok(key):
            emitted, _ = accept_and_emit(logits, tokens, key, samp)
            return emitted[0, 0]

        n = 20000
        keys = jax.random.split(jax.random.PRNGKey(1), n)
        toks = np.asarray(jax.vmap(first_tok)(keys))
        emp = np.bincount(toks, minlength=v) / n
        np.testing.assert_allclose(emp, target, atol=0.015)

    def test_greedy_rows_still_exact(self):
        """Greedy slots in the same batch keep exact-match acceptance."""
        from tpu_bitsandbytes.engine.speculative import accept_and_emit
        from tpu_bitsandbytes.engine.sampler import SamplingArrays
        v, g = 8, 3
        rng = np.random.default_rng(5)
        logits = jnp.asarray(rng.standard_normal((2, g + 1, v)), jnp.float32)
        preds = np.asarray(jnp.argmax(logits, axis=-1))
        # row 0 greedy with correct drafts; row 1 greedy with a wrong first
        toks = np.zeros((2, g + 1), np.int32)
        toks[0, 1:] = preds[0, :g]
        toks[1, 1:] = (preds[1, :g] + 1) % v
        samp = SamplingArrays(jnp.asarray([0.0, 0.0]), jnp.asarray([0, 0]),
                              jnp.asarray([1.0, 1.0]), jnp.asarray([-1, -1]),
                              jnp.asarray([1.0, 1.0]))
        emitted, n_acc = accept_and_emit(logits, jnp.asarray(toks),
                                         jax.random.PRNGKey(0), samp)
        assert int(n_acc[0]) == g and int(n_acc[1]) == 0
        np.testing.assert_array_equal(np.asarray(emitted)[0], preds[0])
        assert int(np.asarray(emitted)[1, 0]) == preds[1, 0]
