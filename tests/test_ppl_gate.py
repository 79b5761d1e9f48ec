"""Perplexity gate on the calibrated proxy (BASELINE config 2 analogue).

The reference gate is |Δppl| ≤ 0.1 at ppl ≈ 5.68 on a real 7B checkpoint
(reference README / BASELINE.md) — ≈ 1.8 % relative. No checkpoints exist in
this environment, so the gate runs against the trained-proxy model
(tpu_bitsandbytes/utils/proxy.py): a tiny Llama trained on a structured
Zipf corpus until its NLL is far below uniform, giving quantization error a
realistic weight distribution to act on. Asserted at 2 % relative.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_bitsandbytes.models import llama
from tpu_bitsandbytes.utils import proxy

GATE_REL = 0.02     # reference: 0.1 / 5.68 ≈ 1.8 % relative


@pytest.fixture(scope="module")
def trained_proxy():
    cfg = llama.LlamaConfig(vocab_size=256, hidden_size=192,
                            intermediate_size=384, num_layers=2, num_heads=4,
                            num_kv_heads=4, max_seq_len=128,
                            dtype=jnp.float32)
    corpus = proxy.make_corpus(0, cfg.vocab_size, 24000)
    params, _ = proxy.train_proxy_lm(cfg, corpus[:20000], steps=250,
                                     batch=16, seq=48)
    ev = proxy.eval_batches(corpus[20000:], batch=8, seq=48)
    ppl_fp = proxy.teacher_forced_ppl(params, cfg, ev)
    return cfg, params, ev, ppl_fp


class TestPplGate:
    def test_proxy_actually_learned(self, trained_proxy):
        """The gate is meaningless on a near-uniform model — require the
        proxy to sit far below uniform ppl (=vocab)."""
        cfg, _, _, ppl_fp = trained_proxy
        assert ppl_fp < cfg.vocab_size / 5, ppl_fp

    @pytest.mark.parametrize("compress", [False, True])
    def test_nf4_ppl_delta_within_gate(self, trained_proxy, compress):
        cfg, params, ev, ppl_fp = trained_proxy
        q = llama.quantize_params(params, blocksize=64, dtype=jnp.float32,
                                  compress_statistics=compress)
        ppl_q = proxy.teacher_forced_ppl(q, cfg, ev)
        rel = abs(ppl_q / ppl_fp - 1)
        assert rel <= GATE_REL, (ppl_fp, ppl_q, rel)

    def test_fp4_ppl_delta_within_gate(self, trained_proxy):
        cfg, params, ev, ppl_fp = trained_proxy
        q = llama.quantize_params(params, blocksize=64, dtype=jnp.float32,
                                  quant_type="fp4")
        ppl_q = proxy.teacher_forced_ppl(q, cfg, ev)
        assert abs(ppl_q / ppl_fp - 1) <= GATE_REL, (ppl_fp, ppl_q)

    def test_int8_runtime_cache_within_gate(self, trained_proxy):
        """The int8 execution cache (decode fast path) must not move ppl
        beyond the gate either — it adds ≤0.4 % rowmax error on top of NF4."""
        cfg, params, ev, ppl_fp = trained_proxy
        q = llama.quantize_params(params, blocksize=64, dtype=jnp.float32)
        qc = llama.build_runtime_cache(q, "int8")
        ppl_q = proxy.teacher_forced_ppl(qc, cfg, ev)
        assert abs(ppl_q / ppl_fp - 1) <= GATE_REL, (ppl_fp, ppl_q)

    def test_int4_runtime_cache_within_gate(self, trained_proxy):
        """The int4 execution cache REQUANTIZES the NF4 weight to symmetric
        int4-linear per INT4_BLOCK (=128) K-block. At that blocksize the
        measured 7B-proxy delta is +0.18% — BETTER than the int8 cache's
        +0.34% (KERNEL_NOTES round 4), so it gates at the same 1x
        nf4/int8 gate, and the `auto` engine policy is allowed to pick it
        (engine.DecodeEngine). The gate runs at the ACTUAL production
        blocksize, imported, so a retune cannot silently outrun the test.
        teacher_forced_ppl runs at M > 64 so this measures the XLA dequant
        path's numerics; the decode kernel's A8 arithmetic is
        oracle-tested in tests/test_int4_cache.py."""
        from tpu_bitsandbytes.ops.int4cache import INT4_BLOCK
        assert INT4_BLOCK == 128, "gate was calibrated at 128 — re-measure"
        cfg, params, ev, ppl_fp = trained_proxy
        q = llama.quantize_params(params, blocksize=64, dtype=jnp.float32)
        qc = llama.build_runtime_cache(q, "int4")
        ppl_q = proxy.teacher_forced_ppl(qc, cfg, ev)
        assert abs(ppl_q / ppl_fp - 1) <= GATE_REL, (ppl_fp, ppl_q)

    def test_quantized_kv_decode_within_gate(self, trained_proxy):
        """KV-cache int8 quantization impact, measured through the decode
        path (the forward-only ppl cannot see it)."""
        cfg, params, ev, _ = trained_proxy
        q = llama.quantize_params(params, blocksize=64, dtype=jnp.float32)
        p_fp = proxy.decode_ppl(q, cfg, ev[:, :33], quantized_kv=False)
        p_i8 = proxy.decode_ppl(q, cfg, ev[:, :33], quantized_kv=True)
        assert abs(p_i8 / p_fp - 1) <= GATE_REL, (p_fp, p_i8)
