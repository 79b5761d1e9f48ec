"""Per-module state-dict protocol (VERDICT r3 next-round #6).

The reference gets save/load on every module via torch ``state_dict`` with an
explicit requantize-on-load / mismatch-warning protocol on Linear4bit
(mps_bitsandbytes/nn/linear4bit.py:245-312). Here every quantized module
carries the same protocol:

* quantized round trip — buffers serialize and restore bit-identically;
* full-precision checkpoint (a plain ``weight`` key, like a torch
  ``nn.Linear`` state dict) re-quantizes on load;
* metadata mismatches (blocksize / quant_type / threshold) warn and adopt
  the checkpoint's value;
* the base ``Module`` recurses over submodules with dotted prefixes, so a
  composite model saves/loads in one call.
"""

import warnings

import numpy as np
import pytest
import jax.numpy as jnp

from tpu_bitsandbytes.nn import (
    Embedding4bit,
    Embedding8bit,
    Linear4bit,
    Linear8bit,
    LinearFP8,
    OutlierAwareLinear,
    SwitchBackLinear,
)
from tpu_bitsandbytes.nn.base import Module


class _Src:
    def __init__(self, weight, bias=None, padding_idx=None):
        self.weight = weight
        self.bias = bias
        self.padding_idx = padding_idx


def _rand_linear(rng, n=16, k=32, bias=True):
    w = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n,)), jnp.float32) if bias else None
    return _Src(w, b)


MODULE_CASES = [
    ("linear8bit", lambda src: Linear8bit.from_linear(src)),
    ("linear_fp8", lambda src: LinearFP8.from_linear(src)),
    ("outlier", lambda src: OutlierAwareLinear.from_linear(src)),
    ("switchback", lambda src: SwitchBackLinear.from_linear(src)),
]


@pytest.mark.parametrize("name,conv", MODULE_CASES)
def test_quantized_round_trip(rng, name, conv):
    src = _rand_linear(rng)
    layer = conv(src)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    ref = np.asarray(layer(x), np.float32)

    sd = layer.state_dict()
    fresh = conv(_rand_linear(rng))          # different weights
    fresh.load_state_dict(sd)
    got = np.asarray(fresh(x), np.float32)
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


@pytest.mark.parametrize("name,conv", MODULE_CASES)
def test_fp_checkpoint_requantize_on_load(rng, name, conv):
    """Loading a plain fp ``weight`` (torch nn.Linear-style checkpoint)
    re-quantizes and matches a fresh from_linear conversion exactly."""
    src = _rand_linear(rng)
    ref_layer = conv(src)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    ref = np.asarray(ref_layer(x), np.float32)

    fresh = conv(_rand_linear(rng))
    fresh.load_state_dict({"weight": np.asarray(src.weight, np.float32),
                           "bias": np.asarray(src.bias, np.float32)})
    got = np.asarray(fresh(x), np.float32)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


@pytest.mark.parametrize("name,conv", MODULE_CASES)
def test_fp_checkpoint_rejects_integer_weight(rng, name, conv):
    layer = conv(_rand_linear(rng))
    with pytest.raises(ValueError, match="full-precision"):
        layer.load_state_dict(
            {"weight": np.zeros((16, 32), np.int64)})


def test_embedding4bit_round_trip_and_requantize(rng):
    w = jnp.asarray(rng.standard_normal((32, 24)), jnp.float32)
    emb = Embedding4bit.from_embedding(_Src(w))
    ids = jnp.asarray([0, 3, 31, 7])
    ref = np.asarray(emb(ids), np.float32)

    fresh = Embedding4bit(32, 24)
    fresh.load_state_dict(emb.state_dict())
    np.testing.assert_allclose(np.asarray(fresh(ids), np.float32), ref)

    # fp table re-quantizes on load (odd logical dim exercises padding)
    w_odd = jnp.asarray(rng.standard_normal((32, 23)), jnp.float32)
    ref2 = Embedding4bit.from_embedding(_Src(w_odd))
    fresh2 = Embedding4bit(32, 24)
    fresh2.load_state_dict({"weight": np.asarray(w_odd, np.float32)})
    np.testing.assert_allclose(
        np.asarray(fresh2(ids), np.float32),
        np.asarray(ref2(ids), np.float32))
    assert fresh2.logical_dim == 23


def test_embedding4bit_mismatch_warnings(rng):
    w = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    src = Embedding4bit.from_embedding(_Src(w), quant_type="fp4",
                                       blocksize=32)
    target = Embedding4bit(16, 32, quant_type="nf4", blocksize=64)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        target.load_state_dict(src.state_dict())
    msgs = " ".join(str(r.message) for r in rec)
    assert "blocksize mismatch" in msgs
    assert "quant_type mismatch" in msgs
    assert target.blocksize == 32 and target.quant_type == "fp4"
    ids = jnp.asarray([1, 5])
    np.testing.assert_allclose(np.asarray(target(ids), np.float32),
                               np.asarray(src(ids), np.float32))


def test_embedding8bit_round_trip_and_requantize(rng):
    w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    emb = Embedding8bit.from_embedding(_Src(w))
    ids = jnp.asarray([[0, 9], [15, 31]])
    ref = np.asarray(emb(ids), np.float32)

    fresh = Embedding8bit(32, 16)
    fresh.load_state_dict(emb.state_dict())
    np.testing.assert_allclose(np.asarray(fresh(ids), np.float32), ref)

    fresh2 = Embedding8bit(32, 16)
    fresh2.load_state_dict({"weight": np.asarray(w, np.float32)})
    np.testing.assert_allclose(np.asarray(fresh2(ids), np.float32), ref)


def test_outlier_threshold_mismatch_warns(rng):
    w = np.asarray(rng.standard_normal((8, 16)), np.float32)
    w[:, 3] *= 50.0                              # force an outlier column
    src = OutlierAwareLinear.from_linear(_Src(jnp.asarray(w)), threshold=3.0)
    assert src.num_outliers > 0
    target = OutlierAwareLinear(16, 8, threshold=6.0)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        target.load_state_dict(src.state_dict())
    assert any("threshold mismatch" in str(r.message) for r in rec)
    assert target.threshold == 3.0
    x = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    np.testing.assert_allclose(np.asarray(target(x), np.float32),
                               np.asarray(src(x), np.float32))


def test_switchback_fp_master_drives_sync(rng):
    src = _rand_linear(rng)
    layer = SwitchBackLinear.from_linear(src)
    # load only the master weight: int8 buffers must re-derive
    fresh = SwitchBackLinear(32, 16)
    fresh.load_state_dict({"weight_fp": np.asarray(layer.weight_fp),
                           "bias": np.asarray(layer.bias)})
    np.testing.assert_array_equal(np.asarray(fresh.weight_int8),
                                  np.asarray(layer.weight_int8))


class _TinyModel(Module):
    """Composite model exercising the base-class recursion."""

    def __init__(self, rng):
        self.embed = Embedding8bit.from_embedding(
            _Src(jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)))
        self.blocks = [
            Linear8bit.from_linear(_Src(
                jnp.asarray(rng.standard_normal((8, 8)), jnp.float32))),
            Linear4bit.from_linear(_Src(
                jnp.asarray(rng.standard_normal((8, 8)), jnp.float32))),
        ]
        self.scale = jnp.ones((8,), jnp.float32)

    def forward(self, ids):
        x = self.embed(ids).astype(jnp.float32)
        for blk in self.blocks:
            x = blk(x).astype(jnp.float32)
        return x * self.scale


def test_composite_model_recursion(rng):
    model = _TinyModel(rng)
    sd = model.state_dict()
    # dotted prefixes for children, plain keys for arrays
    assert "embed.weight_int8" in sd
    assert "blocks.0.weight_int8" in sd
    assert "blocks.1.weight" in sd                 # Linear4bit packed buffer
    assert "blocks.1.weight_quant_state" in sd
    assert "scale" in sd

    ids = jnp.asarray([1, 2, 3])
    ref = np.asarray(model(ids), np.float32)
    fresh = _TinyModel(np.random.default_rng(999))
    fresh.scale = jnp.full((8,), 2.0, jnp.float32)
    fresh.load_state_dict(sd)
    np.testing.assert_allclose(np.asarray(fresh(ids), np.float32), ref)
