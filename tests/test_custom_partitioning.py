"""GSPMD-partitionable fused matmul (VERDICT r3 next-round #5).

The fused Pallas dequant-matmul is wrapped in
``jax.experimental.custom_partitioning`` (ops/matmul4bit.py
``_make_partitioned``), so a plain ``jax.jit`` over NamedSharding'd
quantized weights runs the fused kernel per shard instead of silently
falling back to the unfused XLA path (which materializes dequantized
weights — the warning the MULTICHIP dryrun used to print).

Tests run on the 8-virtual-device CPU mesh with ``TBNB_FUSED_INTERPRET=1``
(interpret-mode Pallas under partitioning — the same program TPU compiles).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_bitsandbytes.functional import (
    QuantState,
    dequantize_4bit,
    has_fused_kernels,
    matmul_4bit,
    quantize_4bit,
)
from tpu_bitsandbytes.ops.matmul4bit import fused_matmul_4bit


@pytest.fixture
def fused_interpret(monkeypatch):
    monkeypatch.setenv("TBNB_FUSED_INTERPRET", "1")
    assert has_fused_kernels()


@pytest.fixture
def mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("dp", "tp"))


def _quantized(rng, n=512, k=256, blocksize=64):
    w = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    packed, state = quantize_4bit(w, blocksize=blocksize)
    return w, packed, state


class TestFusedUnderPjit:
    def test_column_parallel_weights(self, rng, mesh, fused_interpret):
        """N-sharded packed weights: the kernel partitions, output is
        N-sharded, numerics match the single-device fused result."""
        w, packed, state = _quantized(rng)
        x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)

        ref = np.asarray(fused_matmul_4bit(x, packed, state))

        packed2d = packed.reshape(512, 128)
        packed_sh = jax.device_put(
            packed2d, NamedSharding(mesh, P("tp", None)))
        absmax_sh = jax.device_put(
            state.absmax.reshape(512, 4), NamedSharding(mesh, P("tp", None)))
        x_sh = jax.device_put(x, NamedSharding(mesh, P(None, None)))

        def f(x, pk, am):
            st = QuantState(absmax=am.reshape(-1), shape=(512, 256),
                            blocksize=64, quant_type="nf4",
                            dtype=jnp.float32)
            return fused_matmul_4bit(x, pk.reshape(-1), st)

        out = jax.jit(f)(x_sh, packed_sh, absmax_sh)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5,
                                   atol=1e-5)
        # the result must come out N-sharded over tp (not replicated):
        # partitioning actually happened
        spec = out.sharding.spec
        assert "tp" in str(spec), f"output not tp-sharded: {spec}"

    def test_dp_sharded_activations(self, rng, mesh, fused_interpret):
        w, packed, state = _quantized(rng)
        x = jnp.asarray(rng.standard_normal((16, 256)), jnp.float32)
        ref = np.asarray(fused_matmul_4bit(x, packed, state))
        x_sh = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
        out = jax.jit(lambda x: fused_matmul_4bit(x, packed, state))(x_sh)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5,
                                   atol=1e-5)

    def test_matmul_4bit_no_fallback_warning(self, rng, mesh,
                                             fused_interpret):
        """The public matmul_4bit over sharded weights must route to the
        fused kernel (no unfused-fallback warning) and match the oracle."""
        import warnings as W
        import tpu_bitsandbytes.functional as F
        w, packed, state = _quantized(rng)
        x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
        packed_sh = jax.device_put(
            packed.reshape(512, 128), NamedSharding(mesh, P("tp", None)))

        prev = F._native_fallback_warned
        F._native_fallback_warned = False
        try:
            with W.catch_warnings(record=True) as rec:
                W.simplefilter("always")
                out = jax.jit(
                    lambda x, pk: matmul_4bit(x, pk.reshape(-1), state)
                )(x, packed_sh)
                np.asarray(out)
            assert not any("unfused XLA fallback" in str(r.message)
                           for r in rec)
        finally:
            F._native_fallback_warned = prev
        oracle = x @ np.asarray(dequantize_4bit(packed, state)).T
        cos = np.sum(oracle * np.asarray(out)) / (
            np.linalg.norm(oracle) * np.linalg.norm(np.asarray(out)))
        assert cos > 0.99

    def test_grad_through_partitioned_kernel(self, rng, mesh,
                                             fused_interpret):
        """QLoRA-style d_x through the custom_vjp wrapping the partitioned
        kernel, with tp-sharded weights."""
        w, packed, state = _quantized(rng)
        x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
        packed_sh = jax.device_put(
            packed.reshape(512, 128), NamedSharding(mesh, P("tp", None)))

        def loss(x, pk):
            y = fused_matmul_4bit(x, pk.reshape(-1), state)
            return jnp.sum(y ** 2)

        g = jax.jit(jax.grad(loss))(x, packed_sh)
        wd = np.asarray(dequantize_4bit(packed, state))
        y = np.asarray(x) @ wd.T
        g_ref = 2.0 * y @ wd
        np.testing.assert_allclose(np.asarray(g), g_ref, rtol=2e-3,
                                   atol=2e-3)
