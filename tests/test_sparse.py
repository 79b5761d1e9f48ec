"""Sparse COO op tests (reference: tests/test_sparse.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

import tpu_bitsandbytes.functional as F


def make_sparse(rng, rows=64, cols=128, density=0.1):
    dense = rng.standard_normal((rows, cols)).astype(np.float32)
    mask = rng.random((rows, cols)) < density
    return dense * mask


class TestSpmmCoo:
    def test_matches_dense(self, rng):
        sp = make_sparse(rng)
        ri, ci, v, r, c = F.sparse_coo_from_dense(sp)
        d = rng.standard_normal((128, 32)).astype(np.float32)
        y = np.asarray(F.spmm_coo(ri, ci, v, jnp.asarray(d), r, c))
        assert np.abs(y - sp @ d).max() < 1e-4

    def test_empty_sparse(self, rng):
        sp = np.zeros((8, 16), np.float32)
        ri, ci, v, r, c = F.sparse_coo_from_dense(sp)
        d = rng.standard_normal((16, 4)).astype(np.float32)
        y = np.asarray(F.spmm_coo(ri, ci, v, jnp.asarray(d), r, c))
        assert np.allclose(y, 0)

    def test_threshold(self, rng):
        dense = rng.standard_normal((32, 32)).astype(np.float32)
        ri, ci, v, r, c = F.sparse_coo_from_dense(dense, threshold=1.0)
        assert np.all(np.abs(np.asarray(v)) >= 1.0)


class TestSpmmCooInt8:
    def test_quantize_sparse_coo(self, rng):
        sp = make_sparse(rng)
        ri, ci, v, r, c = F.sparse_coo_from_dense(sp)
        ri2, ci2, v8, scale = F.quantize_sparse_coo(ri, ci, v)
        assert v8.dtype == jnp.int8
        assert scale.shape == (1,)
        vd = np.asarray(v8, np.float32) * float(scale[0])
        assert np.abs(vd - np.asarray(v)).max() < float(scale[0]) * 1.01

    def test_matches_fp(self, rng):
        sp = make_sparse(rng)
        ri, ci, v, r, c = F.sparse_coo_from_dense(sp)
        _, _, v8, scale = F.quantize_sparse_coo(ri, ci, v)
        d = rng.standard_normal((128, 16)).astype(np.float32)
        y8 = np.asarray(F.spmm_coo_int8(ri, ci, v8, scale, jnp.asarray(d),
                                        r, c, dtype=jnp.float32), np.float32)
        y_ref = sp @ d
        denom = np.abs(y_ref).mean() + 1e-6
        assert np.abs(y8 - y_ref).mean() / denom < 0.05
