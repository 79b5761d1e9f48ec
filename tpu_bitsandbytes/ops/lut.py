"""In-kernel 16-entry codebook lookup strategies for 4-bit dequantization.

The 4-bit fused matmul kernels need ``value = codebook[code]`` for codes in
[0, 16) on the VPU. This is the hot inner decode of the framework (reference
equivalent: the inline nibble-dequant in the Metal kernels, e.g.
csrc/mps_bitsandbytes.mm:492-518). Several strategies are provided; the
matmul kernels pick one via the ``lut_mode`` parameter and ``bench/`` scripts
measure them on real hardware.

Strategies
----------
``select``  — running sum of 16 predicated terms (portable, always correct).
``tree``    — 15-select binary tree over the 4 code bits (fewer ops on the
              critical path than ``select`` for some compilers).
``gather``  — ``jnp.take`` on a VMEM-resident table; lowers to the TPU
              dynamic-gather instruction on supported Mosaic versions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def lut_select(codes: jnp.ndarray, table: np.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Sum of masked constants: ``Σ_i (codes==i) * table[i]``.

    Pure compare→convert→fma arithmetic (no selects): ``jnp.where`` with
    scalar/replicated operands triggers Mosaic i1-relayout failures, and
    mask-multiply lowers cleanly on the VPU.
    """
    # Mosaic supports u8→i32→f32 but not u8→f32 directly.
    c = codes if codes.dtype == jnp.int32 else codes.astype(jnp.int32)
    out = (c == 0).astype(dtype) * dtype(table[0])
    for i in range(1, len(table)):
        out = out + (c == i).astype(dtype) * dtype(table[i])
    return out


def lut_tree(codes: jnp.ndarray, table: np.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Arithmetic binary tree over the 4 code bits: 4 mask-lerp levels.

    Each level halves the table with ``lo + b*(hi-lo)``; total ~4 converts +
    8 fma-class ops per element vs 16 compare+fma for ``select``.
    """
    c = codes if codes.dtype == jnp.int32 else codes.astype(jnp.int32)
    b = [((c >> k) & 1).astype(dtype) for k in range(4)]
    vals = [dtype(v) for v in table]
    level = vals
    for k in range(4):
        level = [level[i] + b[k] * (level[i + 1] - level[i])
                 for i in range(0, len(level), 2)]
    return level[0]


def lut_gather(codes: jnp.ndarray, table: np.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """``jnp.take`` — relies on Mosaic lowering to a lane dynamic-gather."""
    tbl = jnp.asarray(table, dtype=dtype)
    return jnp.take(tbl, codes.astype(jnp.int32), axis=0)


_LUT_FNS = {
    "select": lut_select,
    "tree": lut_tree,
    "gather": lut_gather,
}


def lookup(codes: jnp.ndarray, table: np.ndarray, mode: str = "select",
           dtype=jnp.float32) -> jnp.ndarray:
    return _LUT_FNS[mode](codes, table, dtype)
