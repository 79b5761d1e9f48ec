"""W4A8 in-kernel NF4 probe (VERDICT r2 next-round #3).

The question: can a Pallas kernel that streams PACKED nibbles (0.5 B/param)
and decodes them to an int8 MXU operand in-register beat the int8 runtime
execution cache (1 B/param at ~750 GB/s)? Break-even is ~2x the cache's
per-matmul device time; win is anything below it.

Formulation measured here (the VERDICT sketch, built for real):
  * packed uint8 [N, K/2] streamed HBM->VMEM by the grid
  * nibble unpack in i32 (no 8-bit vector shifts on this target)
  * codebook decode to an INT8 operand: 16-way i32 select of
    round(codebook * 127), then i32 -> i8 convert (int8 codebook adds
    <=0.4% rowmax error on top of NF4 — same order as the int8 cache)
  * per-absmax-block i8 x i8 -> i32 dots (k2-tile = bs2 lanes per dot),
    f32 partial scaling by (absmax / 127) on the [M_t, N_t] PARTIALS —
    the per-element work is unpack+select+convert only, no scale multiply
  * activations pre-quantized to int8 per row (A8), row scale folded on
    the output

Baselines: the production fused kernel (bf16 prescale path) and the int8
execution cache's XLA convert+dot.

Run: python -m kbench.w4a8_probe  (real TPU; ~2 min)
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kbench.probe2 import profile
from tpu_bitsandbytes.functional import NF4_CODEBOOK_NP, QuantState

N = K = 4096
BS = 64          # NF4 blocksize
NREPS = 20

NF4_I8 = np.round(NF4_CODEBOOK_NP * 127.0).astype(np.int32)


def _w4a8_kernel(*refs, bs2: int, n_k: int, lut_mode: str = "select"):
    """Grid (gn, gk); M fits one tile. Per-block i8 dots, f32 partials."""
    if lut_mode == "gather":
        xe_ref, xo_ref, w_ref, amT_ref, tbl_ref, out_ref, acc_ref = refs
    else:
        xe_ref, xo_ref, w_ref, amT_ref, out_ref, acc_ref = refs
    ik = pl.program_id(1)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w32 = w_ref[:].astype(jnp.int32)          # [N_t, K2_t]
    lo = w32 & 0x0F
    hi = w32 >> 4
    if lut_mode == "gather":
        # NOTE: does not lower on this Mosaic version — tpu.dynamic_gather
        # requires indices.shape == source.shape(+1): source and index must
        # share a single <=128-lane vreg along the gather axis, so a
        # [N_t, K2_t] index block cannot gather from a 16-entry table
        # without a sublane relayout of the whole tile (KERNEL_NOTES
        # round-1 Mosaic findings). Kept for when Mosaic grows multi-vreg
        # dynamic_gather.
        tbl_b = jnp.broadcast_to(tbl_ref[0, :][None, :],
                                 (lo.shape[0], 16))
        vlo = jnp.take_along_axis(tbl_b, lo, axis=1)
        vhi = jnp.take_along_axis(tbl_b, hi, axis=1)
    else:
        # 16-way select to the int8 codebook (i32 lanes), then narrow to i8
        vlo = jnp.full(lo.shape, NF4_I8[0], jnp.int32)
        vhi = jnp.full(hi.shape, NF4_I8[0], jnp.int32)
        for i in range(1, 16):
            vlo = jnp.where(lo == i, NF4_I8[i], vlo)
            vhi = jnp.where(hi == i, NF4_I8[i], vhi)
    vlo8 = vlo.astype(jnp.int8)
    vhi8 = vhi.astype(jnp.int8)

    n_t, k2_t = w_ref.shape
    nblk = k2_t // bs2
    dn = (((1,), (1,)), ((), ()))
    acc = acc_ref[:]
    for b in range(nblk):
        sl = slice(b * bs2, (b + 1) * bs2)
        pe = jax.lax.dot_general(xe_ref[:, sl], vlo8[:, sl], dn,
                                 preferred_element_type=jnp.int32)
        po = jax.lax.dot_general(xo_ref[:, sl], vhi8[:, sl], dn,
                                 preferred_element_type=jnp.int32)
        # absmax/127 for this block: amT [nblk_t, N_t]
        am = amT_ref[b, :] * (1.0 / 127.0)
        acc = acc + (pe + po).astype(jnp.float32) * am[None, :]
    acc_ref[:] = acc

    @pl.when(ik == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("m_t", "n_t", "k2_t", "bs2",
                                              "lut_mode"))
def w4a8_matmul(xe, xo, packed2d, amT, *, m_t, n_t, k2_t, bs2,
                lut_mode="select"):
    m, k2 = xe.shape
    n = packed2d.shape[0]
    gk = k2 // k2_t
    kernel = functools.partial(_w4a8_kernel, bs2=bs2, n_k=gk,
                               lut_mode=lut_mode)
    in_specs = [
        pl.BlockSpec((m_t, k2_t), lambda i, j: (0, j)),
        pl.BlockSpec((m_t, k2_t), lambda i, j: (0, j)),
        pl.BlockSpec((n_t, k2_t), lambda i, j: (i, j)),
        pl.BlockSpec((k2_t // bs2, n_t), lambda i, j: (j, i)),
    ]
    args = [xe, xo, packed2d, amT]
    if lut_mode == "gather":
        in_specs.append(pl.BlockSpec((1, 16), lambda i, j: (0, 0)))
        args.append(jnp.asarray(NF4_I8[None, :], jnp.int32))
    return pl.pallas_call(
        kernel,
        grid=(n // n_t, gk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m_t, n_t), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m_t, n_t), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * 2 * k2, bytes_accessed=n * k2, transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def main():
    rng = np.random.default_rng(0)
    bs2 = BS // 2
    k2 = K // 2

    for m, lut_mode in [(1, "select"), (8, "select"), (32, "select")]:
        m_t = max(8, m)
        n_t, k2_t = 256, 2048
        packed = [jnp.asarray(rng.integers(0, 256, (N, k2)), jnp.uint8)
                  for _ in range(NREPS)]
        amT = [jnp.asarray(rng.uniform(0.005, 0.03, (k2 // bs2, N)),
                           jnp.float32) for _ in range(NREPS)]
        x8 = jnp.asarray(rng.integers(-127, 128, (m_t, k2)), jnp.int8)

        def chain(xe, xo, ws, ams):
            for w, am in zip(ws, ams):
                y = w4a8_matmul(xe, xo, w, am, m_t=m_t, n_t=n_t, k2_t=k2_t,
                                bs2=bs2, lut_mode=lut_mode)
                # data dependency to defeat CSE; requantize y rows to i8
                s = jnp.max(jnp.abs(y), axis=-1, keepdims=True) + 1e-6
                q = jnp.clip(jnp.round(y / s * 127.0), -127, 127
                             ).astype(jnp.int8)
                xe = q[:, :k2]
                xo = q[:, k2:2 * k2] if y.shape[1] >= 2 * k2 else q[:, :k2]
            return xe

        f = jax.jit(chain)
        profile(f"w4a8 in-kernel M={m} lut={lut_mode}", lambda: f(x8, x8, packed, amT),
                N * k2, NREPS)

        # correctness spot-check vs dequant reference (first weight)
        lo = (np.asarray(packed[0]) & 15).astype(np.int32)
        hi = (np.asarray(packed[0]) >> 4).astype(np.int32)
        am0 = np.asarray(amT[0]).T                       # [N, nblk]
        sc = np.repeat(am0, bs2, axis=1)                 # [N, K2]
        wlo = NF4_I8[lo] / 127.0 * sc
        whi = NF4_I8[hi] / 127.0 * sc
        xe_f = np.asarray(x8, np.float32)
        ref = xe_f @ wlo.T + xe_f @ whi.T
        got = np.asarray(w4a8_matmul(x8, x8, packed[0], amT[0], m_t=m_t, lut_mode=lut_mode,
                                     n_t=n_t, k2_t=k2_t, bs2=bs2))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"   correctness vs reference: rel max err {err:.2e}")

    # baseline: int8 execution cache (XLA convert+dot) at M=8
    ws_i8 = [jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
             for _ in range(NREPS)]
    x_bf = jnp.asarray(rng.standard_normal((8, K)) * 0.05, jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))

    def chain_cache(x, ws):
        for w in ws:
            y = jax.lax.dot_general(x, w.astype(jnp.bfloat16), dn,
                                    preferred_element_type=jnp.float32)
            x = y.astype(jnp.bfloat16)[:, :K]
        return x
    profile("int8-cache XLA convert+dot M=8",
            lambda: jax.jit(chain_cache)(x_bf, ws_i8), N * K, NREPS)


if __name__ == "__main__":
    main()
