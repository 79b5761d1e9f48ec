"""Tiled Pallas flash-attention for aligned causal prefill (VERDICT r3 #4).

The XLA flash path (models.layers.gqa_attention_flash: a Python loop of
lax.scans over [512, 512] blocks) is correct and O(S) in memory, but its
block logits are [B, H, bq, bk] f32 = 268 MB — far beyond VMEM — so every
mask/exp/rescale pass is an HBM round trip. At 7B S=4096 B=8 that chain
measures ~1.7 s of the 4.8 s prefill (36% of device time at <1% MXU
efficiency) while the matmuls ride at ~187 TFLOP/s (kbench/
prefill_breakdown). This kernel keeps the online-softmax tiles in VMEM:

* operands are viewed as [B, S_pad, H*D] (a zero-cost reshape of the
  token-major layout) so every block's trailing dims are (S-tile, 128) —
  Mosaic's lowering requires the last two block dims to be (8k, 128m) or
  full, which the natural [B, S, H, D] blocking violates;
* grid (B, H, nq): one q block per cell (the q loop rides the grid, not a
  Python unroll — one compiled body, no 8x compile-time blowup); k/v
  BlockSpecs index only (batch, head), so Mosaic elides their HBM->VMEM
  copies across consecutive q blocks of the same head;
* per cell, a lax.fori_loop streams k blocks up to the causal diagonal
  (n_kb = qi+1 at bq == bk) with the standard (m, l, acc) carry — all VPU
  work on VMEM tiles, zero HBM traffic beyond the operand reads;
* GQA via the k/v index_map (kv head = h // rep); causal, sliding-window,
  softcap, and key-padding masks are positional predicates on block
  iotas, so no mask tensor is ever materialized; sliding windows also
  lower-bound the k-block loop;
* bf16 x bf16 -> f32 MXU dots (same dtype policy as the XLA path; f32
  configs stay on the XLA path — CPU/tests keep the jnp oracle).

models.layers.gqa_attention_flash dispatches here on TPU for aligned
causal prefill; TBNB_FLASH_PREFILL=0 restores the XLA scan path.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["flash_prefill_attention", "flash_prefill_supported"]

_NEG = -1e30


def flash_prefill_supported(b, s, h, h_kv, d, dtype, s_pad) -> bool:
    """TPU, half-precision, MXU-friendly dims, VMEM-sized S tile."""
    if os.environ.get("TBNB_FLASH_PREFILL", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    if jnp.dtype(dtype) not in (jnp.bfloat16, jnp.float16):
        return False
    if d % 128 or d > 256 or s_pad % 512 or h % h_kv:
        return False
    # k/v S-tiles (bf16, double-buffered) + q/out blocks + f32 logits/acc
    vmem = (2 * 2 * s_pad * d * 2) + 4 * 512 * d * 2 + 512 * 512 * 4 \
        + 2 * 512 * d * 4
    return vmem <= 14 * 2 ** 20


def _kernel(q_ref, k_ref, v_ref, o_ref, *, bq: int, bk: int, s_real: int,
            scale: float, window: Optional[int], softcap: Optional[float]):
    qi = pl.program_id(2)
    d = q_ref.shape[2]
    dn = (((1,), (1,)), ((), ()))            # QK: contract d (lanes)
    dn_pv = (((1,), (0,)), ((), ()))         # PV: contract bk (sublanes)

    q = q_ref[0]                             # [bq, d] bf16
    qpos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    # bq == bk: the causal diagonal ends in block qi
    n_kb = qi + 1
    if window is None:
        kb_lo = 0
    else:
        # smallest key position kept is qi*bq - window + 1
        kb_lo = jnp.maximum(0, (qi * bq - window + 1) // bk)

    def body(ki, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(ki * bk, bk), :]
        v = v_ref[0, pl.ds(ki * bk, bk), :]
        lg = jax.lax.dot_general(
            q, k, dn, preferred_element_type=jnp.float32) * scale
        if softcap is not None:
            lg = jnp.tanh(lg / softcap) * softcap
        kpos = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        keep = (kpos <= qpos) & (kpos < s_real)
        if window is not None:
            keep &= kpos > qpos - window
        lg = jnp.where(keep, lg, _NEG)
        m_new = jnp.maximum(m, jnp.max(lg, axis=-1))
        p = jnp.exp(lg - m_new[:, None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, dn_pv,
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc * alpha[:, None] + pv

    m0 = jnp.full((bq,), _NEG, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    a0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(kb_lo, n_kb, body, (m0, l0, a0))
    out = acc / jnp.maximum(l, 1e-38)[:, None]
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s_real", "scale", "window",
                                             "softcap", "block"))
def flash_prefill_attention(q, k, v, *, s_real: int, scale: float,
                            window: Optional[int] = None,
                            softcap: Optional[float] = None,
                            block: int = 512):
    """Causal GQA prefill attention, one (B, H, q-block) grid cell.

    q [B, S_pad, H, D]; k/v [B, S_pad, H_kv, D] (token-major, padded to a
    ``block`` multiple); keys at positions >= ``s_real`` are masked (query
    padding rows compute garbage and are sliced off by the caller).
    Returns [B, S_pad, H, D] in q's dtype.
    """
    b, s_pad, h, d = q.shape
    h_kv = k.shape[2]
    rep = h // h_kv
    kernel = functools.partial(_kernel, bq=block, bk=block, s_real=s_real,
                               scale=float(scale), window=window,
                               softcap=softcap)
    # Mosaic needs trailing block dims (8k, 128m)|full: fold heads into
    # lanes — [B, S, H*D] with a 128-wide lane slice per head.
    qf = q.reshape(b, s_pad, h * d)
    kf = k.reshape(b, s_pad, h_kv * d)
    vf = v.reshape(b, s_pad, h_kv * d)
    out = pl.pallas_call(
        kernel,
        grid=(b, h, s_pad // block),
        in_specs=[
            pl.BlockSpec((1, block, d), lambda i, j, qi: (i, qi, j)),
            pl.BlockSpec((1, s_pad, d),
                         lambda i, j, qi, rep=rep: (i, 0, j // rep)),
            pl.BlockSpec((1, s_pad, d),
                         lambda i, j, qi, rep=rep: (i, 0, j // rep)),
        ],
        out_specs=pl.BlockSpec((1, block, d), lambda i, j, qi: (i, qi, j)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, h * d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf)
    return out.reshape(b, s_pad, h, d)
