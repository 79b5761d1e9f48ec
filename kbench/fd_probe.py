"""Probe: WHERE does in-situ decode attention lose 2x vs its isolated rate?

kbench/attn_a8_probe measured the shipped bf16-q einsum chain at 715 GB/s
(23.5 us/layer, 87% of the KV-DMA floor) in isolation, while
kbench/fusion_breakdown attributes ~38-47 us/layer to the same chain in
situ (B=8: QK 0.58 + PV 0.64 + glue ~0.3 ms/step over 32 layers). The
difference is the in-situ STRUCTURE: the span slice out of a larger
cache buffer, the causal/window masks, and the staged two-block softmax.
This probe reconstructs that structure element by element (probe2
methodology: NREPS distinct KV buffers, data-dependent chaining,
profiler device time) so the 15-24 us/layer residue gets a name:

  A  plain          isolated einsum chain (attn_a8_probe A; ~23.5 us)
  B  +slice         K/V read as [.., :span, .] slices of max_seq buffers
  C  +mask          plain + the causal/window mask + where(-1e30)
  D  staged         the FULL shipped in-situ formulation
                    (slice + masks + two-block staged softmax =
                    models.layers.gqa_attention_kv_quant(staged=...))
  P  pallas         ops.flash_decode_attention on the same inputs
                    (the round-3 kernel, net-negative in situ so far)

Run: python -m kbench.fd_probe [--batch 8] [--span 256] [--buf 512]
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from kbench.attn_a8_probe import profile
from kbench.fd_variants import mr_decode_attention
from kbench.fd_tm import tm_decode_attention
from tpu_bitsandbytes.models.layers import gqa_attention_kv_quant
from tpu_bitsandbytes.ops.flash_decode import flash_decode_attention

NREPS = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--span", type=int, default=256)
    ap.add_argument("--buf", type=int, default=512,
                    help="cache buffer length the span is sliced from")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--staged-len", type=int, default=32)
    args = ap.parse_args()
    b, h, t, d = args.batch, args.heads, args.span, args.dim
    tb, c = args.buf, args.staged_len
    rng = np.random.default_rng(0)
    scale = 1.0 / np.sqrt(d)

    kvs = []
    for _ in range(NREPS):
        # full-length cache buffers; the span variants slice [:t]
        kq = jnp.asarray(rng.integers(-127, 128, (b, h, tb, d)), jnp.int8)
        vq = jnp.asarray(rng.integers(-127, 128, (b, h, tb, d)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.03, (b, h, tb)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.03, (b, h, tb)), jnp.float32)
        stk = jnp.asarray(rng.integers(-127, 128, (b, h, c, d)), jnp.int8)
        stv = jnp.asarray(rng.integers(-127, 128, (b, h, c, d)), jnp.int8)
        stks = jnp.asarray(rng.uniform(0.01, 0.03, (b, h, c)), jnp.float32)
        stvs = jnp.asarray(rng.uniform(0.01, 0.03, (b, h, c)), jnp.float32)
        kvs.append((kq, vq, ks, vs, stk, stv, stks, stvs))
    q0 = jnp.asarray(rng.standard_normal((b, 1, h, d)) * 0.1, jnp.bfloat16)
    # mid-decode positions: every slot attends to most of the span
    off_np = rng.integers(t - 64, t - 8, b).astype(np.int32)
    off = jnp.asarray(off_np)
    step = jnp.int32(c // 2)
    kv_bytes = 2 * b * h * t * d          # what the span variants must read

    def plain_step(q, kq, vq, ks, vs):
        qg = q.reshape(b, 1, h, 1, d).astype(jnp.bfloat16)
        lg = jnp.einsum("bshrd,bhtd->bhrst", qg, kq.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        lg = lg * (ks * (scale / 127.0))[:, :, None, None, :]
        p = jax.nn.softmax(lg, axis=-1)
        pv = (p * (vs / 127.0)[:, :, None, None, :]).astype(jnp.bfloat16)
        o = jnp.einsum("bhrst,bhtd->bshrd", pv, vq.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return o.reshape(b, 1, h, d)

    # A: isolated plain chain on pre-sliced [.., t, .] buffers
    def step_a(q, kv):
        kq, vq, ks, vs = kv[0], kv[1], kv[2], kv[3]
        return plain_step(q, kq[:, :, :t], vq[:, :, :t],
                          ks[:, :, :t], vs[:, :, :t])

    # B == A here (the slice happens inside the jit either way); kept as a
    # control for fusion-boundary effects when buf != span.
    step_b = step_a

    # C: + the causal mask (mask built in-fusion, where(-1e30))
    def step_c(q, kv):
        kq, vq, ks, vs = (a[:, :, :t] for a in kv[:4])
        qg = q.reshape(b, 1, h, 1, d).astype(jnp.bfloat16)
        lg = jnp.einsum("bshrd,bhtd->bhrst", qg, kq.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        lg = lg * (ks * (scale / 127.0))[:, :, None, None, :]
        kpos = jnp.arange(t)[None, None, None, None, :]
        keep = kpos <= off[:, None, None, None, None]
        lg = jnp.where(keep, lg, -1e30)
        p = jax.nn.softmax(lg, axis=-1)
        pv = (p * (vs / 127.0)[:, :, None, None, :]).astype(jnp.bfloat16)
        o = jnp.einsum("bhrst,bhtd->bshrd", pv, vq.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return o.reshape(b, 1, h, d)

    # D: the full shipped in-situ formulation
    def step_d(q, kv):
        kq, vq, ks, vs, stk, stv, stks, stvs = kv
        return gqa_attention_kv_quant(
            q, kq[:, :, :t], ks[:, :, :t], vq[:, :, :t], vs[:, :, :t],
            causal_offset=off[:, None], scale=scale,
            staged=(stk, stks, stv, stvs, step))

    # P: the Pallas flash-decode kernel on the same inputs
    def step_p(q, kv):
        kq, vq, ks, vs, stk, stv, stks, stvs = kv
        o = flash_decode_attention(
            q.reshape(b, h, d), kq[:, :, :t], ks[:, :, :t],
            vq[:, :, :t], vs[:, :, :t], off,
            staged=(stk, stks, stv, stvs, step), scale=scale)
        return o.reshape(b, 1, h, d)

    # E: compact-window single-block — the main span is FROZEN during a
    # decode chunk (staged writes go to separate buffers), so a per-chunk
    # copy into a contiguous [B,H,span+C,D] window with the staged tokens
    # at the tail turns the whole staged structure into ONE unsliced
    # einsum chain + a 2D-kpos mask. The copy amortizes over the chunk
    # (~16.7 MB/layer per 32 steps = <1% of step time).
    len0 = off - step                       # pre-chunk lengths per slot
    w = t + c
    kpos_main = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    kpos_st = len0[:, None] + jnp.arange(c)[None, :]
    kpos2d = jnp.concatenate([kpos_main, kpos_st], axis=1)   # [B, W]
    in_main = jnp.arange(w)[None, :] < t
    keep2d = ((kpos2d <= off[:, None])
              & (~in_main | (kpos2d <= len0[:, None] - 1)))  # [B, W]
    ekvs = []
    for kv in kvs:
        kq, vq, ks, vs, stk, stv, stks, stvs = kv
        ekvs.append((jnp.concatenate([kq[:, :, :t], stk], axis=2),
                     jnp.concatenate([vq[:, :, :t], stv], axis=2),
                     jnp.concatenate([ks[:, :, :t], stks], axis=2),
                     jnp.concatenate([vs[:, :, :t], stvs], axis=2)))

    def step_e(q, kv):
        kq, vq, ks, vs = kv[0], kv[1], kv[2], kv[3]
        qg = q.reshape(b, 1, h, 1, d).astype(jnp.bfloat16)
        lg = jnp.einsum("bshrd,bhtd->bhrst", qg, kq.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        lg = lg * (ks * (scale / 127.0))[:, :, None, None, :]
        lg = jnp.where(keep2d[:, None, None, None, :], lg, -1e30)
        p = jax.nn.softmax(lg, axis=-1)
        pv = (p * (vs / 127.0)[:, :, None, None, :]).astype(jnp.bfloat16)
        o = jnp.einsum("bhrst,bhtd->bshrd", pv, vq.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return o.reshape(b, 1, h, d)

    def chain_e():
        @jax.jit
        def f(q, *flat):
            kvs2 = [flat[i * 4:(i + 1) * 4] for i in range(NREPS)]
            x = q
            for kv in kvs2:
                o = step_e(x, kv)
                x = (x + o.astype(x.dtype) * 1e-3)
            return x
        flat = [a for kv in ekvs for a in kv]
        return lambda: f(q0, *flat)

    # T: T-as-M flipped-orientation Pallas kernel (kbench/fd_tm)
    def step_t(q, kv):
        kq, vq, ks, vs, stk, stv, stks, stvs = kv
        o = tm_decode_attention(
            q.reshape(b, h, d), kq[:, :, :t], ks[:, :, :t],
            vq[:, :, :t], vs[:, :, :t], off,
            staged=(stk, stks, stv, stvs, step), scale=scale)
        return o.reshape(b, 1, h, d)

    # M: multiply-reduce Pallas variant (kbench/fd_variants)
    def make_step_m(cd):
        def step_m(q, kv):
            kq, vq, ks, vs, stk, stv, stks, stvs = kv
            o = mr_decode_attention(
                q.reshape(b, h, d), kq[:, :, :t], ks[:, :, :t],
                vq[:, :, :t], vs[:, :, :t], off,
                staged=(stk, stks, stv, stvs, step), scale=scale,
                compute_dtype=cd)
            return o.reshape(b, 1, h, d)
        return step_m

    def chain(step):
        @jax.jit
        def f(q, *flat):
            kvs2 = [flat[i * 8:(i + 1) * 8] for i in range(NREPS)]
            x = q
            for kv in kvs2:
                o = step(x, kv)
                x = (x + o.astype(x.dtype) * 1e-3)
            return x
        flat = [a for kv in kvs for a in kv]
        return lambda: f(q0, *flat)

    # numerics: D vs E / P / M on the first KV (same masked softmax set)
    od = np.asarray(step_d(q0, kvs[0]), np.float32)
    for nm, st in (("E cw", lambda q, kv: step_e(q, ekvs[0])),
                   ("P i8", step_p), ("T i8", step_t),
                   ("M f32", make_step_m(jnp.float32)),
                   ("M bf16", make_step_m(jnp.bfloat16))):
        o2 = np.asarray(st(q0, kvs[0]), np.float32)
        cos = (od * o2).sum() / (np.linalg.norm(od) * np.linalg.norm(o2)
                                 + 1e-9)
        print(f"{nm:7s} vs staged-einsum cosine: {cos:.6f}  "
              f"max rel {np.abs(o2-od).max()/(np.abs(od).max()+1e-9):.2e}")

    profile("A plain (isolated)", chain(step_a), kv_bytes, NREPS)
    profile("C plain + mask", chain(step_c), kv_bytes, NREPS)
    profile("D staged in-situ formulation", chain(step_d), kv_bytes, NREPS)
    profile("E compact-window single-block", chain_e(), kv_bytes, NREPS)
    profile("P pallas flash_decode (r3)", chain(step_p), kv_bytes, NREPS)
    profile("T pallas T-as-M", chain(step_t), kv_bytes, NREPS)
    profile("M pallas multiply-reduce f32",
            chain(make_step_m(jnp.float32)), kv_bytes, NREPS)
    profile("M pallas multiply-reduce bf16",
            chain(make_step_m(jnp.bfloat16)), kv_bytes, NREPS)


if __name__ == "__main__":
    main()
