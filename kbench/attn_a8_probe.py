"""Probe: decode-attention formulations at the int4-regime shapes.

After the int4 execution cache, the XLA attention chain is the #1 decode
residue (fusion_breakdown int4 B=8: QK 0.58 + PV 0.64 + glue ~0.3 ms/step
vs a 0.65 ms KV-DMA floor). The QK/PV convert+dot fusions run at
~430-450 GB/s on the int8 KV codes while the same convert+dot mechanism
streams WEIGHTS at ~750 GB/s — hypothesis: the bf16 convert of K/V runs
as a VPU pass in these batched-dot fusions instead of MXU-ingest. If
int8-quantizing q (and the probabilities, v_scale folded) turns both
contractions into native s8 x s8 -> s32 MXU dots at weight-stream rates,
the chain drops ~2x.

Variants (probe2 methodology: distinct KV buffers per chain step,
data-dependent chaining, profiler device time; B=8 H=32 T=256 D=128 =
the 7B bench shape):
  A. shipped: bf16-q einsum chain (gqa_attention_kv_quant arithmetic)
  B. i8-q: s8 x s8 QK, p row-quantized with v_scale folded, s8 x s8 PV
  C. B but with K stored D-major [B, H, D, T] (QK contraction on
     sublanes — the MXU-natural rhs layout)

Run: python -m kbench.attn_a8_probe [--span 256] [--batch 8]
"""

import argparse
import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp

from kbench.probe2 import device_time_us

NREPS = 10
TRACE_ROOT = "/tmp/tbnb_traces_attn8"


def profile(name, fn, bytes_per_step, n_steps, iters=3, top=6):
    fn()
    jax.block_until_ready(fn())
    d = os.path.join(TRACE_ROOT, name.replace(" ", "_"))
    shutil.rmtree(d, ignore_errors=True)
    with jax.profiler.trace(d):
        for _ in range(iters):
            y = fn()
        jax.block_until_ready(y)
    total, per_op = device_time_us(d)
    per = total / iters / n_steps
    print(f"{name:36s}: {per:8.1f} us/layer-step dev  "
          f"{bytes_per_step/(per*1e-6)/1e9:6.1f} GB/s on KV bytes")
    for op, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"    {op[:70]:70s} {us/iters:9.1f} us/iter")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--span", type=int, default=256)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()
    b, h, t, d = args.batch, args.heads, args.span, args.dim
    rng = np.random.default_rng(0)
    scale = 1.0 / np.sqrt(d)

    kvs = []
    for _ in range(NREPS):
        kq = jnp.asarray(rng.integers(-127, 128, (b, h, t, d)), jnp.int8)
        vq = jnp.asarray(rng.integers(-127, 128, (b, h, t, d)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.03, (b, h, t)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.03, (b, h, t)), jnp.float32)
        kT = jnp.asarray(np.moveaxis(np.asarray(kq), 3, 2))   # [B,H,D,T]
        kvs.append((kq, vq, ks, vs, kT))
    q0 = jnp.asarray(rng.standard_normal((b, 1, h, d)) * 0.1, jnp.bfloat16)
    kv_bytes = 2 * b * h * t * d

    # A: the shipped arithmetic (einsum, bf16 convert+dot, scales folded)
    def step_a(q, kq, vq, ks, vs):
        qg = q.reshape(b, 1, h, 1, d).astype(jnp.bfloat16)
        lg = jnp.einsum("bshrd,bhtd->bhrst", qg, kq.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        lg = lg * (ks * (scale / 127.0))[:, :, None, None, :]
        p = jax.nn.softmax(lg, axis=-1)
        pv = (p * (vs / 127.0)[:, :, None, None, :]).astype(jnp.bfloat16)
        o = jnp.einsum("bhrst,bhtd->bshrd", pv, vq.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return o.reshape(b, 1, h, d)

    # B: i8-q + i8-p (scales on output/partials, s8 x s8 MXU dots)
    def step_b(q, kq, vq, ks, vs):
        qf = q.reshape(b, h, d).astype(jnp.float32)
        s_q = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0 + 1e-12
        q8 = jnp.clip(jnp.round(qf / s_q), -127, 127).astype(jnp.int8)
        dn = (((3,), (3,)), ((0, 1), (0, 1)))     # contract d, batch (b,h)
        lg = jax.lax.dot_general(q8[:, :, None, :], kq, dn,
                                 preferred_element_type=jnp.int32)
        lg = lg.astype(jnp.float32) * (
            s_q[..., None] * (ks * (scale / 127.0))[:, :, None, :])
        p = jax.nn.softmax(lg, axis=-1)           # [b, h, 1, t]
        pv = p * (vs / 127.0)[:, :, None, :]
        s_p = jnp.max(pv, axis=-1, keepdims=True) + 1e-30
        p8 = jnp.clip(jnp.round(pv * (127.0 / s_p)), 0, 127).astype(jnp.int8)
        dnv = (((3,), (2,)), ((0, 1), (0, 1)))    # contract t
        o = jax.lax.dot_general(p8, vq, dnv,
                                preferred_element_type=jnp.int32)
        o = o.astype(jnp.float32) * s_p
        return o.reshape(b, 1, h, d)

    # C: i8-q with K D-major (contraction on rhs sublanes)
    def step_c(q, kT, vq, ks, vs):
        qf = q.reshape(b, h, d).astype(jnp.float32)
        s_q = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0 + 1e-12
        q8 = jnp.clip(jnp.round(qf / s_q), -127, 127).astype(jnp.int8)
        dn = (((3,), (2,)), ((0, 1), (0, 1)))     # contract d (sublanes of kT)
        lg = jax.lax.dot_general(q8[:, :, None, :], kT, dn,
                                 preferred_element_type=jnp.int32)
        lg = lg.astype(jnp.float32) * (
            s_q[..., None] * (ks * (scale / 127.0))[:, :, None, :])
        p = jax.nn.softmax(lg, axis=-1)
        pv = p * (vs / 127.0)[:, :, None, :]
        s_p = jnp.max(pv, axis=-1, keepdims=True) + 1e-30
        p8 = jnp.clip(jnp.round(pv * (127.0 / s_p)), 0, 127).astype(jnp.int8)
        dnv = (((3,), (2,)), ((0, 1), (0, 1)))
        o = jax.lax.dot_general(p8, vq, dnv,
                                preferred_element_type=jnp.int32)
        o = o.astype(jnp.float32) * s_p
        return o.reshape(b, 1, h, d)

    def chain(step, pick):
        @jax.jit
        def f(q, *flat):
            kvs2 = [flat[i * 5:(i + 1) * 5] for i in range(NREPS)]
            x = q
            for kv in kvs2:
                o = step(x, *pick(kv))
                # data dependency: fold the output back into q
                x = (x + o.astype(x.dtype) * 1e-3)
            return x
        flat = [a for kv in kvs for a in kv]
        return lambda: f(q0, *flat)

    # numerics: B vs A on the first KV
    oa = np.asarray(step_a(q0, *kvs[0][:4]), np.float32)
    ob = np.asarray(step_b(q0, *kvs[0][:4]), np.float32)
    cos = (oa * ob).sum() / (np.linalg.norm(oa) * np.linalg.norm(ob) + 1e-9)
    print(f"i8-q vs bf16-q attention cosine: {cos:.6f}  "
          f"max rel {np.abs(ob-oa).max()/(np.abs(oa).max()+1e-9):.2e}")

    profile("A bf16-q einsum (shipped)", chain(step_a, lambda kv: kv[:4]),
            kv_bytes, NREPS)
    profile("B i8-q s8xs8 dots", chain(step_b, lambda kv: kv[:4]),
            kv_bytes, NREPS)
    profile("C i8-q, K D-major",
            chain(step_c, lambda kv: (kv[4], kv[1], kv[2], kv[3])),
            kv_bytes, NREPS)


if __name__ == "__main__":
    main()
