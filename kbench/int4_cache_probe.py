"""Probe: the complete int4-execution-cache pipeline at 7B decode shapes.

Storage is uint8 [N, K/2] (two s4 per byte, low nibble first — the
jit-arg RecursionError bug means s4 arrays cannot be passed into jit, so
every jitted program bitcasts u8 -> s4 [N, K/2, 2] -> reshape [N, K],
which is layout-free on the packed S4 representation). The kernel is
int4_forms_probe form C: in-kernel s4 -> s8 convert (one hardware pass),
per-64-block s8 x s8 -> s32 MXU dots, f32 scales on the [M, N_t] partials.

Variants:
  A8  — activations row-quantized to s8 outside the kernel (W4A8 class)
  A16 — bf16 activations, weights converted s4 -> bf16 in-kernel (exact
        activations; one more VPU pass on the weight tile)

Prints device us/matmul + effective GB/s on packed bytes + max rel err vs
the f32 reference. Run: python -m kbench.int4_cache_probe
"""

import functools
import os
import shutil

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from kbench.probe2 import device_time_us

M, N, K = 8, 22016, 4096
BS = 64
N_T = 512
NREPS = 8
TRACE_ROOT = "/tmp/tbnb_traces_i4c"
dn = (((1,), (1,)), ((), ()))


def _kernel(x_ref, w_ref, s_ref, o_ref, *, a8: bool):
    w = w_ref[:].astype(jnp.int8 if a8 else jnp.bfloat16)
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for b in range(K // BS):
        sl = slice(b * BS, (b + 1) * BS)
        p = jax.lax.dot_general(
            x_ref[:, sl], w[:, sl], dn,
            preferred_element_type=jnp.int32 if a8 else jnp.float32)
        acc = acc + p.astype(jnp.float32) * s_ref[b, :][None, :]
    o_ref[:] = acc


def mm(x, w_u8, s, a8: bool):
    w4 = jax.lax.bitcast_convert_type(w_u8, jnp.int4).reshape(N, K)
    return pl.pallas_call(
        functools.partial(_kernel, a8=a8),
        grid=(N // N_T,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0)),
            pl.BlockSpec((N_T, K), lambda i: (i, 0)),
            pl.BlockSpec((K // BS, N_T), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((M, N_T), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
    )(x, w4, s)


def pack_u8(q4):
    """[N, K] int in [-8, 7] -> uint8 [N, K/2], low nibble first."""
    lo = (q4[:, 0::2] & 0xF).astype(np.uint8)
    hi = (q4[:, 1::2] & 0xF).astype(np.uint8)
    return lo | (hi << 4)


def profile(name, fn, bytes_per_matmul, n_matmuls, iters=3):
    fn()
    jax.block_until_ready(fn())
    d = os.path.join(TRACE_ROOT, name.replace(" ", "_"))
    shutil.rmtree(d, ignore_errors=True)
    with jax.profiler.trace(d):
        for _ in range(iters):
            y = fn()
        jax.block_until_ready(y)
    total, per_op = device_time_us(d)
    per = total / iters / n_matmuls
    print(f"{name:24s}: {per:8.1f} us/matmul dev  "
          f"{bytes_per_matmul/(per*1e-6)/1e9:6.1f} GB/s packed")
    for op, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:4]:
        print(f"    {op[:64]:64s} {us/iters:9.1f} us/iter")


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    q4s = [rng.integers(-8, 8, (N, K)) for _ in range(NREPS)]
    w_u8s = [jnp.asarray(pack_u8(q)) for q in q4s]
    s = jnp.asarray(rng.uniform(0.01, 0.03, (K // BS, N)), jnp.float32)

    # correctness (first weight)
    xf = rng.standard_normal((M, K)).astype(np.float32)
    ref = sum((xf[:, b*BS:(b+1)*BS] @ q4s[0][:, b*BS:(b+1)*BS].T.astype(np.float32))
              * np.asarray(s)[b][None, :] for b in range(K // BS))

    x8 = jnp.asarray(np.clip(np.round(xf / 0.02), -127, 127), jnp.int8)
    out8 = jax.jit(functools.partial(mm, a8=True))(x8, w_u8s[0], s)
    ref8 = sum((np.asarray(x8, np.float32)[:, b*BS:(b+1)*BS]
                @ q4s[0][:, b*BS:(b+1)*BS].T.astype(np.float32))
               * np.asarray(s)[b][None, :] for b in range(K // BS))
    e8 = np.abs(np.asarray(out8) - ref8).max() / (np.abs(ref8).max() + 1e-9)
    print(f"A8 rel err vs exact-int reference: {e8:.2e}")

    xb = jnp.asarray(xf, jnp.bfloat16)
    out16 = jax.jit(functools.partial(mm, a8=False))(xb, w_u8s[0], s)
    e16 = np.abs(np.asarray(out16) - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"A16 rel err vs f32 reference (bf16 rounding): {e16:.2e}")

    def chain(a8, x):
        @jax.jit
        def f(x, s, *ws):
            outs = [mm(x, w, s, a8) for w in ws]
            return sum(o[0, 0] for o in outs), outs[-1]
        return lambda: f(x, s, *w_u8s)

    profile("int4-cache A8", chain(True, x8), N * K // 2, NREPS)
    profile("int4-cache A16", chain(False, xb), N * K // 2, NREPS)


if __name__ == "__main__":
    main()
