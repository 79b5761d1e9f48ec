"""Probe: int4-cache kernel with s4 arrays passed as REAL jit args.

jax 0.9 bug: jit producers emit S4 layouts with
sub_byte_element_size_in_bits=0 while consumers expect 4, so passing an
s4 array into jit loops forever in the layout-reconcile device_put
(_array_shard_arg). Fix: produce the cache with an explicit out Format
carrying sub_byte_element_size_in_bits=4 (queried from a trivial AOT
consumer). This probe validates the fix at 7B shapes and times the
per-64-block partial-scale kernel with:
  A8  — s8 activations (s8 x s8 MXU int dots)
  A16 — bf16 activations (weights converted s4 -> bf16 in-kernel)
across N_T tile sizes. Run: python -m kbench.int4_args_probe
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
NREPS = 8
TRACE_ROOT = "/tmp/tbnb_traces_i4a"
dn = (((1,), (1,)), ((), ()))


def s4_format(shape):
    """The Format consumers expect for an s4 array of `shape` (AOT query)."""
    comp = jax.jit(lambda w: w.astype(jnp.int8)).lower(
        jax.ShapeDtypeStruct(shape, jnp.int4)).compile()
    return comp.input_formats[0][0]


def to_s4(w_i8):
    fmt = s4_format(w_i8.shape)
    return jax.jit(lambda w: w.astype(jnp.int4), out_shardings=fmt)(w_i8)


def _kernel(x_ref, w_ref, s_ref, o_ref, *, a8: bool, bs: int):
    w = w_ref[:].astype(jnp.int8 if a8 else jnp.bfloat16)
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    k = w.shape[1]
    for b in range(k // bs):
        sl = slice(b * bs, (b + 1) * bs)
        p = jax.lax.dot_general(
            x_ref[:, sl], w[:, sl], dn,
            preferred_element_type=jnp.int32 if a8 else jnp.float32)
        acc = acc + p.astype(jnp.float32) * s_ref[b, :][None, :]
    o_ref[:] = acc


def mm(x, w4, s, a8: bool, n_t: int):
    return pl.pallas_call(
        functools.partial(_kernel, a8=a8, bs=BS),
        grid=(N // n_t,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0)),
            pl.BlockSpec((n_t, K), lambda i: (i, 0)),
            pl.BlockSpec((K // BS, n_t), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((M, n_t), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
    )(x, w4, s)


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
    print(f"{name:28s}: {per:8.1f} us/matmul dev  "
          f"{bytes_per_matmul/(per*1e-6)/1e9:6.1f} GB/s packed")


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    ws4 = [to_s4(jnp.asarray(rng.integers(-8, 8, (N, K)), jnp.int8))
           for _ in range(NREPS)]
    s = jnp.asarray(rng.uniform(0.01, 0.03, (K // BS, N)), jnp.float32)
    x8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    xb = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)

    # correctness with real args (first weight)
    out = jax.jit(functools.partial(mm, a8=True, n_t=512))(x8, ws4[0], s)
    w0 = np.asarray(ws4[0].astype(jnp.int8), np.float32)
    ref = sum((np.asarray(x8, np.float32)[:, b*BS:(b+1)*BS]
               @ w0[:, b*BS:(b+1)*BS].T) * np.asarray(s)[b][None, :]
              for b in range(K // BS))
    err = np.abs(np.asarray(out) - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"s4-as-arg kernel rel err: {err:.2e}")

    for a8, x in ((True, x8), (False, xb)):
        for n_t in (512, 1024, 2048):
            @jax.jit
            def chain(x, s, *ws):
                outs = [mm(x, w, s, a8, n_t) for w in ws]
                return sum(o[0, 0] for o in outs), outs[-1]
            profile(f"{'A8' if a8 else 'A16'} n_t={n_t}",
                    lambda: chain(x, s, *ws4), N * K // 2, NREPS)

    # scale-blocksize sweep: BS=64 dots half-fill the MXU's 128-deep pass;
    # coarser quant blocks buy fuller passes at slightly coarser scales
    for bs in (64, 128, 256, 512):
        sb = jnp.asarray(rng.uniform(0.01, 0.03, (K // bs, N)), jnp.float32)

        def mm_bs(x, w4, s, n_t=2048, bs=bs):
            def kern(x_ref, w_ref, s_ref, o_ref):
                _kernel(x_ref, w_ref, s_ref, o_ref, a8=True, bs=bs)
            return pl.pallas_call(
                kern,
                grid=(N // n_t,),
                in_specs=[
                    pl.BlockSpec((M, K), lambda i: (0, 0)),
                    pl.BlockSpec((n_t, K), lambda i: (i, 0)),
                    pl.BlockSpec((K // bs, n_t), lambda i: (0, i)),
                ],
                out_specs=pl.BlockSpec((M, n_t), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            )(x, w4, s)

        @jax.jit
        def chain_bs(x, s, *ws):
            outs = [mm_bs(x, w, s) for w in ws]
            return sum(o[0, 0] for o in outs), outs[-1]
        profile(f"A8 n_t=2048 bs={bs}",
                lambda: chain_bs(x8, sb, *ws4), N * K // 2, NREPS)


if __name__ == "__main__":
    main()
