"""Microbench: KV decode-write strategies on the real chip.

The r2 profile (kbench/fusion_breakdown) shows the per-layer decode KV
write — an advanced-indexing scatter into [L,B,H,S,D] int8 + [L,B,H,S] f32
scales — costing ~25us per op, 3.0 ms/step at 7B B=8 (21%% of the step).
This probe times candidate formulations, 32 layer-writes chained per jit
call (one decode step's worth), 3 calls per trace.

Run: python -m kbench.kv_write_probe
"""

import functools
import shutil

import jax
import jax.numpy as jnp

from kbench.probe2 import device_time_us

L, B, H, S, D = 32, 8, 32, 512, 128


def quant(x):
    absmax = jnp.clip(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1),
                      min=1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / absmax[..., None])),
                 -127, 127).astype(jnp.int8)
    return q, absmax


def make_state():
    k = jnp.zeros((L, B, H, S, D), jnp.int8)
    ks = jnp.ones((L, B, H, S), jnp.float32)
    new = jax.random.normal(jax.random.PRNGKey(0), (B, 1, H, D), jnp.bfloat16)
    pos = jnp.arange(B, dtype=jnp.int32) * 3 + 100   # ragged per-slot
    return k, ks, new, pos


def v_scatter(k, ks, new, pos):
    """Current production path: advanced-index scatter [B,H,1]."""
    b_idx = jnp.arange(B)[:, None, None]
    h_idx = jnp.arange(H)[None, :, None]
    p = pos[:, None, None]
    for layer in range(L):
        kq, sc = quant(jnp.swapaxes(new, 1, 2))
        k = k.at[layer, b_idx, h_idx, p].set(kq)
        ks = ks.at[layer, b_idx, h_idx, p].set(sc)
        new = new + k[layer, :1, :1, :1, :1].astype(new.dtype) * 1e-30
    return k, ks


def v_dus_loop(k, ks, new, pos):
    """Per-slot dynamic_update_slice, unrolled over B."""
    for layer in range(L):
        kq, sc = quant(jnp.swapaxes(new, 1, 2))   # [B,H,1,D], [B,H,1]
        for b in range(B):
            k = jax.lax.dynamic_update_slice(
                k, kq[b][None, None], (layer, b, 0, pos[b], 0))
            ks = jax.lax.dynamic_update_slice(
                ks, sc[b][None, None], (layer, b, 0, pos[b]))
        new = new + k[layer, :1, :1, :1, :1].astype(new.dtype) * 1e-30
    return k, ks


def v_scatter_kv_stacked(k, ks, new, pos):
    """One scatter for a [2,...] stacked K+V (half the scatter count).
    Emulated here by writing a [B,2H,1,D] block into an [L,B,2H,S,D] buffer
    — same bytes, one op where production does two."""
    k2 = jnp.concatenate([k, k], axis=2)           # [L,B,2H,S,D]
    ks2 = jnp.concatenate([ks, ks], axis=2)
    b_idx = jnp.arange(B)[:, None, None]
    h_idx = jnp.arange(2 * H)[None, :, None]
    p = pos[:, None, None]
    for layer in range(L):
        kq, sc = quant(jnp.swapaxes(new, 1, 2))
        kq2 = jnp.concatenate([kq, kq], axis=1)
        sc2 = jnp.concatenate([sc, sc], axis=1)
        k2 = k2.at[layer, b_idx, h_idx, p].set(kq2)
        ks2 = ks2.at[layer, b_idx, h_idx, p].set(sc2)
        new = new + k2[layer, :1, :1, :1, :1].astype(new.dtype) * 1e-30
    return k2, ks2


def v_staging(k, ks, new, pos):
    """Chunk staging: uniform-index DUS into a small [L,B,H,16,D] side
    buffer (what a staged decode chunk would do each step)."""
    stage = jnp.zeros((L, B, H, 16, D), jnp.int8)
    stage_s = jnp.zeros((L, B, H, 16), jnp.float32)
    step = pos[0] % 16                              # traced uniform index
    for layer in range(L):
        kq, sc = quant(jnp.swapaxes(new, 1, 2))
        stage = jax.lax.dynamic_update_slice(
            stage, kq[None], (layer, 0, 0, step, 0))
        stage_s = jax.lax.dynamic_update_slice(
            stage_s, sc[None], (layer, 0, 0, step))
        new = new + stage[layer, :1, :1, :1, :1].astype(new.dtype) * 1e-30
    return stage, stage_s


def v_scatter_flat_pos(k, ks, new, pos):
    """Scatter with indices only on (B,) and full-H rows: index depth 2
    ([layer, b] -> [H,1,D] block at dynamic pos via one-hot... skipped)."""
    raise NotImplementedError


def v_flush(k, ks, new, pos):
    """Chunk-end flush: ONE all-layer scatter of staged [L,B,H,C,D] codes
    into the [L,B,H,S,D] cache at per-slot ragged positions (C=16).
    Per-chunk cost; divide by 16 for the per-step share."""
    C = 16
    st = jnp.zeros((L, B, H, C, D), jnp.int8) + new[0, 0, 0, 0].astype(jnp.int8)
    st_s = jnp.ones((L, B, H, C), jnp.float32)
    l_idx = jnp.arange(L)[:, None, None, None]
    b_idx = jnp.arange(B)[None, :, None, None]
    h_idx = jnp.arange(H)[None, None, :, None]
    p = (pos[:, None] + jnp.arange(C)[None, :])[None, :, None, :]
    k = k.at[l_idx, b_idx, h_idx, p].set(st)
    ks = ks.at[l_idx, b_idx, h_idx, p].set(st_s)
    return k, ks


def v_flush_dus(k, ks, new, pos):
    """Chunk-end flush via per-slot DUS: one [L,1,H,C,D] slab per slot."""
    C = 16
    st = jnp.zeros((L, B, H, C, D), jnp.int8) + new[0, 0, 0, 0].astype(jnp.int8)
    st_s = jnp.ones((L, B, H, C), jnp.float32)
    for b in range(B):
        k = jax.lax.dynamic_update_slice(
            k, st[:, b:b + 1], (0, b, 0, pos[b], 0))
        ks = jax.lax.dynamic_update_slice(
            ks, st_s[:, b:b + 1], (0, b, 0, pos[b]))
    return k, ks


def v_flush_scatter_per_layer(k, ks, new, pos):
    """Chunk-end flush via per-layer scatter (ring-mode compatible:
    per-entry indices can be sent out-of-bounds to drop invalid tails)."""
    C = 16
    st = jnp.zeros((L, B, H, C, D), jnp.int8) + new[0, 0, 0, 0].astype(jnp.int8)
    st_s = jnp.ones((L, B, H, C), jnp.float32)
    b_idx = jnp.arange(B)[:, None, None]
    h_idx = jnp.arange(H)[None, :, None]
    p = (pos[:, None] + jnp.arange(C)[None, :])[:, None, :]
    for li in range(L):
        k = k.at[li, b_idx, h_idx, p].set(st[li])
        ks = ks.at[li, b_idx, h_idx, p].set(st_s[li])
    return k, ks


def run(name, fn):
    k, ks, new, pos = make_state()
    f = jax.jit(fn)
    out = f(k, ks, new, pos)
    jax.block_until_ready(out)
    log = f"/tmp/tbnb_kvw_{name}"
    shutil.rmtree(log, ignore_errors=True)
    with jax.profiler.trace(log):
        for _ in range(3):
            out = f(k, ks, new, pos)
        jax.block_until_ready(out)
    total, _ = device_time_us(log)
    # L layer-writes per call, 3 calls; report per-step (all L layers)
    print(f"{name:24s} {total/3/1e3:8.3f} ms/step-equivalent")


if __name__ == "__main__":
    run("scatter (prod)", v_scatter)
    run("dus_loop", v_dus_loop)
    run("scatter_kv_stacked", v_scatter_kv_stacked)
    run("staging_dus", v_staging)
