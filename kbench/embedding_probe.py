"""Embedding4bit gather cost at Gemma-scale vocab (VERDICT r2 Weak #6).

The forward does TWO per-id gathers (packed rows + absmax rows) plus the
unpack/LUT/scale chain (nn/embedding.py:70-86). Per decode step the gather
reads B x (D/2 + nblocks*4) bytes — microscopic next to the weight stream —
but this had never been measured at V=256k. This probe times the whole
fused forward and an fp16-table gather baseline at Gemma shapes.

Run: python -m kbench.embedding_probe   (real TPU)
"""

import numpy as np
import jax
import jax.numpy as jnp

from kbench.probe2 import profile
from tpu_bitsandbytes.nn.embedding import Embedding4bit


def main():
    v, d, b = 256_000, 2048, 64        # Gemma-class vocab, decode batch 64
    rng = np.random.default_rng(0)
    emb = Embedding4bit(v, d)
    emb.weight_packed = jnp.asarray(
        rng.integers(0, 256, (v, d // 2)), jnp.uint8)
    emb.weight_absmax = jnp.asarray(
        rng.uniform(0.005, 0.03, (v, d // 64)), jnp.float32)
    table_bf16 = jnp.asarray(rng.standard_normal((v, d)) * 0.02,
                             jnp.bfloat16)

    ids = [jnp.asarray(rng.integers(0, v, (b,)), jnp.int32)
           for _ in range(32)]
    bytes_per = b * (d // 2 + (d // 64) * 4)

    # tables must be ARGUMENTS: a closed-over device array becomes an HLO
    # constant and blows the remote-compile payload limit at V=256k
    def chain(packed, absmax, idss):
        # fresh module per trace: assigning traced arrays to the outer
        # module would leak tracers past the trace
        e2 = Embedding4bit(v, d)
        e2.weight_packed, e2.weight_absmax = packed, absmax
        emb = e2
        acc = jnp.zeros((b, d), jnp.bfloat16)
        for i in idss:
            # data dependency through the ids (defeats CSE)
            j = (i + (acc[:, 0] != 0).astype(jnp.int32)) % v
            acc = acc + emb.forward(j).astype(jnp.bfloat16)
        return acc

    cf = jax.jit(chain)
    profile(f"Embedding4bit gather V={v} D={d} B={b}",
            lambda: cf(emb.weight_packed, emb.weight_absmax, ids),
            bytes_per, len(ids))

    def chain_ref(table, idss):
        acc = jnp.zeros((b, d), jnp.bfloat16)
        for i in idss:
            j = (i + (acc[:, 0] != 0).astype(jnp.int32)) % v
            acc = acc + jnp.take(table, j, axis=0)
        return acc

    rf = jax.jit(chain_ref)
    profile(f"bf16 table gather  V={v} D={d} B={b}",
            lambda: rf(table_bf16, ids), b * d * 2, len(ids))


if __name__ == "__main__":
    main()
