"""Sharded QLoRA training step (BASELINE config 5).

Frozen 4-bit base weights (tp-sharded) + trainable LoRA adapters; gradients
flow only to LoRA A/B, which the 8-bit Adam transform updates. The step jits
over the (dp, tp) mesh with GSPMD sharding annotations — batch over dp,
packed weights over tp; XLA inserts the all-reduces.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import llama
from ..models.lora import lora_trainable, merge_lora_trainable
from ..optim import transforms


def make_qlora_train_step(config: llama.LlamaConfig, tx=None,
                          remat: bool = False):
    """Returns (init_opt_state, train_step).

    ``train_step(trainable, opt_state, frozen_params, tokens)`` →
    (new_trainable, new_opt_state, loss). ``frozen_params`` is the LoRA-
    attached (quantized) param tree; ``trainable`` the extracted A/B tree.

    ``remat``: per-layer ``jax.checkpoint`` in the forward — activation
    memory drops from O(layers) to O(1) layers at ~1 extra forward of
    FLOPs, the enabler for long-sequence QLoRA at 7B scale.
    """
    tx = tx or transforms.adam8bit(1e-4)

    def loss_fn(trainable, frozen_params, tokens):
        params = merge_lora_trainable(frozen_params, trainable)
        logits = llama.forward(params, tokens[:, :-1], config, remat=remat)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    @partial(jax.jit, donate_argnums=(1,))
    def train_step(trainable, opt_state, frozen_params, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, frozen_params,
                                                  tokens)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    return tx.init, train_step
