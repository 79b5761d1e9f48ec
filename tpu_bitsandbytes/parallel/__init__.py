"""Multi-chip parallelism: meshes, sharding rules, TP decode, QLoRA training."""

from .mesh import make_mesh, replicated, shard
from .sharding import (
    llama_param_specs, shard_params, kv_cache_spec, spec_tree,
)
from .tp import (
    make_tp_decode_step, make_tp_decode_chunk, make_tp_prefill_step,
    make_tp_prefill_chunk, make_tp_final_logits,
)
from .train import make_qlora_train_step
from .distributed import initialize, make_pod_mesh

__all__ = [
    "make_mesh", "replicated", "shard",
    "llama_param_specs", "shard_params", "kv_cache_spec", "spec_tree",
    "make_tp_decode_step", "make_tp_decode_chunk", "make_tp_prefill_step",
    "make_tp_prefill_chunk", "make_tp_final_logits",
    "make_qlora_train_step", "initialize", "make_pod_mesh",
]
