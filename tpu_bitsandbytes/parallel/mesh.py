"""Device-mesh helpers for multi-chip scale-out (ICI/DCN)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(tp: int = 1, dp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh. tp should map to the fastest (ICI) axis —
    mesh axes are laid out so tp is innermost/contiguous."""
    devices = list(devices if devices is not None else jax.devices())
    need = tp * dp
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
