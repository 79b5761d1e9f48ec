"""Multi-host (pod-slice) initialization and mesh construction.

The reference is single-process/single-device (SURVEY §2.3); this module is
the DCN-side entry for N≥2-host deployments (BASELINE config 5). Call
:func:`initialize` once per host process before any jax computation; then
:func:`make_pod_mesh` builds a (dp, tp) mesh where tp maps to the intra-host
ICI ring and dp spans hosts over DCN — the layout that keeps the per-layer
psums of the TP decode step on ICI and only batch-gradient/data traffic on
DCN.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper (no-op on single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def make_pod_mesh(tp: Optional[int] = None, dp: Optional[int] = None) -> Mesh:
    """(dp, tp) mesh over all global devices.

    Default: tp = devices-per-host (ICI domain), dp = number of hosts — so
    tensor-parallel collectives ride ICI and data parallelism rides DCN.
    """
    devices = jax.devices()
    n = len(devices)
    local = jax.local_device_count()
    if tp is None:
        tp = local
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != device count {n}")
    # order devices host-major so each tp group is intra-host
    arr = np.asarray(sorted(devices, key=lambda d: (d.process_index, d.id)))
    return Mesh(arr.reshape(dp, tp), ("dp", "tp"))
