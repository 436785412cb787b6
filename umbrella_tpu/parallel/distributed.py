"""Multi-host bring-up helpers.

The reference is strictly single-process/single-GPU (SURVEY.md §2 parallelism
inventory). For pod slices: `jax.distributed.initialize` connects hosts over DCN;
`make_multihost_mesh` lays out a (data=hosts, model=local_chips) mesh so tensor
parallelism rides ICI within a host and data parallelism rides DCN across hosts —
the layout BASELINE.json's north star prescribes.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Connect this host to the jax.distributed cluster (no-op if single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def make_multihost_mesh(model_per_host: Optional[int] = None) -> Mesh:
    """(data=hosts*spare, model=model_per_host) mesh: TP inside a host (ICI), DP
    across hosts (DCN)."""
    devices = jax.devices()
    local = jax.local_device_count()
    model = model_per_host or local
    assert local % model == 0, "model axis must divide local chip count (stay on ICI)"
    data = len(devices) // model
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))
