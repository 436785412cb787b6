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


def order_by_process(devices) -> list:
    """Stable-sort devices into contiguous per-process (per-host) blocks.

    jax.devices() documents process-major ordering, but the mesh layout must not
    silently break if an enumeration interleaves processes — a TP row straddling
    hosts would put Megatron psums on DCN instead of ICI."""
    by_proc: dict = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    return [d for p in sorted(by_proc) for d in by_proc[p]]


def make_multihost_mesh(model_per_host: Optional[int] = None, devices=None,
                        local_device_count: Optional[int] = None) -> Mesh:
    """(data=hosts*spare, model=model_per_host) mesh: TP inside a host (ICI), DP
    across hosts (DCN).

    Devices are grouped by `process_index` before the reshape, so a model row
    (one TP group) never straddles hosts even if the global enumeration
    interleaves processes. `devices`/`local_device_count` exist for tests
    (simulating hosts on the virtual CPU mesh) and default to the live cluster.
    """
    devices = list(devices) if devices is not None else jax.devices()
    local = local_device_count or jax.local_device_count()
    ordered = order_by_process(devices)
    model = model_per_host or local
    assert local % model == 0, "model axis must divide local chip count (stay on ICI)"
    data = len(ordered) // model
    dev_array = np.asarray(ordered).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))
