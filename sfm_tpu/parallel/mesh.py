"""Device mesh construction and sharding helpers.

The reference has no distributed layer (SURVEY.md §2: single-process OpenCL).
This is the TPU-native communication substrate: meshes over ICI/DCN,
NamedSharding helpers, and multi-process initialization — the slot the
OpenCL::Container device-discovery layer (opencl_wrapper.cpp:59-104) occupies
in the reference, generalized to N chips.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict[str, int] | None = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh from {axis_name: size}; -1 means "all remaining devices".

    Default: 1-D mesh over all devices on axis "data".
    """
    devices = list(devices if devices is not None else jax.devices())
    if not axis_sizes:
        axis_sizes = {"data": len(devices)}
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    n = len(devices)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total > n:
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} "
                         f"devices, have {n}")
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def shard(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host process setup (jax.distributed).

    With an explicit coordinator address this MUST succeed — failures
    (wrong address, process count mismatch, double init) propagate so a
    misconfigured launch can't silently degrade to single-process. Without
    one, auto-detection is attempted and a plain single-process environment
    (nothing to detect) is a silent no-op.
    """
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # single-process: no cluster env to auto-detect
