"""Device mesh helpers and distributed initialization.

The reference has NO distributed layer (SURVEY.md §2.6 — verified absent);
this subsystem is new, per BASELINE.json's north star: scale sparse/dense
kernels over a TPU pod slice via jax.sharding meshes, ICI collectives for
halo exchange, DCN-aware two-level meshes for multi-slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap for multi-host runs; no-op single-host."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(axis_shapes: Sequence[Tuple[str, int]] = None,
              devices=None) -> Mesh:
    """Build a Mesh from (axis_name, size) pairs; defaults to 1-D "x" over
    all devices. Axis order should put the fastest-varying (ICI-adjacent)
    axis last so rings ride ICI, not DCN."""
    if devices is None:
        devices = jax.devices()
    if axis_shapes is None:
        axis_shapes = [("x", len(devices))]
    names = [a for a, _ in axis_shapes]
    sizes = [s for _, s in axis_shapes]
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh wants {total} devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(arr, axis_names=names)


def shard(x, mesh: Mesh, spec: P):
    """Place an array with a NamedSharding."""
    return jax.device_put(x, NamedSharding(mesh, spec))
