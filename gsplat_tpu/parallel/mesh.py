"""Device-mesh helpers.

The reference is strictly single-GPU (no torch.distributed/NCCL anywhere —
SURVEY.md §2); multi-chip is therefore a new capability designed the TPU way:
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives over ICI, instead
of a communication backend bolted onto the side.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def make_mesh(axis_sizes: dict | None = None, devices=None) -> Mesh:
    """Create a mesh, e.g. make_mesh({"data": 2, "sp": 4}).

    With no sizes, all devices go on one "data" axis.
    """
    devices = devices if devices is not None else jax.devices()
    if not axis_sizes:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes[n] for n in names)
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(arr, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
