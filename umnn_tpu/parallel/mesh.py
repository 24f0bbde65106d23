"""Device mesh and sharding helpers — the distributed backend.

The reference has no distributed code at all (SURVEY.md §2f P5/P6); this
module is the new TPU-native surface. Design (scaling-book recipe):

* one global ``Mesh`` over all addressable devices, default 1-D ``("data",)``
  — UMNN models are small (<= a few M params), so parameters are replicated
  and only the batch / Monte-Carlo-particle axis is sharded;
* shardings are expressed as ``NamedSharding`` constraints on the jitted
  train/eval steps — XLA inserts the gradient ``psum`` (all-reduce over ICI
  within a slice, DCN across slices) automatically;
* multi-host entry is a thin wrapper over ``jax.distributed.initialize``
  plus per-host batch feeding via ``make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "data_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "host_local_batch_to_global",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the multi-host runtime (no-op on a single process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly only for manual bring-up.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def data_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis_name: str = "data"
) -> Mesh:
    """1-D mesh over all (or the given) devices; batch-parallel layout."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (batch or MC-particle axis) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a (host-global) batch with axis 0 sharded across the mesh."""
    sh = batch_sharded(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def host_local_batch_to_global(batch, mesh: Mesh, axis_name: str = "data"):
    """Assemble per-host shards into one global array (multi-host feeding)."""
    sh = batch_sharded(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
    )
