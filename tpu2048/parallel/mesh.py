"""Device-mesh construction and sharding helpers.

The scaling axis of this workload is the environment batch (SURVEY.md §2.8,
§5.7): thousands of boards stepped in lockstep, so the canonical mesh is 1-D
('data',). A 2-D ('data', 'model') mesh is constructible for API completeness —
the models are ≤~500k params, so tensor/pipeline/sequence/expert parallelism
are deliberately N/A (documented in SURVEY.md §2.8); the 'model' axis defaults
to size 1.

Collectives ride ICI within a slice and DCN across slices — both expressed by
the same jitted program; XLA chooses the transport from the mesh's device
assignment.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, model_axis: int = 1,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_axis:
        raise ValueError(f"{n} devices not divisible by model axis {model_axis}")
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """First-axis sharding over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None) -> None:
    """Multi-host bring-up (jax.distributed). No-op when single-process.

    The reference has no distributed layer at all (SURVEY.md §2.8); multi-host
    here is: call this on every host, build the global mesh from
    jax.devices(), and the same jitted train step runs SPMD."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
