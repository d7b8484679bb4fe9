"""Device mesh construction and batch sharding.

The reference spawns one process per GPU and hand-rolls NCCL collectives
(``train_mi_multimodal.py:102-109``, SURVEY §2.9).  TPU-native: a single
controller builds a 1-D ``jax.sharding.Mesh`` over all chips; the train
step is ``shard_map``-compiled over the ``data`` axis and XLA schedules
the psums over ICI.  Multi-host runs only additionally call
``jax.distributed.initialize()`` before mesh creation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays, leading dim = global batch)
    onto the mesh, sharded along the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
