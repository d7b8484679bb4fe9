"""Device mesh construction and batch sharding.

The reference spawns one process per GPU and hand-rolls NCCL collectives
(``train_mi_multimodal.py:27-49,102-109``, SURVEY §2.9).  TPU-native: a
single controller per host builds a 1-D ``jax.sharding.Mesh`` over all
chips; the train step is ``shard_map``-compiled over the ``data`` axis
and XLA schedules the psums over ICI.  Multi-host runs call
:func:`initialize_distributed` before any other JAX use; each host then
feeds only its process-local batch shard through :func:`shard_batch`
(``jax.make_array_from_process_local_data``).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(force: bool = False) -> bool:
    """Start the JAX distributed runtime when a multi-process launch is
    indicated by the environment.  Must run before any other JAX call
    (backend init pins the topology).  Returns True if initialized.

    Recognised launches (the TPU-native replacement for the reference's
    per-GPU ``torch.multiprocessing.spawn`` + process-group init,
    ``train_mi_multimodal.py:27-49``):

    * explicit: ``JAX_COORDINATOR_ADDRESS`` + ``JAX_NUM_PROCESSES`` +
      ``JAX_PROCESS_ID`` (any launcher: SLURM wrapper, mpirun, manual);
    * TPU pod: ``MEGASCALE_COORDINATOR_ADDRESS`` or a well-formed
      ``TPU_WORKER_HOSTNAMES`` — auto-detected by
      ``jax.distributed.initialize()`` with no arguments.
    """
    env = os.environ
    addr = env.get("JAX_COORDINATOR_ADDRESS") or env.get("COORDINATOR_ADDRESS")
    nproc = env.get("JAX_NUM_PROCESSES") or env.get("NUM_PROCESSES")
    pid = env.get("JAX_PROCESS_ID") or env.get("PROCESS_ID")
    if addr and nproc is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=int(nproc),
            process_id=int(pid))
        return True
    hostnames = env.get("TPU_WORKER_HOSTNAMES", "")
    pod_auto = env.get("MEGASCALE_COORDINATOR_ADDRESS") or (
        hostnames and "," in hostnames and " " not in hostnames)
    if force or pod_auto:
        jax.distributed.initialize()
        return True
    return False


def create_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays) onto the mesh, sharded along
    the data axis.

    Single-process: ``batch`` holds the *global* batch and is device_put
    across the mesh.  Multi-process: each host passes only its
    *process-local* shard (global_batch / process_count rows — the loader
    already strides by ``jax.process_index()``) and the global array is
    assembled without cross-host transfers
    (``jax.make_array_from_process_local_data``)."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
