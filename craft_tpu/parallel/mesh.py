"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's DataParallel / NCCL-DDP stack (reference train.py:179-183,
train_ddp.py:186-200; SURVEY.md §2.7, §5.8).

The reference is data-parallel only (6.3 M params — replicate them).  We build a
1-D 'data' mesh over all chips (ICI within a slice, DCN across), shard the batch
on it, replicate params, and let XLA insert the gradient all-reduce inside the
jitted train step — DDP's implicit ring-allreduce, done by the compiler.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with the batch axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate_state(mesh: Mesh, state):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), state)


def initialize_distributed():
    """Multi-host init (reference train_ddp.py:186-188 analog).

    On a multi-host TPU slice, call before any jax op.  Safe no-op when
    single-process.
    """
    import os
    if os.environ.get("COORDINATOR_ADDRESS") or int(
            os.environ.get("NUM_PROCESSES", "1")) > 1:
        jax.distributed.initialize()
