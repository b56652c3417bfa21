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
    """Device-put a host batch pytree with the batch axis sharded.

    Multi-process: each process passes its LOCAL batch (the per-process
    loader shard, reference train_ddp per-rank batch semantics) and the
    result is the GLOBAL array — global batch = local batch x process_count,
    assembled via make_array_from_process_local_data."""
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        def put(x):
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(s, np.asarray(x),
                                                          global_shape)
        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate_state(mesh: Mesh, state):
    r = replicated(mesh)
    if jax.process_count() > 1:
        # Params are identical on every process (same seed init or the same
        # restored checkpoint); replicate across the global mesh.
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                r, np.asarray(x), np.shape(x)), state)
    return jax.tree.map(lambda x: jax.device_put(x, r), state)


def initialize_distributed():
    """Multi-host init (reference train_ddp.py:186-188 analog: env://
    rendezvous via COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID).

    On a multi-host TPU slice, call before any jax op.  Safe no-op when
    single-process.  On CPU (the simulated-multi-host test path) the gloo
    collectives backend is selected, the CPU analog of NCCL.
    """
    import os
    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = int(os.environ.get("NUM_PROCESSES", "1"))
    if not coord and nproc <= 1:
        return
    # Must be set before the first backend touch (so no jax.default_backend()
    # probe here); only affects the CPU backend, harmless on TPU.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    kwargs = {}
    if coord:
        kwargs = dict(coordinator_address=coord,
                      num_processes=nproc,
                      process_id=int(os.environ.get("PROCESS_ID", "0")))
    jax.distributed.initialize(**kwargs)
