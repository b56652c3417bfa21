"""Sequence-parallel (token-axis) sharding for big-frame inference — the
multi-chip scale-out path SURVEY.md §5.7 prescribes in place of the
reference's half-resolution workaround (reference evaluate.py:211-220,
1126-1130: VIPER/SlowFlow are downscaled 2x because the HW x HW volume
does not fit one GPU).

Design (idiomatic GSPMD + shard_map, not a hand-rolled ring): the model
runs under one jit over an n-device mesh.  The O(U^2) attention/correlation
sites route through the SAME fused Pallas kernels as single-chip serving,
row-sharded via the shard_map wrappers in parallel/sequence_parallel.py
(each shard computes its W8-row block with the block-Toeplitz bias offset;
the conditional-clamp predicate pmax-es across shards).  Everything else —
convs, GRU scan, pyramid pooling, upsampling — is plain jnp under `sp_shard`
constraints: XLA propagates the row sharding and inserts the few small
collectives (layer-norm stats all-reduce, all-gathers where row-sharded
results re-enter replicated convs) over ICI.  Per-chip memory for the
volume and probs tensors drops by n, which is what gates >1080p inputs
(tests/test_sequence_parallel.py::test_sp_big_frame_memory_claim).

Activation with `sequence_parallel(mesh)` is a trace-time context: enter it
around `model.apply` (inside or outside jit).  Sites whose token grid does
not divide the mesh axis (H8 % n != 0) fall back to the sharded XLA
attention path for that trace (sp_kernels_ok in setrans); pad inputs to
H8 % n == 0 — e.g. mod-(8*n) spatial padding — to keep the kernel path.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import NamedTuple, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()


class SPContext(NamedTuple):
    mesh: Mesh
    axis: str


def sp_context() -> Optional[SPContext]:
    return getattr(_state, "ctx", None)


@contextmanager
def sequence_parallel(mesh: Mesh, axis: Optional[str] = None):
    """Enable token-axis sharding constraints for model traces inside.

    axis defaults to the mesh's only axis name (a single-axis mesh); pass it
    explicitly for multi-axis meshes."""
    if axis is None:
        if len(mesh.axis_names) != 1:
            raise ValueError(
                f"sequence_parallel needs an explicit axis for a multi-axis "
                f"mesh {mesh.axis_names}")
        axis = mesh.axis_names[0]
    prev = sp_context()
    _state.ctx = SPContext(mesh, axis)
    try:
        yield
    finally:
        _state.ctx = prev


def sp_shard(x, dim: int):
    """Constrain `x` to be sharded over the sequence mesh axis along `dim`.

    No-op when no sequence_parallel context is active or when the dimension
    does not divide evenly (odd tails fall back to replication rather than
    failing the trace)."""
    ctx = sp_context()
    if ctx is None:
        return x
    n = ctx.mesh.shape[ctx.axis]
    dim = dim % x.ndim  # negative dims count from the end
    if x.shape[dim] % n != 0:
        return x
    spec = [None] * x.ndim
    spec[dim] = ctx.axis
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(ctx.mesh, P(*spec)))


def make_seq_mesh(devices=None, axis: str = "seq") -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), axis_names=(axis,))
