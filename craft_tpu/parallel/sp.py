"""Sequence-parallel (token-axis) sharding for big-frame inference — the
multi-chip scale-out path SURVEY.md §5.7 prescribes in place of the
reference's half-resolution workaround (reference evaluate.py:211-220,
1126-1130: VIPER/SlowFlow are downscaled 2x because the HW x HW volume
does not fit one GPU).

Design (idiomatic GSPMD, not a hand-rolled ring): the model runs under one
jit over an n-device mesh; `sp_shard` places sharding constraints on every
O(U^2) tensor — attention scores/probs, the correlation volume, and the
pyramid levels — sharding the QUERY-token (row) axis.  XLA propagates the
sharding through softmax / global layer-norm / pooling / windowed lookup
(each query row owns its own window) and inserts the few small collectives
(the layer-norm stats all-reduce, the all-gathers where row-sharded results
re-enter replicated convs) over ICI.  Per-chip memory for the volume and
score tensors drops by n, which is what gates >1080p inputs.

Activation with `sequence_parallel(mesh)` is a trace-time context: enter it
around `model.apply` (inside or outside jit).  Pallas fast paths are
disabled under it (custom calls are opaque to GSPMD's partitioner) — the
XLA attention path is used, sharded.
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
def sequence_parallel(mesh: Mesh, axis: str = "seq"):
    """Enable token-axis sharding constraints for model traces inside."""
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
