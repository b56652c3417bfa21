"""Sequence-parallel attention-correlation: the multi-chip scale-out path for
large inputs (SURVEY.md §5.7 — absent in the reference, which copes with the
HW x HW volume via half-resolution inference; here the token axis is sharded
over the mesh so a >1080p frame's volume never lives on one chip).

Layout: queries (and the volume's row axis) are sharded over the mesh axis;
keys/values are replicated (a few MB at 1/8 resolution — far cheaper than a
ring for these sizes, and XLA turns the replication into one all-gather over
ICI).  Each device computes its row-block of the correlation volume or
attention output with the same fused kernels used on one chip.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.5 stable API
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def sp_fused_agg_corr(mesh: Mesh, q, k, bias, clip_val, pos_w, agg_w, agg_b,
                      axis: str = "data", interpret: bool = False):
    """Row-sharded CRAFT correlation volume.

    q: [M, U1, md] (U1 divisible by mesh axis size), k: [M, U2, md],
    bias: [U1, U2] or None.  Returns [U1, U2] sharded on rows.
    """
    from craft_tpu.ops.pallas.mode_attention import fused_agg_corr

    has_bias = bias is not None
    in_specs = (P(None, axis, None), P(None, None, None))
    if has_bias:
        in_specs = in_specs + (P(axis, None),)

    def local(q_l, k_full, *maybe_bias):
        b_l = maybe_bias[0] if maybe_bias else None
        return fused_agg_corr(q_l, k_full, b_l, clip_val, pos_w, agg_w,
                              agg_b, interpret=interpret)

    fn = shard_map(local, mesh=mesh, in_specs=in_specs,
                   out_specs=P(axis, None), check_vma=False)
    args = (q, k) + ((bias,) if has_bias else ())
    return fn(*args)


def sp_flash_mode_attention(mesh: Mesh, q, k, v, bias, clip_val, pos_w,
                            axis: str = "data", interpret: bool = False):
    """Row-sharded flash multi-mode attention: out [M, U1, F] sharded on U1."""
    from craft_tpu.ops.pallas.mode_attention import flash_mode_attention

    has_bias = bias is not None
    in_specs = (P(None, axis, None), P(None, None, None),
                P(None, None, None))
    if has_bias:
        in_specs = in_specs + (P(axis, None),)

    def local(q_l, k_full, v_full, *maybe_bias):
        b_l = maybe_bias[0] if maybe_bias else None
        return flash_mode_attention(q_l, k_full, v_full, b_l, clip_val,
                                    pos_w, interpret=interpret)

    fn = shard_map(local, mesh=mesh, in_specs=in_specs,
                   out_specs=P(None, axis, None), check_vma=False)
    args = (q, k, v) + ((bias,) if has_bias else ())
    return fn(*args)
