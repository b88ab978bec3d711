"""Segment scatter/gather primitives for the pillar layout.

Replaces TorchScatterMaxPlugin (plugins/src/torchScatterMax.cu:201-259 — a
serial per-pillar loop over a 200-float local buffer) with XLA segment
reductions that scatter the whole [points, C] block at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_max(point_feats: jax.Array, point_pillar: jax.Array,
                point_valid: jax.Array, num_pillars: int):
    """Channelwise max over each pillar's points, plus per-point broadcast.

    point_feats: [P1, C]; point_pillar: [P1] (== num_pillars for invalid).
    Returns (max_point_feats [P1, C], max_pillar_feats [num_pillars, C]).
    Empty pillars and invalid rows produce zeros (the reference zero-memsets
    its outputs each call, torchScatterMax.cu enqueue).

    PRECONDITION: ``point_pillar`` must be nondecreasing (invalid rows carry
    the sentinel ``num_pillars``, which sorts last).  ops/voxelize emits
    exactly this layout — points cell-sorted with invalid rows at the tail —
    and both the scatter-max and the gather below pass
    ``indices_are_sorted=True`` on the strength of it; an unsorted caller
    would silently compute wrong pillar maxima on TPU.
    """
    if __debug__ and point_pillar.shape[0] and not isinstance(
            point_pillar, jax.core.Tracer):
        assert bool(jnp.all(point_pillar[1:] >= point_pillar[:-1])), \
            "scatter_max requires nondecreasing point_pillar"
    neg = jnp.float32(-1.0e6)  # reference init value (torchScatterMax.cu:214)
    guarded = jnp.where(point_valid[:, None], point_feats, neg)
    pillar_max = jnp.full((num_pillars + 1, point_feats.shape[1]), neg,
                          point_feats.dtype)
    # point_pillar is nondecreasing by construction (points arrive sorted
    # by cell from ops/voxelize) — the hint lets XLA skip conflict handling
    pillar_max = pillar_max.at[point_pillar].max(guarded, mode="drop",
                                                 indices_are_sorted=True)
    written = pillar_max > neg
    pillar_max = jnp.where(written, pillar_max, 0.0)
    point_max = jnp.where(
        point_valid[:, None],
        pillar_max.at[point_pillar].get(indices_are_sorted=True), 0.0)
    return point_max, pillar_max[:num_pillars]
