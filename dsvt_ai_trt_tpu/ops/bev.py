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
    """pillar_feats: [P, C]; coords: [P, 2] (iy, ix).  Returns [H, W, C]."""
    H, W = grid_hw
    C = pillar_feats.shape[-1]
    iy = jnp.where(pillar_valid, coords[:, 0], H)  # out of bounds -> dropped
    ix = jnp.where(pillar_valid, coords[:, 1], W)
    canvas = jnp.zeros((H, W, C), pillar_feats.dtype)
    return canvas.at[iy, ix].set(pillar_feats, mode="drop")
