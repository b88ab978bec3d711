"""Spatial sharding of one frame across chips (BASELINE config 5 stretch).

DSVT attention never crosses windows, so the set axis is embarrassingly
parallel (SURVEY §2.3/§5): shard the [S, K, C] set tensors and the [P, C]
pillar tensors across an 'sp' mesh axis, and let GSPMD insert the
all-gathers where a set's gather reads pillars owned by another shard.
The dense BEV stages re-replicate at map2bev (one [P, C] all-gather).

Usage:
    mesh = Mesh(devices, ("sp",))
    with spatial_sharding(mesh):
        dets = jax.jit(forward_fn)(params, points, num_points)

Without the context every constraint is a no-op, so the model code stays
single-device clean.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_STATE = threading.local()


def _current() -> Optional[tuple]:
    return getattr(_STATE, "mesh_axis", None)


@contextlib.contextmanager
def spatial_sharding(mesh: Mesh, axis: str = "sp"):
    prev = _current()
    _STATE.mesh_axis = (mesh, axis)
    try:
        yield
    finally:
        _STATE.mesh_axis = prev


def constrain_rows(x: jax.Array) -> jax.Array:
    """Shard the leading (pillar or set) axis over the spatial mesh axis."""
    state = _current()
    if state is None:
        return x
    mesh, axis = state
    spec = (axis,) + (None,) * (x.ndim - 1)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def constrain_bev(x: jax.Array) -> jax.Array:
    """Shard a dense BEV map's row axis over the spatial mesh axis.

    Applied to the [H, W, C] canvas from map2bev through the 2D backbone and
    CenterHead, this keeps the dominant dense-FLOP stages partitioned across
    chips instead of re-replicating at map2bev (VERDICT r1 item 2).  XLA's
    SPMD partitioner materializes the halo exchanges the 3x3 convolutions
    need at every shard boundary (and the uneven-row padding for the
    468->234->117 stride chain) from these annotations alone — the idiomatic
    TPU form of the halo plan in SURVEY §2.3, with no hand-written
    collectives to keep correct."""
    return constrain_rows(x)


def replicate(x: jax.Array) -> jax.Array:
    state = _current()
    if state is None:
        return x
    mesh, _axis = state
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))
