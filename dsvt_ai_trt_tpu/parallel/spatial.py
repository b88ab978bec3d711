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


def replicate(x: jax.Array) -> jax.Array:
    state = _current()
    if state is None:
        return x
    mesh, _axis = state
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))
