"""Dynamic Pillar VFE (PillarNet-style PFN).

Reference graph: dsvt-ai-trt.cpp:577-590 — linear(10->96)+BN1d+ReLU,
scatter-max, concat(point, pillar-max) -> linear(192->192)+BN1d+ReLU,
scatter-max -> [pillars, 192].  BN is pre-folded into the linear weights
(weights.prepare_params), so each layer is a single fused matmul+bias+relu.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.common import dot_precision
from ..ops.scatter import scatter_max
from ..ops.voxelize import Pillars


def _dense(x, w, b, precision):
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    y = jnp.einsum("pc,cd->pd", x.astype(dt), w.astype(dt),
                   preferred_element_type=jnp.float32,
                   precision=dot_precision(precision)) + b
    return jnp.maximum(y, 0.0)


def vfe_forward(pillars: Pillars, params: dict, max_pillars: int,
                precision: str = "fp32") -> jax.Array:
    """Returns [max_pillars, 192] pillar features (zero on invalid rows)."""
    x = _dense(pillars.point_feats, params["l0"]["w"], params["l0"]["b"], precision)
    x = jnp.where(pillars.point_valid[:, None], x, 0.0)
    x_max, _ = scatter_max(x, pillars.point_pillar, pillars.point_valid, max_pillars)
    x = jnp.concatenate([x, x_max], axis=-1)
    x = _dense(x, params["l1"]["w"], params["l1"]["b"], precision)
    x = jnp.where(pillars.point_valid[:, None], x, 0.0)
    _, pillar_feats = scatter_max(x, pillars.point_pillar, pillars.point_valid,
                                  max_pillars)
    return jnp.where(pillars.pillar_valid[:, None], pillar_feats, 0.0)
