"""Dynamic Pillar VFE (PillarNet-style PFN).

Reference graph: dsvt-ai-trt.cpp:577-590 — linear(10->96)+BN1d+ReLU,
scatter-max, concat(point, pillar-max) -> linear(192->192)+BN1d+ReLU,
scatter-max -> [pillars, 192].  BN is pre-folded into the linear weights
(weights.prepare_params), so each layer is a single fused matmul+bias+relu.

The two segment reductions run as the Pallas segmented-max scan
(ops/segment_pallas.py) on TPU fast paths: the XLA scatter+gather pair is
latency-bound at ~0.3 ms per op regardless of row width (a bf16 stream
measured 0% faster), while the scan is a bandwidth-bound sweep exploiting
the cell-sorted, per-pillar-capped stream the voxelizer emits.  The XLA
scatter (ops/scatter.py) remains the path for CPU, training (the kernel
defines no VJP) and shapes with no admissible block plan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.common import dot_precision
from ..ops.scatter import scatter_max
from ..ops.voxelize import Pillars


def _dense(x, w, b, precision, out_dt=jnp.float32):
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    y = jnp.einsum("pc,cd->pd", x.astype(dt), w.astype(dt),
                   preferred_element_type=jnp.float32,
                   precision=dot_precision(precision)) + b
    # out_dt experiment ledger: a bf16 STREAM with the scan computed in
    # bf16 LOST (0.94+0.66 vs 0.65+0.48 ms at Waymo — VPU rounds dominate
    # and bf16 buys them nothing); bf16 stream + in-kernel f32 upcast is
    # the round-4 hybrid (halves the matmul-write + scan-read HBM traffic,
    # keeps f32 VPU math).  Monotone rounding commutes with the segment
    # max and every downstream dot casts to bf16 anyway.
    return jnp.maximum(y, 0.0).astype(out_dt)


def vfe_forward(pillars: Pillars, params: dict, max_pillars: int,
                precision: str = "fp32", cap: int = None,
                allow_pallas: bool = True) -> jax.Array:
    """Returns [max_pillars, 192] pillar features (zero on invalid rows).

    cap: the per-pillar point cap (cfg.max_points_per_pillar) — enables the
    Pallas segmented-max path, which needs the static bound on segment
    length.  allow_pallas=False forces the XLA scatter (training: no VJP).
    """
    from ..ops.segment_pallas import segmented_max, plan_available

    N = pillars.point_feats.shape[0]
    pid = pillars.point_pillar
    # bf16 streams need a 16-row-sublane block plan; gate on the one the
    # kernel will actually use
    sub = 16 if precision == "bf16" else 8
    fused = (allow_pallas and cap is not None
             and jax.default_backend() == "tpu"
             and plan_available(N, cap, 192, sub))
    if fused:
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), pid[1:] != pid[:-1]])

    # bf16 streams on the fused fast path: the scan kernel upcasts to f32
    # on load (segment_pallas), so only HBM traffic changes, not the math
    sdt = jnp.bfloat16 if (fused and precision == "bf16") else jnp.float32
    x = _dense(pillars.point_feats, params["l0"]["w"], params["l0"]["b"],
               precision, out_dt=sdt)
    x = jnp.where(pillars.point_valid[:, None], x, jnp.asarray(0, sdt))
    if fused:
        x_max = jnp.where(pillars.point_valid[:, None],
                          segmented_max(x, is_start, cap), 0.0)
    else:
        x_max, _ = scatter_max(x, pid, pillars.point_valid, max_pillars)
    x = jnp.concatenate([x, x_max], axis=-1)
    x = _dense(x, params["l1"]["w"], params["l1"]["b"], precision, out_dt=sdt)
    x = jnp.where(pillars.point_valid[:, None], x, jnp.asarray(0, sdt))
    if fused:
        # per-pillar table = the scan value at each pillar's first row
        # (counts are the capped membership sizes, so starts is their
        # exclusive cumsum); invalid pillars land OOB -> fill 0
        starts = jnp.cumsum(pillars.num_points) - pillars.num_points
        starts = jnp.where(pillars.pillar_valid, starts, N)
        pillar_feats = segmented_max(x, is_start, cap,
                                     starts_only=True).at[starts].get(
            mode="fill", fill_value=0)
    else:
        _, pillar_feats = scatter_max(x, pid, pillars.point_valid,
                                      max_pillars)
    return jnp.where(pillars.pillar_valid[:, None], pillar_feats, 0.0)
