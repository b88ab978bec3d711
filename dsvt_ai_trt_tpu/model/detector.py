"""End-to-end DSVT detector: points -> boxes, one XLA program.

The reference's inference path (src/dsvt-ai-trt.cpp:1884-1975) crosses the
host/device boundary twice per frame plus a host NMS; here the entire
pipeline — voxelize, PFN, window/set partition, 4 DSVT blocks, BEV scatter,
2D ResNet, CenterHead, decode, score filter, and (optionally) rotated NMS —
is a single jitted function with zero host sync until the final
[top_k, 9] + count readback.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..config import DSVTConfig
from ..ops.voxelize import voxelize
from ..ops.windows import window_partition, set_partition
from ..ops.bev import map_to_bev
from ..ops.postprocess import decode_and_filter, Detections
from ..ops import nms as nms_ops
from ..parallel.spatial import constrain_bev
from .vfe import vfe_forward
from .backbone3d import backbone3d_forward
from .backbone2d import backbone2d_forward
from .head import head_forward


def forward(params: Dict, points: jax.Array, num_points: jax.Array,
            cfg: DSVTConfig, with_nms: bool = False) -> Detections:
    """points: [max_points, 4]; num_points: [] int32."""
    precision = cfg.precision
    pillars = voxelize(points, num_points, cfg)
    feats = vfe_forward(pillars, params["vfe"], cfg.max_pillars, precision,
                        cap=cfg.max_points_per_pillar if cfg.use_pallas else None)

    wparts, sparts = [], []
    for spec in cfg.window_specs:
        wp = window_partition(pillars.coords, pillars.pillar_valid, spec, cfg)
        sp = set_partition(wp, pillars.pillar_valid, spec, cfg)
        wparts.append(wp)
        sparts.append(sp)

    feats = backbone3d_forward(feats, wparts, sparts, params, cfg, precision)

    if precision == "bf16":
        feats = feats.astype(jnp.bfloat16)
    # under spatial sharding the canvas is row-sharded from the scatter on:
    # the dense conv stack (the FLOP-dominant stage at Waymo density) runs
    # partitioned with GSPMD-inserted halo exchanges (parallel/spatial.py)
    bev = constrain_bev(map_to_bev(feats, pillars.coords, pillars.pillar_valid,
                                   (cfg.grid_size[1], cfg.grid_size[0])))
    bev = backbone2d_forward(bev, params["backbone2d"], precision)
    # lazy head: full-map convs only for the heatmap; regression branches
    # evaluate at the top-k cells inside decode (model/head.py docstring)
    head_out = head_forward(bev, params["head"], precision, lazy=True)
    dets = decode_and_filter(head_out, cfg, head_params=params["head"])
    if with_nms:
        boxes, count = nms_ops.nms(
            dets.boxes, dets.count, cfg.nms_threshold,
            use_pallas=None if cfg.use_pallas else False)
        dets = Detections(boxes=boxes, count=count)
    # measured occupancy vs the static caps, riding along in the output so
    # the runtime can flag silent truncation on denser-than-calibration
    # frames (runtime/infer.py); order matches Detections docstring
    occupancy = jnp.stack(
        [pillars.point_count, pillars.pillar_count]
        + [sp.set_count for sp in sparts]).astype(jnp.int32)
    return dets._replace(occupancy=occupancy)


@functools.partial(jax.jit, static_argnames=("cfg", "with_nms"))
def forward_jit(params, points, num_points, cfg: DSVTConfig,
                with_nms: bool = False) -> Detections:
    return forward(params, points, num_points, cfg, with_nms)


def forward_batch(params, points: jax.Array, num_points: jax.Array,
                  cfg: DSVTConfig, with_nms: bool = False) -> Detections:
    """Data-parallel batched forward: points [B, N, 4], num_points [B].

    vmap exists for MULTI-CHIP data parallelism (parallel/mesh.py), where
    each chip's slice is batch 1.  For single-chip throughput batching use
    forward_scan — vmap lowers every sparse gather/scatter/sort to a
    batched variant costing 2-5x (round-2 trace: dsvt_blocks 19.4 vs
    7.4 ms/frame, BEV scatter 5.3 vs 1.1), while the dense convs gain
    nothing because one frame already fills the chip.
    """
    return jax.vmap(lambda p, n: forward(params, p, n, cfg, with_nms))(
        points, num_points)


def forward_scan(params, points: jax.Array, num_points: jax.Array,
                 cfg: DSVTConfig, with_nms: bool = False) -> Detections:
    """Single-chip throughput batching: ONE dispatch, frames processed
    sequentially by lax.scan — amortizes per-call dispatch (the point of
    batching on a tunneled runtime) without vmap's batched-sparse-op tax.
    points: [B, N, 4], num_points: [B]; returns stacked Detections."""
    def step(carry, pn):
        p, n = pn
        return carry, forward(params, p, n, cfg, with_nms)
    _, dets = jax.lax.scan(step, 0, (points, num_points))
    return dets


class IntermediateOutputs(NamedTuple):
    pillars: object
    pillar_feats: jax.Array
    dsvt_feats: jax.Array
    bev_features: jax.Array
    head_out: Dict[str, jax.Array]


def forward_debug(params, points, num_points, cfg: DSVTConfig) -> IntermediateOutputs:
    """Per-stage outputs for parity debugging (the reference's analogue is
    commented-out cnpy .npy dumps, cpp:1943-1949)."""
    precision = cfg.precision
    pillars = voxelize(points, num_points, cfg)
    pfeats = vfe_forward(pillars, params["vfe"], cfg.max_pillars, precision,
                         allow_pallas=False)
    wparts, sparts = [], []
    for spec in cfg.window_specs:
        wp = window_partition(pillars.coords, pillars.pillar_valid, spec, cfg)
        sparts.append(set_partition(wp, pillars.pillar_valid, spec, cfg))
        wparts.append(wp)
    # allow_pallas=False: forward_debug feeds the training loss through
    # jax.grad, and the fused epilogue kernel defines no VJP
    dfeats = backbone3d_forward(pfeats, wparts, sparts, params, cfg, precision,
                                allow_pallas=False)
    bev = map_to_bev(dfeats, pillars.coords, pillars.pillar_valid,
                     (cfg.grid_size[1], cfg.grid_size[0]))
    bev2 = backbone2d_forward(bev, params["backbone2d"], precision)
    head_out = head_forward(bev2, params["head"], precision)
    return IntermediateOutputs(pillars, pfeats, dfeats, bev2, head_out)
