"""In-graph box decoding: sigmoid/top-k/gather/decode + score filtering.

Replaces the reference's ~220 lines of TRT index arithmetic
(src/dsvt-ai-trt.cpp:1471-1691, building mod/div out of FLOOR_DIV/PROD/SUB
because TRT lacks a modulo op) and the FilterBoxByScorePlugin compaction
(plugins/src/filterBoxByScore.cu:266-309) with jax.lax.top_k and a stable
mask-sort compaction.  Everything stays on device; the host receives only
the [top_k, 9] box tensor and a count.

Heading decode: the reference computes atan(sin/cos) (cpp:1667-1669) which
folds headings into (-pi/2, pi/2]; we default to arctan2 (correct quadrant,
identical box geometry modulo pi) with cfg.parity_atan for bit parity.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..config import DSVTConfig


class Detections(NamedTuple):
    """boxes: [K, 9] = (x, y, z, dx, dy, dz, heading, class, score); rows
    past `count` are zero.  Matches FilterBoxByScorePlugin's output layout
    (filterBoxByScore.cu:297-306)."""

    boxes: jax.Array
    count: jax.Array


def decode_and_filter(head_out: Dict[str, jax.Array], cfg: DSVTConfig) -> Detections:
    H, W = head_out["hm"].shape[:2]
    K = cfg.top_k
    ncls = cfg.num_classes
    vx, vy, _vz = cfg.voxel_size
    xmin, ymin, zmin = cfg.pc_range_min
    xmax, ymax, zmax = cfg.pc_range_max

    # [ncls, H*W] heatmap scores (f32 regardless of backbone precision)
    head_out = {k: v.astype(jnp.float32) for k, v in head_out.items()}
    hm = jax.nn.sigmoid(head_out["hm"]).transpose(2, 0, 1).reshape(ncls, H * W)

    # per-class top-k then global top-k (cpp:1519-1561)
    if cfg.approx_topk:
        # TPU-native partial reduction instead of the full per-class sort
        cls_scores, cls_inds = jax.lax.approx_max_k(hm, K, recall_target=0.95)
    else:
        cls_scores, cls_inds = jax.lax.top_k(hm, K)        # [ncls, K]
    flat_scores = cls_scores.reshape(ncls * K)
    scores, sel = jax.lax.top_k(flat_scores, K)            # [K]
    classes = sel // K                                      # (cpp:1571)
    inds = cls_inds.reshape(ncls * K)[sel]                  # cell index in H*W
    ys = (inds // W).astype(jnp.float32)
    xs = (inds % W).astype(jnp.float32)

    def gather(name):
        c = head_out[name].shape[-1]
        return head_out[name].reshape(H * W, c)[inds]

    center = gather("center")                               # [K, 2]
    center_z = gather("center_z")[:, 0]
    dim = jnp.exp(gather("dim"))                            # (cpp:1487)
    rot = gather("rot")
    rot_cos, rot_sin = rot[:, 0], rot[:, 1]
    if cfg.parity_atan:
        heading = jnp.arctan(rot_sin / rot_cos)             # reference quirk
    else:
        heading = jnp.arctan2(rot_sin, rot_cos)

    # metric decode (filterBoxByScore.cu:275-284); feature-map stride is 1
    x = (xs + center[:, 0]) * vx + xmin
    y = (ys + center[:, 1]) * vy + ymin

    in_range = ((x >= xmin) & (x < xmax) & (y >= ymin) & (y < ymax)
                & (center_z >= zmin) & (center_z < zmax))
    keep = in_range & (scores >= cfg.score_threshold)

    boxes = jnp.stack([
        x, y, center_z, dim[:, 0], dim[:, 1], dim[:, 2], heading,
        classes.astype(jnp.float32), scores,
    ], axis=-1)
    boxes = jnp.where(keep[:, None], boxes, 0.0)

    # stable compaction: kept rows first, preserving score order (the
    # reference's atomicAdd compaction order is nondeterministic,
    # filterBoxByScore.cu:295)
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    return Detections(boxes=boxes[order],
                      count=jnp.sum(keep.astype(jnp.int32)))
