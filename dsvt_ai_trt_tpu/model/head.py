"""CenterPoint-style CenterHead.

Reference graph: dsvt-ai-trt.cpp:1369-1468 — shared 3x3 conv 384->64
(+BN+ReLU), then six branches (center 2, center_z 1, dim 3, rot 2, iou 1,
hm 10), each 3x3 conv 64 (+BN+ReLU) -> 3x3 conv with bias.  The iou branch
is computed but unused downstream (cfg USE_IOU_TO_RECTIFY_SCORE: False);
kept for checkpoint parity.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import HEAD_BRANCHES
from .backbone2d import _conv


def head_forward(features: jax.Array, params: dict,
                 precision: str = "fp32") -> Dict[str, jax.Array]:
    """features: [H, W, 384] -> dict of [H, W, c] maps."""
    shared = jnp.maximum(
        _conv(features, params["shared_w"], params["shared_b"], 1, precision), 0.0)
    out = {}
    for name, _c in HEAD_BRANCHES:
        br = params[name]
        h = jnp.maximum(_conv(shared, br["w0"], br["b0"], 1, precision), 0.0)
        out[name] = _conv(h, br["w1"], br["b1"], 1, precision)
    return out
