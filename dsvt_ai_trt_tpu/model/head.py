"""CenterPoint-style CenterHead.

Reference graph: dsvt-ai-trt.cpp:1369-1468 — shared 3x3 conv 384->64
(+BN+ReLU), then six branches (center 2, center_z 1, dim 3, rot 2, iou 1,
hm 10), each 3x3 conv 64 (+BN+ReLU) -> 3x3 conv with bias.  The iou branch
is computed but unused downstream (cfg USE_IOU_TO_RECTIFY_SCORE: False);
kept for checkpoint parity.

TPU-native fusion: the six per-branch hidden convs share one input, so they
run as ONE 64->384 conv; the six final convs are block-diagonal over the
concatenated hidden, materialized as one 384->19 conv with zeros off-block.
Identical math (each output channel still sees only its branch's 64 hidden
channels), but the MXU sees two large matmuls instead of twelve 64-wide
ones.  Weights stay stored per-branch (checkpoint contract + training
gradients); the fused tensors are assembled inside the traced function,
which XLA hoists out of the per-frame path.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import DSVTConfig, head_branches
from ..parallel.spatial import constrain_bev
from .backbone2d import _conv


def head_forward(features: jax.Array, params: dict, precision: str = "fp32",
                 cfg: DSVTConfig = None) -> Dict[str, jax.Array]:
    """features: [H, W, 384] -> dict of [H, W, c] maps."""
    branches = head_branches(cfg) if cfg is not None else _infer_branches(params)

    shared = constrain_bev(jnp.maximum(
        _conv(features, params["shared_w"], params["shared_b"], 1, precision), 0.0))

    hidden_c = params[branches[0][0]]["w0"].shape[-1]
    w0 = jnp.concatenate([params[n]["w0"] for n, _ in branches], axis=-1)
    b0 = jnp.concatenate([params[n]["b0"] for n, _ in branches], axis=-1)
    hidden = constrain_bev(jnp.maximum(_conv(shared, w0, b0, 1, precision), 0.0))

    total_out = sum(c for _, c in branches)
    total_in = hidden_c * len(branches)
    k = params[branches[0][0]]["w1"].shape[0]
    w1 = jnp.zeros((k, k, total_in, total_out), jnp.float32)
    b1 = jnp.concatenate([params[n]["b1"] for n, _ in branches], axis=-1)
    in_off, out_off = 0, 0
    for name, c in branches:
        w1 = w1.at[:, :, in_off:in_off + hidden_c,
                   out_off:out_off + c].set(params[name]["w1"])
        in_off += hidden_c
        out_off += c
    fused = constrain_bev(_conv(hidden, w1, b1, 1, precision))

    out, off = {}, 0
    for name, c in branches:
        out[name] = fused[..., off:off + c]
        off += c
    return out


def _infer_branches(params: dict):
    from ..config import HEAD_BRANCHES
    return tuple((name, params[name]["w1"].shape[-1])
                 for name, _ in HEAD_BRANCHES)
