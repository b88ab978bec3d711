"""CenterPoint-style CenterHead.

Reference graph: dsvt-ai-trt.cpp:1369-1468 — shared 3x3 conv 384->64
(+BN+ReLU), then six branches (center 2, center_z 1, dim 3, rot 2, iou 1,
hm 10), each 3x3 conv 64 (+BN+ReLU) -> 3x3 conv with bias.  The iou branch
is computed but unused downstream (cfg USE_IOU_TO_RECTIFY_SCORE: False);
kept for checkpoint parity.

TPU-native design: the inference path is LAZY — only the heatmap (the
top-k source) gets full-map convolutions; the five regression branches are
evaluated at just the selected cells inside decode
(ops/postprocess.decode_lazy_branches), because full-map small-c convs pad
their outputs to the 128-lane MXU width (a round-1 "fused block-diagonal"
variant profiled at 10 ms/frame).  The full-map path below remains for
training, debug and the stats golden; the six per-branch hidden convs
still fuse into one 64->384 conv there.  Weights stay stored per-branch
(checkpoint contract + training gradients).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import DSVTConfig, head_branches
from ..parallel.spatial import constrain_bev
from .backbone2d import _conv, _rowconv3


def head_forward(features: jax.Array, params: dict, precision: str = "fp32",
                 cfg: DSVTConfig = None, lazy: bool = False) -> Dict[str, jax.Array]:
    """features: [H, W, 384] -> dict of [H, W, c] maps.

    lazy=True computes full maps only for the heatmap (the top-k source);
    it returns {"hm", "shared"} and the regression branches are evaluated
    at just the selected cells inside decode (ops/postprocess.py,
    decode_lazy_branches).  Full-map regression convs cost ~10 ms/frame on
    the 468^2 grid because every small-c conv pads its output to the
    128-lane MXU width; only top_k=500 of the 219K cells are ever read.

    A split-shared-conv variant (head consumes the pre-concat lateral tuple,
    conv(concat(l), W) == sum_i conv(l_i, W_i)) was built and traced: it
    saves the 0.44 ms [468, 468, 384] concat but the three 128-deep
    contractions + their epilogues cost +0.55 ms in the head — full-program
    device time 17.7 vs 17.3 ms — so the concat form stays.
    """
    branches = head_branches(cfg) if cfg is not None else _infer_branches(params)

    # unsharded runs use the row-batched conv formulation (see
    # backbone2d._rowconv3); under spatial sharding GSPMD owns the halo
    # exchanges of the 2D form
    from ..parallel.spatial import constrain_bev as _cb
    row_form = _cb(features) is features

    def conv_relu(x, w, b, relu):
        y = (_rowconv3(x, w, b, precision) if row_form
             else _conv(x, w, b, 1, precision))
        return jnp.maximum(y, 0.0) if relu else y

    shared = constrain_bev(conv_relu(features, params["shared_w"],
                                     params["shared_b"], True))

    if lazy:
        hm_hidden = conv_relu(shared, params["hm"]["w0"], params["hm"]["b0"],
                              True)
        hm = conv_relu(hm_hidden, params["hm"]["w1"], params["hm"]["b1"],
                       False)
        return {"hm": hm, "shared": shared}

    hidden_c = params[branches[0][0]]["w0"].shape[-1]
    w0 = jnp.concatenate([params[n]["w0"] for n, _ in branches], axis=-1)
    b0 = jnp.concatenate([params[n]["b0"] for n, _ in branches], axis=-1)
    hidden = constrain_bev(jnp.maximum(_conv(shared, w0, b0, 1, precision), 0.0))

    # final convs run per branch on each branch's own 64-channel hidden
    # slice.  The round-1 "fusion" into one zero-padded block-diagonal
    # 384->19 conv cost 6x the FLOPs on top of N=19 lane padding — profiled
    # at 10 ms/frame, the single hottest op in the pipeline; grouped conv
    # (feature_group_count=6) lowers even worse on TPU (measured 45 ms).
    out = {}
    for b, (name, c) in enumerate(branches):
        h = hidden[:, :, b * hidden_c:(b + 1) * hidden_c]
        out[name] = _conv(h, params[name]["w1"], params[name]["b1"], 1,
                          precision)
    return out


def _infer_branches(params: dict):
    from ..config import HEAD_BRANCHES
    return tuple((name, params[name]["w1"].shape[-1])
                 for name, _ in HEAD_BRANCHES)
