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
from ..ops.common import dot_precision
from ..parallel.spatial import constrain_bev
from .backbone2d import _conv


def head_forward(features: jax.Array, params: dict, precision: str = "fp32",
                 cfg: DSVTConfig = None, lazy: bool = False) -> Dict[str, jax.Array]:
    """features: [H, W, 384] -> dict of [H, W, c] maps.

    lazy=True computes full maps only for the heatmap (the top-k source);
    it returns {"hm", "shared"} and the regression branches are evaluated
    at just the selected cells inside decode (ops/postprocess.py,
    decode_lazy_branches).  Full-map regression convs cost ~10 ms/frame on
    the 468^2 grid because every small-c conv pads its output to the
    128-lane MXU width; only top_k=500 of the 219K cells are ever read.
    """
    branches = head_branches(cfg) if cfg is not None else _infer_branches(params)

    # unsharded runs use the row-batched conv formulation (see _rowconv3);
    # under spatial sharding GSPMD owns the halo exchanges of the 2D form
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


def _rowconv3(x: jax.Array, w: jax.Array, b: jax.Array,
              precision: str) -> jax.Array:
    """3x3 stride-1 SAME conv as three dy-shifted 1D convs with H as the
    conv BATCH dim.  x: [H, W, Ci]; w: [3, 3, Ci, Co] -> [H, W, Co].

    Why not one lax 2D conv (_conv): with N=1, XLA's layout assignment lets
    decode's transpose/top-k consumers demote the whole head chain to a
    T(2,128) linear layout whose second-minor dim is the size-1 batch —
    traced at 5.4 ms for the 97-GFLOP shared conv vs 1.0 ms undemoted
    (round-3 trace).  Every steering attempt failed: a Pallas identity
    "layout firewall" (custom-call operand layouts back-propagate, +5 ms),
    a 1x1 identity conv anchor (worked standalone, ignored in the full
    program), channel padding to 128, and NCHW (canonicalized back).  With
    H as a real batch dim the pathological layout cannot be chosen at all:
    measured 2.0 ms for the full head chain + decode consumers vs 9.5.
    Cost: the input is read three times (+0.5 ms of HBM traffic on the
    384-ch input) — a 4.7x win regardless.

    Exact algebra: y[h,w,o] = sum_dy sum_dx x[h+dy-1, w+dx-1, i] *
    w[dy,dx,i,o], decomposed over dy; H zero-padding via jnp.pad, W via the
    1D conv's own SAME padding — identical to _conv's symmetric k//2
    padding semantics (torch Conv2d padding=1, cpp:182-245).
    """
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    Co = w.shape[-1]
    # ONE conv with the three dy-taps concatenated on the output-channel
    # axis: reads x once (the padded-slice variant read it three times,
    # 1.0 ms on the 384-ch input) and fills all 3*Co MXU lanes; the dy
    # shifts then move to the 3x-smaller conv output as a fused
    # pad+slice+add epilogue.
    wcat = jnp.concatenate([w[0], w[1], w[2]], axis=-1).astype(dt)  # [3,Ci,3Co]
    c = jax.lax.conv_general_dilated(
        x.astype(dt), wcat, window_strides=(1,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=dt, precision=dot_precision(precision))
    # y[h] = c_dy0[h-1] + c_dy1[h] + c_dy2[h+1]  (zero rows off the map)
    out = (c[:, :, Co:2 * Co]
           + jnp.pad(c[:-1, :, :Co], ((1, 0), (0, 0), (0, 0)))
           + jnp.pad(c[1:, :, 2 * Co:], ((0, 1), (0, 0), (0, 0))))
    return out + b.astype(dt)


def _infer_branches(params: dict):
    from ..config import HEAD_BRANCHES
    return tuple((name, params[name]["w1"].shape[-1])
                 for name, _ in HEAD_BRANCHES)
