"""2D BEV ResNet backbone (BaseBEVResBackbone).

Reference graph: dsvt-ai-trt.cpp:1140-1364 — three stages of residual units
(stage0: stride-1 downsample unit + 1 identity unit @128; stage1: stride-2
unit + 2 identity @128; stage2: stride-2 unit + 2 identity @256), then three
lateral upsampling heads (1x1 s1, 2x2 s2, 4x4 s4 deconvs to 128 channels)
concatenated to 384 channels at full 468x468 resolution.

TPU-native choices: NHWC layout throughout, BatchNorm folded into conv
weights at load time (the reference folds into TRT IScaleLayers at build,
cpp:149-180), and the stride==kernel transposed convs implemented as a
matmul + pixel-shuffle reshape, which maps straight onto the MXU with no
conv_transpose scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BACKBONE2D_STAGES, BACKBONE2D_DEBLOCK
from ..ops.common import dot_precision
from ..parallel.spatial import constrain_bev


def _conv(x, w, b, stride=1, precision="fp32"):
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    # explicit symmetric padding k//2 (torch Conv2d padding=1 semantics, the
    # reference's conv helpers cpp:182-245).  XLA's "SAME" would pad (0,1)
    # asymmetrically for stride-2 on even inputs — a one-pixel grid shift vs
    # the reference; caught by the torch oracle (tools/torch_oracle.py).
    pad = w.shape[0] // 2
    # bf16 mode emits bf16 conv outputs directly (MXU accumulation is f32
    # in-kernel either way): an f32 result forces a separate 2x-wide
    # materialization with a degenerate T(1,128) tiling — profiled at ~2x
    # the conv cost on the 468^2 maps
    y = jax.lax.conv_general_dilated(
        x.astype(dt)[None], w.astype(dt),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt,
        precision=dot_precision(precision),
    )[0]
    return (y + b.astype(dt)).astype(dt)


def _res_unit(x, unit, stride, precision):
    h = jnp.maximum(_conv(x, unit["conv1_w"], unit["conv1_b"], stride, precision), 0.0)
    h = _conv(h, unit["conv2_w"], unit["conv2_b"], 1, precision)
    if "down_w" in unit:
        shortcut = _conv(x, unit["down_w"], unit["down_b"], stride, precision)
    else:
        shortcut = x
    return jnp.maximum(h + shortcut, 0.0)


def _upsample(x, w, b, k, precision):
    """ConvTranspose2d with kernel==stride as einsum + pixel shuffle.

    w layout: [in, out, k, k] (torch ConvTranspose2d).  Because k == stride
    and padding == 0, out[y*k+dy, x*k+dx, o] = sum_i in[y,x,i] * w[i,o,dy,dx]
    exactly (deconvBnLELU, cpp:225-245).
    """
    H, W, _ = x.shape
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    # emit the matmul result in dt: the [H, k, W, k, O] -> [H*k, W*k, O]
    # pixel shuffle is a genuine relayout copy (112 MB at k=2 in f32,
    # 0.25 ms traced) — bf16 on fast paths halves it; MXU accumulation is
    # f32 in-kernel either way
    y = jnp.einsum("hwi,ioyx->hywxo", x.astype(dt), w.astype(dt),
                   preferred_element_type=dt,
                   precision=dot_precision(precision))
    y = y.reshape(H * k, W * k, w.shape[1]) + b.astype(dt)
    return jnp.maximum(y, 0.0).astype(dt)


def backbone2d_forward(bev: jax.Array, params: dict,
                       precision: str = "fp32") -> jax.Array:
    """bev: [H, W, 192] -> [H, W, 384]."""
    x = constrain_bev(bev)
    laterals = []
    for s, (units, _ch, stride) in enumerate(BACKBONE2D_STAGES):
        stage = params["stages"][s]
        for u in range(units):
            x = constrain_bev(_res_unit(x, stage[u], stride if u == 0 else 1,
                                        precision))
        k, _s = BACKBONE2D_DEBLOCK[s]
        d = params["deblocks"][s]
        laterals.append(constrain_bev(_upsample(x, d["w"], d["b"], k, precision)))
    return constrain_bev(jnp.concatenate(laterals, axis=-1))
