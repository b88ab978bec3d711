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


def _rowconv3(x: jax.Array, w: jax.Array, b: jax.Array,
              precision: str) -> jax.Array:
    """3x3 stride-1 SAME conv as three dy-shifted 1D convs with H as the
    conv BATCH dim.  x: [H, W, Ci]; w: [3, 3, Ci, Co] -> [H, W, Co].

    Why not one lax 2D conv (_conv): with N=1, XLA's layout assignment lets
    decode's transpose/top-k consumers demote the whole head chain to a
    T(2,128) linear layout whose second-minor dim is the size-1 batch —
    traced at 5.4 ms for the 97-GFLOP shared conv vs 1.0 ms undemoted
    (round-3 trace).  With H as a real batch dim the pathological layout
    cannot be chosen at all: measured 2.0 ms for the full head chain +
    decode consumers vs 9.5.

    Used by the CenterHead only.  The SAME formulation for the backbone2d
    residual units was built and measured — and rejected: the 3x-inflated
    conv output plus the dy-shift pad/add epilogue on the big 468^2 stage-0
    maps cost ~2.2 ms MORE than the ~1.4 ms of entry/exit layout copies it
    removed (bev_backbone2d 8.0 vs 5.8 ms traced), so the backbone keeps
    the 2D conv form where XLA's conv layouts are near speed-of-light
    (97% MFU on the stage convs).

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


def _res_unit(x, unit, stride, precision):
    h = jnp.maximum(_conv(x, unit["conv1_w"], unit["conv1_b"], stride,
                          precision), 0.0)
    h = _conv(h, unit["conv2_w"], unit["conv2_b"], 1, precision)
    if "down_w" in unit:
        shortcut = _conv(x, unit["down_w"], unit["down_b"], stride, precision)
    else:
        shortcut = x
    return jnp.maximum(h + shortcut, 0.0)


def _upsample(x, w, b, k, precision):
    """ConvTranspose2d with kernel==stride via lax.conv_transpose.

    w layout: [in, out, k, k] (torch ConvTranspose2d); passed as
    [k, k, out, in] with transpose_kernel=True, which reproduces
    out[y*k+dy, x*k+dx, o] = sum_i in[y,x,i] * w[i,o,dy,dx] exactly
    (deconvBnLELU, cpp:225-245; orientation sweep measured err 0.0).

    A matmul + [H, k, W, k, O] -> [H*k, W*k, O] pixel-shuffle reshape was
    the round-1..3 formulation — that reshape is a genuine relayout whose
    conv-output layout XLA demotes to T(2,128) (the size-k second-minor
    dim), two copies per deblock; conv_transpose traced 2x faster
    standalone (0.23 vs 0.46 ms at k=2, 0.26 vs 0.37 at k=4).
    """
    dt = jnp.bfloat16 if precision == "bf16" else jnp.float32
    wk = jnp.transpose(w, (2, 3, 1, 0)).astype(dt)      # [k, k, out, in]
    y = jax.lax.conv_transpose(
        x.astype(dt)[None], wk, (k, k), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True, precision=dot_precision(precision),
        preferred_element_type=dt)[0]
    return jnp.maximum(y + b.astype(dt), 0.0).astype(dt)


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
