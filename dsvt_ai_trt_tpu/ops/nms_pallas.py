"""Pallas TPU kernel for the pairwise rotated-rectangle overlap matrix.

The XLA formulation (ops/nms.py:pairwise_overlap_clip) materializes
[V, N, N] vertex planes in HBM between clip passes (~60 MB of traffic per
pass).  This kernel runs the whole Sutherland–Hodgman pipeline per [TA, TB]
pair tile in VMEM/registers: the vertex slots are a fully unrolled Python
list of [TA, TB] vectors, so nothing round-trips to HBM until the final
area tile is written.  Same math, same results.

Layout: the row (a) boxes' corners arrive as an [Na, 128] array with
corner x in columns 0..3 and corner y in columns 4..7 (lane-aligned blocks
of (TA, 128)); the column (b) boxes' corners as an [8, Nb] array (bx rows
0..3, by rows 4..7, blocks of (8, TB)).  Dynamic lane slicing is avoided
entirely — it crashes the Mosaic lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nms import box_corners

TA = 8     # a-boxes per tile (sublanes)
TB = 128   # b-boxes per tile (lanes)


def _overlap_kernel(a_ref, b_ref, out_ref):
    # STRICT-UPPER-TRIANGLE contract: greedy NMS only reads overlap[a, b]
    # for a < b (the suppression mask is idx[:,None] < idx[None,:],
    # ops/nms.py), so tiles entirely below the diagonal skip the whole
    # clip pipeline and write zeros — 37% of tiles at the top_k=500 grid.
    below = pl.program_id(0) >= (TB // TA) * (pl.program_id(1) + 1)

    @pl.when(below)
    def _zero():
        out_ref[:, :] = jnp.zeros((TA, TB), jnp.float32)

    @pl.when(jnp.logical_not(below))
    def _compute():
        _overlap_tile(a_ref, b_ref, out_ref)


def _overlap_tile(a_ref, b_ref, out_ref):
    ax = [a_ref[:, e][:, None] for e in range(4)]        # each [TA, 1]
    ay = [a_ref[:, 4 + e][:, None] for e in range(4)]
    bx = [b_ref[e, :][None, :] for e in range(4)]        # each [1, TB]
    by = [b_ref[4 + e, :][None, :] for e in range(4)]

    zeros = jnp.zeros((TA, TB), jnp.float32)
    poly_x = [ax[e] + zeros for e in range(4)]
    poly_y = [ay[e] + zeros for e in range(4)]
    valid = [jnp.ones((TA, TB), bool) for _ in range(4)]

    def next_valid(px, py, flags):
        """(x, y) of the next valid slot per position (cyclic), unrolled
        backward fill over the static slot list."""
        V = len(px)
        fill_x = [None] * V
        fill_y = [None] * V
        fill_f = [None] * V
        fill_x[V - 1], fill_y[V - 1], fill_f[V - 1] = px[V - 1], py[V - 1], flags[V - 1]
        for i in range(V - 2, -1, -1):
            fill_x[i] = jnp.where(flags[i], px[i], fill_x[i + 1])
            fill_y[i] = jnp.where(flags[i], py[i], fill_y[i + 1])
            fill_f[i] = flags[i] | fill_f[i + 1]
        nxt_x, nxt_y = [], []
        for i in range(V):
            if i + 1 < V:
                nxt_x.append(jnp.where(fill_f[i + 1], fill_x[i + 1], fill_x[0]))
                nxt_y.append(jnp.where(fill_f[i + 1], fill_y[i + 1], fill_y[0]))
            else:
                nxt_x.append(fill_x[0])
                nxt_y.append(fill_y[0])
        return nxt_x, nxt_y

    for e in range(4):
        cax, cay = bx[e], by[e]
        cbx, cby = bx[(e + 1) % 4], by[(e + 1) % 4]
        ex = cbx - cax
        ey = cby - cay

        nxt_x, nxt_y = next_valid(poly_x, poly_y, valid)
        V = len(poly_x)
        new_x, new_y, new_f = [], [], []
        for i in range(V):
            d_cur = ex * (poly_y[i] - cay) - ey * (poly_x[i] - cax)
            d_nxt = ex * (nxt_y[i] - cay) - ey * (nxt_x[i] - cax)
            inside = (d_cur >= 0) & valid[i]
            crossing = ((d_cur >= 0) != (d_nxt >= 0)) & valid[i]
            t = d_cur / jnp.where(crossing, d_cur - d_nxt, 1.0)
            new_x.append(poly_x[i])
            new_y.append(poly_y[i])
            new_f.append(inside)
            new_x.append(poly_x[i] + t * (nxt_x[i] - poly_x[i]))
            new_y.append(poly_y[i] + t * (nxt_y[i] - poly_y[i]))
            new_f.append(crossing)
        poly_x, poly_y, valid = new_x, new_y, new_f

    nxt_x, nxt_y = next_valid(poly_x, poly_y, valid)
    area = jnp.zeros((TA, TB), jnp.float32)
    cnt = jnp.zeros((TA, TB), jnp.int32)
    for i in range(len(poly_x)):
        term = poly_x[i] * nxt_y[i] - nxt_x[i] * poly_y[i]
        area = area + jnp.where(valid[i], term, 0.0)
        cnt = cnt + valid[i].astype(jnp.int32)
    area = jnp.abs(area) * 0.5
    out_ref[:, :] = jnp.where(cnt >= 3, area, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pairwise_overlap_pallas(boxes: jax.Array, interpret: bool = False) -> jax.Array:
    """[N, 9] score-sorted boxes -> [N, N] exact intersection areas on the
    strict upper triangle (a < b); entries in tiles fully below the
    diagonal are 0 (greedy NMS never reads them)."""
    n = boxes.shape[0]
    pad_a = (-n) % TA
    pad_b = (-n) % TB
    corners = box_corners(boxes)                       # [N, 4, 2]
    # a-side: [Na, 8] -> padded to [Na, 128] lanes (cols 0..3 x, 4..7 y)
    a_pack = jnp.concatenate([corners[..., 0], corners[..., 1]], axis=-1)
    a_pack = jnp.pad(a_pack, ((0, pad_a), (0, 128 - 8)))
    # b-side: [8, Nb] (rows 0..3 bx, rows 4..7 by)
    b_pack = jnp.concatenate(
        [jnp.transpose(corners[..., 0]), jnp.transpose(corners[..., 1])], axis=0)
    b_pack = jnp.pad(b_pack, ((0, 0), (0, pad_b)))
    na, nb = n + pad_a, n + pad_b

    out = pl.pallas_call(
        _overlap_kernel,
        grid=(na // TA, nb // TB),
        in_specs=[
            pl.BlockSpec((TA, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TB), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TA, TB), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((na, nb), jnp.float32),
        interpret=interpret,
    )(a_pack, b_pack)
    return out[:n, :n]
