"""On-device rotated-BEV NMS.

The reference runs greedy NMS on the host CPU with an exact rotated-rectangle
polygon-intersection IoU adapted from CUDA-PointPillars
(include/helper.h:92-283).  Here the full pairwise IoU matrix is computed on
device in one vectorized pass (edge-pair intersections + contained corners ->
angular sort -> shoelace, the same algorithm), and the greedy suppression is
a lax.fori_loop over score rank.  The host receives only final boxes.

Box convention matches the reference exactly: the rectangle's half-extent
along its local x axis is dim1/2 and along local y is dim0/2 (save_result
swaps dims into Bndbox{w,l}, helper.h:470-481, and box_overlap uses w along
x, helper.h:168), rotated by +heading.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

THRESHOLD = 1e-8   # helper.h:26
MARGIN = 1e-2      # helper.h:114


def box_corners(boxes: jax.Array) -> jax.Array:
    """boxes: [N, >=7] rows (x, y, z, dx, dy, dz, heading, ...).
    Returns [N, 4, 2] BEV corners in the reference's order
    (helper.h:184-200: (-,-), (+,-), (+,+), (-,+) then rotated)."""
    cx, cy = boxes[:, 0], boxes[:, 1]
    half_x = boxes[:, 4] / 2.0   # dim1 along local x (reference w)
    half_y = boxes[:, 3] / 2.0   # dim0 along local y (reference l)
    ang = boxes[:, 6]
    ox = jnp.stack([-half_x, half_x, half_x, -half_x], axis=1)
    oy = jnp.stack([-half_y, -half_y, half_y, half_y], axis=1)
    cos, sin = jnp.cos(ang)[:, None], jnp.sin(ang)[:, None]
    # rotate_around_center (helper.h:159-164)
    x = ox * cos - oy * sin + cx[:, None]
    y = ox * sin + oy * cos + cy[:, None]
    return jnp.stack([x, y], axis=-1)


def _cross(p1, p2, p0):
    return ((p1[..., 0] - p0[..., 0]) * (p2[..., 1] - p0[..., 1])
            - (p2[..., 0] - p0[..., 0]) * (p1[..., 1] - p0[..., 1]))


def _seg_intersections(ca: jax.Array, cb: jax.Array):
    """All 16 edge-pair intersection points for corner sets ca, cb.

    ca, cb: [..., 4, 2].  Returns points [..., 16, 2], valid [..., 16]
    in the reference's enumeration order (i over a edges major, j over b
    edges minor; helper.h:205-215).  Edge i is (corner[i+1], corner[i]).
    """
    a0 = ca                                  # p0 = corner[i]
    a1 = jnp.roll(ca, -1, axis=-2)           # p1 = corner[i+1]
    b0 = cb
    b1 = jnp.roll(cb, -1, axis=-2)

    p0 = jnp.repeat(a0, 4, axis=-2)          # [..., 16, 2] i-major
    p1 = jnp.repeat(a1, 4, axis=-2)
    q0 = jnp.tile(b0, (1,) * (cb.ndim - 2) + (4, 1))
    q1 = jnp.tile(b1, (1,) * (cb.ndim - 2) + (4, 1))

    # bounding-interval overlap pre-test (helper.h:127-131)
    def omin(u, v):
        return jnp.minimum(u, v)

    def omax(u, v):
        return jnp.maximum(u, v)

    bbox_ok = ((omin(p0[..., 0], p1[..., 0]) <= omax(q0[..., 0], q1[..., 0]))
               & (omin(q0[..., 0], q1[..., 0]) <= omax(p0[..., 0], p1[..., 0]))
               & (omin(p0[..., 1], p1[..., 1]) <= omax(q0[..., 1], q1[..., 1]))
               & (omin(q0[..., 1], q1[..., 1]) <= omax(p0[..., 1], p1[..., 1])))

    s1 = _cross(q0, p1, p0)
    s2 = _cross(p1, q1, p0)
    s3 = _cross(p0, q1, q0)
    s4 = _cross(q1, p1, q0)
    hit = bbox_ok & (s1 * s2 > 0) & (s3 * s4 > 0)

    s5 = _cross(q1, p1, p0)
    denom_ok = jnp.abs(s5 - s1) > THRESHOLD
    ix_a = (s5 * q0[..., 0] - s1 * q1[..., 0]) / jnp.where(denom_ok, s5 - s1, 1.0)
    iy_a = (s5 * q0[..., 1] - s1 * q1[..., 1]) / jnp.where(denom_ok, s5 - s1, 1.0)

    # degenerate fallback: line-equation solve (helper.h:147-154)
    a0c = p0[..., 1] - p1[..., 1]
    b0c = p1[..., 0] - p0[..., 0]
    c0c = p0[..., 0] * p1[..., 1] - p1[..., 0] * p0[..., 1]
    a1c = q0[..., 1] - q1[..., 1]
    b1c = q1[..., 0] - q0[..., 0]
    c1c = q0[..., 0] * q1[..., 1] - q1[..., 0] * q0[..., 1]
    D = a0c * b1c - a1c * b0c
    Ds = jnp.where(jnp.abs(D) > 0, D, 1.0)
    ix_b = (b0c * c1c - b1c * c0c) / Ds
    iy_b = (a1c * c0c - a0c * c1c) / Ds

    ix = jnp.where(denom_ok, ix_a, ix_b)
    iy = jnp.where(denom_ok, iy_a, iy_b)
    pts = jnp.stack([ix, iy], axis=-1)
    return jnp.where(hit[..., None], pts, 0.0), hit


def _point_in_box(boxes: jax.Array, pts: jax.Array) -> jax.Array:
    """check_box2d (helper.h:113-123).  boxes: [..., 9]; pts: [..., 4, 2]."""
    cx = boxes[..., 0:1]
    cy = boxes[..., 1:2]
    cos = jnp.cos(-boxes[..., 6:7])
    sin = jnp.sin(-boxes[..., 6:7])
    rx = (pts[..., 0] - cx) * cos - (pts[..., 1] - cy) * sin
    ry = (pts[..., 0] - cx) * sin + (pts[..., 1] - cy) * cos
    return ((jnp.abs(rx) < boxes[..., 4:5] / 2 + MARGIN)
            & (jnp.abs(ry) < boxes[..., 3:4] / 2 + MARGIN))


def pairwise_rotated_overlap(boxes: jax.Array) -> jax.Array:
    """Exact pairwise intersection *area* matrix [N, N] (box_overlap,
    helper.h:166-255)."""
    n = boxes.shape[0]
    corners = box_corners(boxes)                     # [N, 4, 2]

    ca = jnp.broadcast_to(corners[:, None], (n, n, 4, 2))
    cb = jnp.broadcast_to(corners[None, :], (n, n, 4, 2))
    box_a = jnp.broadcast_to(boxes[:, None, :], (n, n, boxes.shape[-1]))
    box_b = jnp.broadcast_to(boxes[None, :, :], (n, n, boxes.shape[-1]))

    inter_pts, inter_ok = _seg_intersections(ca, cb)           # [N,N,16,*]

    # contained corners, alternating (b-in-a, a-in-b) per k (helper.h:217-228)
    b_in_a = _point_in_box(box_a, cb)                           # [N,N,4]
    a_in_b = _point_in_box(box_b, ca)
    corner_pts = jnp.stack([cb, ca], axis=-3)                   # [N,N,2,4,2]
    corner_pts = jnp.swapaxes(corner_pts, -3, -2).reshape(n, n, 8, 2)
    corner_ok = jnp.stack([b_in_a, a_in_b], axis=-2)            # [N,N,2,4]
    corner_ok = jnp.swapaxes(corner_ok, -2, -1).reshape(n, n, 8)
    corner_pts = jnp.where(corner_ok[..., None], corner_pts, 0.0)

    pts = jnp.concatenate([inter_pts, corner_pts], axis=-2)    # [N,N,24,2]
    ok = jnp.concatenate([inter_ok, corner_ok], axis=-1)       # [N,N,24]

    cnt = jnp.sum(ok, axis=-1)
    okf = ok.astype(jnp.float32)
    center = jnp.sum(pts * okf[..., None], axis=-2) / jnp.maximum(
        cnt[..., None], 1).astype(jnp.float32)

    ang = jnp.arctan2(pts[..., 1] - center[..., 1:2],
                      pts[..., 0] - center[..., 0:1])
    ang = jnp.where(ok, ang, jnp.inf)                          # invalid last
    order = jnp.argsort(ang, axis=-1, stable=True)
    sorted_pts = jnp.take_along_axis(pts, order[..., None], axis=-2)
    sorted_ok = jnp.take_along_axis(ok, order, axis=-1)

    # shoelace fan from the first sorted point (helper.h:246-253)
    p0 = sorted_pts[..., 0:1, :]
    va = sorted_pts[..., :-1, :] - p0
    vb = sorted_pts[..., 1:, :] - p0
    terms = va[..., 0] * vb[..., 1] - va[..., 1] * vb[..., 0]
    term_ok = sorted_ok[..., 1:]                                # k+1 valid
    area = jnp.abs(jnp.sum(terms * term_ok.astype(jnp.float32), axis=-1)) / 2.0
    return jnp.where(cnt >= 3, area, 0.0)


def pairwise_overlap_clip(boxes: jax.Array) -> jax.Array:
    """Exact pairwise intersection area via vectorized Sutherland–Hodgman.

    Mathematically identical to pairwise_rotated_overlap (both compute the
    exact convex intersection) but built from elementwise ops, cumulative
    mins and gathers only — no angular argsort, no scatters (both are slow
    on TPU at [N^2, V] scale).  The vertex buffer doubles each clip pass
    (4 -> 64 slots) with a validity mask instead of compaction; traversal
    order is preserved because emitted slots keep their source order.

    Layout note: x and y live in separate [V, N, N] arrays.  A trailing
    coordinate dim of 2 would be lane-padded to 128 by the TPU tiler (a 64x
    memory blowup measured as ~500 ms); with N as the minor dims the tiles
    are dense and the whole clip is VPU-bound.
    """
    n = boxes.shape[0]
    corners = box_corners(boxes)                                  # [N, 4, 2]
    cax = jnp.transpose(corners[..., 0])                          # [4, N]
    cay = jnp.transpose(corners[..., 1])

    poly_x = jnp.broadcast_to(cax[:, :, None], (4, n, n))        # subject: box_a
    poly_y = jnp.broadcast_to(cay[:, :, None], (4, n, n))
    valid = jnp.ones((4, n, n), bool)

    def next_valid(vx, vy, valid):
        """(x, y) of the next valid slot after each slot, cyclic.

        Backward-fill via associative scan — log2(V) elementwise select
        passes, no gather (axis-0 gathers at [V, N, N] scale are slow on
        TPU; a measured take_along_axis here cost ~500 ms).
        """
        def combine(a, b):
            # prefix scan over flipped axis: keep the latest valid triple
            ax_, ay_, af = a
            bx_, by_, bf = b
            return (jnp.where(bf, bx_, ax_), jnp.where(bf, by_, ay_), af | bf)

        fx, fy, ff = jax.lax.associative_scan(
            combine, (jnp.flip(vx, 0), jnp.flip(vy, 0), jnp.flip(valid, 0)),
            axis=0)
        fill_x, fill_y, fill_f = jnp.flip(fx, 0), jnp.flip(fy, 0), jnp.flip(ff, 0)
        # fill_*[i] = value at the first valid slot >= i; nxt[i] = fill[i+1],
        # wrapping to the overall first valid slot
        first_x, first_y = fill_x[0], fill_y[0]
        nxt_x = jnp.concatenate([fill_x[1:], fill_x[:1]], 0)
        nxt_y = jnp.concatenate([fill_y[1:], fill_y[:1]], 0)
        has_after = jnp.concatenate([fill_f[1:], jnp.zeros_like(fill_f[:1])], 0)
        nxt_x = jnp.where(has_after, nxt_x, first_x[None])
        nxt_y = jnp.where(has_after, nxt_y, first_y[None])
        return nxt_x, nxt_y

    for e in range(4):
        ax = cax[e][None, :]                                      # clip: box_b
        ay = cay[e][None, :]
        bx = cax[(e + 1) % 4][None, :]
        by = cay[(e + 1) % 4][None, :]
        ex = (bx - ax)[None]                                      # [1, 1, N]... broadcast over rows
        ey = (by - ay)[None]
        axx = ax[None]
        ayy = ay[None]

        nxt_x, nxt_y = next_valid(poly_x, poly_y, valid)

        d_cur = ex * (poly_y - ayy) - ey * (poly_x - axx)
        d_nxt = ex * (nxt_y - ayy) - ey * (nxt_x - axx)
        inside_cur = (d_cur >= 0) & valid
        crossing = ((d_cur >= 0) != (d_nxt >= 0)) & valid
        t = d_cur / jnp.where(crossing, d_cur - d_nxt, 1.0)
        inter_x = poly_x + t * (nxt_x - poly_x)
        inter_y = poly_y + t * (nxt_y - poly_y)

        # slot i emits to fixed positions 2i (cur) and 2i+1 (intersection);
        # interleaving preserves traversal order, holes carry valid=False
        V = poly_x.shape[0]
        poly_x = jnp.stack([poly_x, inter_x], axis=1).reshape(2 * V, n, n)
        poly_y = jnp.stack([poly_y, inter_y], axis=1).reshape(2 * V, n, n)
        valid = jnp.stack([inside_cur, crossing], axis=1).reshape(2 * V, n, n)

    nxt_x, nxt_y = next_valid(poly_x, poly_y, valid)
    terms = poly_x * nxt_y - nxt_x * poly_y
    area = jnp.abs(jnp.sum(jnp.where(valid, terms, 0.0), axis=0)) / 2.0
    cnt = jnp.sum(valid, axis=0)
    return jnp.where(cnt >= 3, area, 0.0)


@functools.partial(jax.jit, static_argnames=("max_boxes", "use_pallas"))
def nms(boxes: jax.Array, count: jax.Array, iou_threshold: float,
        max_boxes: int = 0, use_pallas: bool = None):
    """Greedy rotated NMS (nms_cpu, helper.h:257-283).

    boxes: [K, 9] sorted by descending score with `count` valid rows.
    Returns (boxes [K, 9] compacted keep-first, keep_count).
    The pairwise overlap runs as a fused Pallas kernel on TPU (about 8x the
    XLA formulation) and as the XLA clip elsewhere.
    """
    K = boxes.shape[0]
    valid = jnp.arange(K) < count
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .nms_pallas import pairwise_overlap_pallas
        overlap = pairwise_overlap_pallas(boxes)
    else:
        overlap = pairwise_overlap_clip(boxes)
    sa = boxes[:, 3] * boxes[:, 4]
    union = jnp.maximum(sa[:, None] + sa[None, :] - overlap, THRESHOLD)
    iou = overlap / union

    idx = jnp.arange(K)
    # greedy suppression, exact, as PEELING ROUNDS: each round promotes
    # every undecided box with no undecided higher-scored suppressor (its
    # greedy decision is forced — any earlier box is either kept, which
    # would already have removed it, or suppressed, which cannot suppress)
    # and removes everything the newly-promoted boxes suppress.  Round
    # count = suppression-chain depth, 2-5 in practice at IoU 0.01 (each
    # round is two [K, K] mask reductions, ~microseconds), vs the previous
    # chunked Gauss-Seidel whose 64-step unrolled in-chunk recurrence was
    # latency-bound at ~1 ms/frame (round-3 trace, while.78).  The earliest
    # undecided box always promotes, so the loop terminates in <= K rounds.
    sup_mask = (iou >= iou_threshold) & (idx[:, None] < idx[None, :]) & valid[:, None]

    def round_cond(state):
        _kept, undecided = state
        return jnp.any(undecided)

    def round_body(state):
        kept, undecided = state
        blocked = jnp.any(sup_mask & undecided[:, None], axis=0)
        promote = undecided & ~blocked
        suppressed = jnp.any(sup_mask & promote[:, None], axis=0)
        return kept | promote, undecided & ~promote & ~suppressed

    keep, _ = jax.lax.while_loop(
        round_cond, round_body, (jnp.zeros_like(valid), valid))
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    kept = jnp.where(keep[order][:, None], boxes[order], 0.0)
    return kept, jnp.sum(keep.astype(jnp.int32))
