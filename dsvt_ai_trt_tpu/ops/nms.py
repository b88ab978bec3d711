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
    exact convex intersection) but sort-free: four half-plane clip passes
    over a fixed 12-slot vertex buffer instead of a 24-way angular argsort
    per pair, which is ~10x faster on TPU.  Used by nms(); the
    reference-shaped algorithm above is kept for parity testing.
    """
    n = boxes.shape[0]
    V = 12  # intersection of two quads has <= 8 vertices
    corners = box_corners(boxes)                                  # [N, 4, 2]

    # polygon buffer: subject = box_a corners, clip = box_b edges
    poly = jnp.zeros((n, n, V, 2), jnp.float32)
    poly = poly.at[:, :, :4, :].set(corners[:, None, :, :])
    cnt = jnp.full((n, n), 4, jnp.int32)

    clip_pts = jnp.broadcast_to(corners[None, :, :, :], (n, n, 4, 2))
    slot = jnp.arange(V, dtype=jnp.int32)

    for e in range(4):
        a = clip_pts[:, :, e, :]                                  # [N,N,2]
        b = clip_pts[:, :, (e + 1) % 4, :]
        ex = (b[..., 0] - a[..., 0])[..., None]                   # [N,N,1]
        ey = (b[..., 1] - a[..., 1])[..., None]

        live = slot[None, None, :] < cnt[..., None]               # [N,N,V]
        nxt_idx = jnp.where(slot[None, None, :] + 1 < cnt[..., None],
                            slot[None, None, :] + 1, 0)
        cur = poly
        nxt = jnp.take_along_axis(poly, nxt_idx[..., None], axis=2)

        d_cur = ex * (cur[..., 1] - a[..., 1:2]) - ey * (cur[..., 0] - a[..., 0:1])
        d_nxt = ex * (nxt[..., 1] - a[..., 1:2]) - ey * (nxt[..., 0] - a[..., 0:1])
        inside_cur = (d_cur >= 0) & live
        crossing = ((d_cur >= 0) != (d_nxt >= 0)) & live
        t = d_cur / jnp.where(crossing, d_cur - d_nxt, 1.0)
        inter = cur + t[..., None] * (nxt - cur)

        # each live slot emits up to 2 vertices: cur (if inside), then inter
        emit0 = inside_cur
        emit1 = crossing
        counts01 = emit0.astype(jnp.int32) + emit1.astype(jnp.int32)
        base = jnp.cumsum(counts01, axis=2) - counts01            # excl. cumsum
        new_cnt = jnp.sum(counts01, axis=2)

        out = jnp.zeros((n, n, V, 2), jnp.float32)
        rows = jnp.broadcast_to(jnp.arange(n)[:, None, None], (n, n, V))
        cols = jnp.broadcast_to(jnp.arange(n)[None, :, None], (n, n, V))
        idx0 = jnp.where(emit0, base, V)                          # V -> dropped
        out = out.at[rows, cols, idx0].set(cur, mode="drop")
        idx1 = jnp.where(emit1, base + emit0.astype(jnp.int32), V)
        out = out.at[rows, cols, idx1].set(inter, mode="drop")
        poly, cnt = out, new_cnt

    live = slot[None, None, :] < cnt[..., None]
    nxt_idx = jnp.where(slot[None, None, :] + 1 < cnt[..., None],
                        slot[None, None, :] + 1, 0)
    nxt = jnp.take_along_axis(poly, nxt_idx[..., None], axis=2)
    terms = (poly[..., 0] * nxt[..., 1] - nxt[..., 0] * poly[..., 1])
    area = jnp.abs(jnp.sum(jnp.where(live, terms, 0.0), axis=2)) / 2.0
    return jnp.where(cnt >= 3, area, 0.0)


@functools.partial(jax.jit, static_argnames=("max_boxes",))
def nms(boxes: jax.Array, count: jax.Array, iou_threshold: float,
        max_boxes: int = 0):
    """Greedy rotated NMS (nms_cpu, helper.h:257-283).

    boxes: [K, 9] sorted by descending score with `count` valid rows.
    Returns (boxes [K, 9] compacted keep-first, keep_count).
    """
    K = boxes.shape[0]
    valid = jnp.arange(K) < count
    overlap = pairwise_overlap_clip(boxes)
    sa = boxes[:, 3] * boxes[:, 4]
    union = jnp.maximum(sa[:, None] + sa[None, :] - overlap, THRESHOLD)
    iou = overlap / union

    idx = jnp.arange(K)
    sup_mask = iou >= iou_threshold

    def body(i, suppressed):
        active = valid[i] & ~suppressed[i]
        return suppressed | (active & sup_mask[i] & (idx > i))

    suppressed = jax.lax.fori_loop(0, K, body, jnp.zeros((K,), bool))
    keep = valid & ~suppressed
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    kept = jnp.where(keep[order][:, None], boxes[order], 0.0)
    return kept, jnp.sum(keep.astype(jnp.int32))
