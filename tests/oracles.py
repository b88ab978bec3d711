"""NumPy oracles re-derived from the reference CUDA kernel semantics.

Each function is an independent, direct re-derivation of a reference kernel
(file:line cited per function) in plain Python/NumPy, used only to validate
the JAX ops.  Orderings that are nondeterministic in the reference
(atomicAdd arrival) are made deterministic the same way the JAX ops are:
pillars ordered by BEV cell index, windows by linear window id, points by
file order within a pillar.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np


# ---------------------------------------------------------------------------
# voxelizer (points2Features.cu:669-865)
# ---------------------------------------------------------------------------

def voxelize_oracle(points: np.ndarray, num_points: int, cfg):
    gx = cfg.grid_size[0]
    xmin, ymin, zmin = cfg.pc_range_min
    xmax, ymax, zmax = cfg.pc_range_max
    vx, vy, vz = cfg.voxel_size
    cap = cfg.max_points_per_pillar

    groups: Dict[int, List[int]] = {}
    for i in range(num_points):
        x, y, z = points[i, :3]
        if not (xmin <= x < xmax and ymin <= y < ymax and zmin <= z < zmax):
            continue
        cell = int(np.floor((y - ymin) / vy)) * gx + int(np.floor((x - xmin) / vx))
        groups.setdefault(cell, []).append(i)

    cells = sorted(groups)[:cfg.max_pillars]
    kept_total = 0
    pillar_points: Dict[int, List[int]] = {}
    for p, cell in enumerate(cells):
        kept = groups[cell][:cap]
        # global compacted-point budget (MAX_POINTS_NUM_1)
        room = cfg.max_kept_points - kept_total
        kept = kept[:max(room, 0)]
        kept_total += len(kept)
        pillar_points[p] = kept

    feats = {}
    for p, kept in pillar_points.items():
        if not kept:
            continue
        pts = points[kept]
        mean = pts[:, :3].mean(axis=0)
        rows = []
        for q in pts:
            cxc = (np.floor((q[0] - xmin) / vx) + 0.5) * vx + xmin
            cyc = (np.floor((q[1] - ymin) / vy) + 0.5) * vy + ymin
            czc = (np.floor((q[2] - zmin) / vz) + 0.5) * vz + zmin
            rows.append(np.concatenate([
                q[:4], q[:3] - mean,
                [q[0] - cxc, q[1] - cyc, q[2] - czc]]))
        feats[p] = np.array(rows, np.float32)

    coords = np.array([[c // gx, c % gx] for c in cells], np.int64).reshape(-1, 2)
    return {"cells": cells, "coords": coords, "pillar_points": pillar_points,
            "feats": feats}


# ---------------------------------------------------------------------------
# scatter max (torchScatterMax.cu:201-259)
# ---------------------------------------------------------------------------

def scatter_max_oracle(point_feats, point_pillar, point_valid, num_pillars):
    C = point_feats.shape[1]
    pillar_max = np.zeros((num_pillars, C), np.float32)
    init = np.full((C,), -1.0e6, np.float32)
    acc = {}
    for i in range(len(point_feats)):
        if not point_valid[i]:
            continue
        p = int(point_pillar[i])
        if p >= num_pillars:
            continue
        acc.setdefault(p, init.copy())
        acc[p] = np.maximum(acc[p], point_feats[i])
    for p, v in acc.items():
        pillar_max[p] = v
    point_max = np.zeros_like(point_feats)
    for i in range(len(point_feats)):
        if point_valid[i] and int(point_pillar[i]) < num_pillars:
            point_max[i] = pillar_max[int(point_pillar[i])]
    return point_max, pillar_max


# ---------------------------------------------------------------------------
# window + set partition (windowPartition.cu:278-381, getSet.cu:326-609)
# ---------------------------------------------------------------------------

def set_partition_oracle(coords, pillar_valid, spec, cfg):
    """Returns inds [2, S, K] (dump=P), key_mask [S, K], set_count."""
    P = len(coords)
    K = cfg.set_size
    S = cfg.max_sets
    wx, wy, wz = spec.shape
    sx, sy, _sz = spec.shift
    nwx = cfg.sparse_shape[0] // wx + 1

    windows: Dict[int, List[int]] = {}
    inwin = {}
    for p in range(P):
        if not pillar_valid[p]:
            continue
        iy, ix = int(coords[p, 0]), int(coords[p, 1])
        shx, shy = ix + sx, iy + sy
        wid = (shy // wy) * nwx + (shx // wx)
        windows.setdefault(wid, []).append(p)
        inwin[p] = (shx % wx, shy % wy, 0)

    inds = np.full((2, S, K), P, np.int64)
    mask = np.zeros((S, K), np.float32)
    s = 0
    for wid in sorted(windows):
        members = windows[wid]
        N = len(members)
        n_sets = math.ceil(N / K)
        # per-axis orders (keys unique within window -> sort is unambiguous)
        order_y = sorted(members, key=lambda p: inwin[p][1] * wx * wz
                         + inwin[p][0] * wz + inwin[p][2])
        order_x = sorted(members, key=lambda p: inwin[p][0] * wy * wz
                         + inwin[p][1] * wz + inwin[p][2])
        for j in range(n_sets):
            if s >= S:
                break
            for k in range(K):
                local = ((j * K + k) * N) // K // n_sets  # Eq.(3)
                inds[0, s, k] = order_y[local]
                inds[1, s, k] = order_x[local]
                if k > 0 and inds[0, s, k] == inds[0, s, k - 1]:
                    mask[s, k] = -3.4028235e38
            s += 1
    return inds, mask, s


# ---------------------------------------------------------------------------
# set attention (dsvt-ai-trt.cpp:288-458)
# ---------------------------------------------------------------------------

def attention_oracle(feats, pos, inds, key_mask, enc, num_heads):
    S, K = inds.shape
    C = feats.shape[1]
    D = C // num_heads
    fe = np.concatenate([feats, np.zeros((1, C), np.float32)])
    pe = np.concatenate([pos, np.zeros((1, C), np.float32)])
    out = np.zeros((S, K, C), np.float32)
    for si in range(S):
        g = fe[inds[si]]
        qk_in = g + pe[inds[si]]
        q = qk_in @ enc["wq"] + enc["bq"]
        k = qk_in @ enc["wk"] + enc["bk"]
        v = g @ enc["wv"] + enc["bv"]
        q = q.reshape(K, num_heads, D).transpose(1, 0, 2) / np.sqrt(D)
        k = k.reshape(K, num_heads, D).transpose(1, 0, 2)
        v = v.reshape(K, num_heads, D).transpose(1, 0, 2)
        logits = q @ k.transpose(0, 2, 1) + key_mask[si][None, None, :]
        logits = logits - logits.max(axis=-1, keepdims=True)
        w = np.exp(logits)
        w = w / w.sum(axis=-1, keepdims=True)
        o = (w @ v).transpose(1, 0, 2).reshape(K, C)
        out[si] = o @ enc["wo"] + enc["bo"]
    return out


def layer_norm_oracle(x, g, b, eps):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * g + b


def gelu_oracle(x):
    a, b, c = 0.5, 0.7978845608028654, 0.035677408136300125
    return (a + a * np.tanh(x * (c * x * x + b))) * x


# ---------------------------------------------------------------------------
# rotated IoU + NMS (helper.h:92-283)
# ---------------------------------------------------------------------------

def _cross(p1, p2, p0):
    return (p1[0] - p0[0]) * (p2[1] - p0[1]) - (p2[0] - p0[0]) * (p1[1] - p0[1])


def _check_box2d(box, p):
    margin = 1e-2
    cx, cy, rt = box[0], box[1], box[6]
    cos, sin = math.cos(-rt), math.sin(-rt)
    rx = (p[0] - cx) * cos + (p[1] - cy) * (-sin)
    ry = (p[0] - cx) * sin + (p[1] - cy) * cos
    return abs(rx) < box[4] / 2 + margin and abs(ry) < box[3] / 2 + margin


def _intersection(p1, p0, q1, q0):
    if not (min(p0[0], p1[0]) <= max(q0[0], q1[0])
            and min(q0[0], q1[0]) <= max(p0[0], p1[0])
            and min(p0[1], p1[1]) <= max(q0[1], q1[1])
            and min(q0[1], q1[1]) <= max(p0[1], p1[1])):
        return None
    s1 = _cross(q0, p1, p0)
    s2 = _cross(p1, q1, p0)
    s3 = _cross(p0, q1, q0)
    s4 = _cross(q1, p1, q0)
    if not (s1 * s2 > 0 and s3 * s4 > 0):
        return None
    s5 = _cross(q1, p1, p0)
    if abs(s5 - s1) > 1e-8:
        return ((s5 * q0[0] - s1 * q1[0]) / (s5 - s1),
                (s5 * q0[1] - s1 * q1[1]) / (s5 - s1))
    a0, b0, c0 = p0[1] - p1[1], p1[0] - p0[0], p0[0] * p1[1] - p1[0] * p0[1]
    a1, b1, c1 = q0[1] - q1[1], q1[0] - q0[0], q0[0] * q1[1] - q1[0] * q0[1]
    D = a0 * b1 - a1 * b0
    return ((b0 * c1 - b1 * c0) / D, (a1 * c0 - a0 * c1) / D)


def _corners(box):
    cx, cy, rt = box[0], box[1], box[6]
    hx, hy = box[4] / 2, box[3] / 2
    pts = [(-hx, -hy), (hx, -hy), (hx, hy), (-hx, hy)]
    cos, sin = math.cos(rt), math.sin(rt)
    return [(ox * cos - oy * sin + cx, ox * sin + oy * cos + cy)
            for ox, oy in pts]


def box_overlap_oracle(box_a, box_b):
    ca = _corners(box_a) + [None]
    cb = _corners(box_b) + [None]
    ca[4] = ca[0]
    cb[4] = cb[0]
    pts = []
    for i in range(4):
        for j in range(4):
            r = _intersection(ca[i + 1], ca[i], cb[j + 1], cb[j])
            if r is not None:
                pts.append(r)
    for k in range(4):
        if _check_box2d(box_a, cb[k]):
            pts.append(cb[k])
        if _check_box2d(box_b, ca[k]):
            pts.append(ca[k])
    cnt = len(pts)
    if cnt < 3:
        return 0.0
    cxm = sum(p[0] for p in pts) / cnt
    cym = sum(p[1] for p in pts) / cnt
    pts.sort(key=lambda p: math.atan2(p[1] - cym, p[0] - cxm))
    area = 0.0
    for k in range(cnt - 1):
        ax, ay = pts[k][0] - pts[0][0], pts[k][1] - pts[0][1]
        bx, by = pts[k + 1][0] - pts[0][0], pts[k + 1][1] - pts[0][1]
        area += ax * by - ay * bx
    return abs(area) / 2.0


def nms_oracle(boxes, count, thresh):
    order = sorted(range(count), key=lambda i: -boxes[i, 8])
    suppressed = [False] * count
    keep = []
    for oi, i in enumerate(order):
        if suppressed[oi]:
            continue
        keep.append(i)
        sa = boxes[i, 3] * boxes[i, 4]
        for oj in range(oi + 1, count):
            j = order[oj]
            if suppressed[oj]:
                continue
            sb = boxes[j, 3] * boxes[j, 4]
            ov = box_overlap_oracle(boxes[i], boxes[j])
            iou = ov / max(sa + sb - ov, 1e-8)
            if iou >= thresh:
                suppressed[oj] = True
    return keep
