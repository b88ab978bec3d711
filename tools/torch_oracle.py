"""Independent PyTorch oracle of the reference's exact inference graph.

This file is the parity ground truth demanded by SURVEY §7 hard-part (d): a
re-implementation of the reference TRT engine's semantics (reference:
src/dsvt-ai-trt.cpp:532-1762) written against *torch's own* module semantics
rather than our JAX code.  It deliberately avoids importing anything from
``dsvt_ai_trt_tpu`` — its .wts parser, voxelizer, partition code, and decode
are all re-derived directly from the reference sources cited inline, and the
learned layers are stock ``torch.nn`` modules (``nn.MultiheadAttention``,
``nn.BatchNorm1d/2d``, ``nn.LayerNorm``, ``nn.Conv2d/ConvTranspose2d``) whose
state-dict names line up with the checkpoint contract, so the fused
``in_proj_*`` split, BN folding, and attention algebra are all defined by
torch, not by our reading of the CUDA.

Reference quirks reproduced on purpose (SURVEY §2.4):
  * both attention passes of a block consume the *axis-0* duplicate mask
    (dsvt-ai-trt.cpp:658,708,... always pass get_set_op->getOutput(3));
  * heading decoded as atan(sin/cos), not atan2 (dsvt-ai-trt.cpp:1667-1669);
  * scatter-back is last-writer-wins over set slots
    (mapSetFeature2voxel.cu:258-275) — benign because duplicate slots carry
    identical values (same query row, same keys, same mask);
  * BatchNorm eps: 1e-5 for 1d (cpp:284), 1e-3 for 2d (cpp:191);
  * tanh-approx GELU (params.h:75-77 constants == torch 'tanh' approximation).

Dynamic stages (voxelize / window / set partition) run as plain python loops
shaped like the CUDA kernels, with no static padding at all — the natural
serial emulation of the reference's atomic registries.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Geometry constants (reference: include/params.h:20-84, 326-335)
# ---------------------------------------------------------------------------

PC_MIN = (-74.88, -74.88, -5.0)
PC_MAX = (74.88, 74.88, 3.0)
VOXEL = (0.32, 0.32, 8.0)
GRID = (468, 468, 1)            # (x, y, z)
CAP_PER_PILLAR = 48             # POINTS_NUM_PER_VOXEL
MAX_PILLARS = 10000             # MAX_PILLARS_NUM (params.h:26)
MAX_KEPT_POINTS = 30000         # MAX_POINTS_NUM_1 (params.h:25)
D_MODEL = 192
NUM_HEADS = 8
FFN_DIM = 384
NUM_BLOCKS = 4
SET_SIZE = 36                   # VOXEL_NUM_SET
WINDOWS = (                     # (shape_xyz, shift_xyz) — params.h:52-66
    ((12, 12, 1), (0, 0, 0)),
    ((24, 24, 1), (6, 6, 0)),
)
NUM_CLASSES = 10
TOP_K = 500
SCORE_THRESHOLD = 0.3
NEG_INF = -3.4028235e38         # getSet.cu:541-566 mask value


# ---------------------------------------------------------------------------
# .wts parsing — independent re-derivation of gen_wts.py:86-99's format.
# Keeps fused in_proj blobs fused (torch's MultiheadAttention wants them so).
# ---------------------------------------------------------------------------


def parse_wts(path: str) -> Dict[str, np.ndarray]:
    """First line: tensor count; then ``name length hex...`` with
    big-endian float32 hex words."""
    out: Dict[str, np.ndarray] = {}
    with open(path) as f:
        count = int(f.readline())
        for _ in range(count):
            fields = f.readline().split()
            name, n = fields[0], int(fields[1])
            buf = bytes.fromhex("".join(w.zfill(8) for w in fields[2:2 + n]))
            out[name] = np.frombuffer(buf, dtype=">f4").astype(np.float32)
    return out


def load_bin(path: str) -> np.ndarray:
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


# ---------------------------------------------------------------------------
# torch model shell: module tree named exactly like the upstream checkpoint
# ---------------------------------------------------------------------------


def _bn1d(c):
    return nn.BatchNorm1d(c, eps=1e-5)       # add_batchNorm1d_relu, cpp:284


def _bn2d(c):
    return nn.BatchNorm2d(c, eps=1e-3)       # addBatchNorm2d, cpp:191


class _PFNLayer(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.linear = nn.Linear(cin, cout, bias=False)
        self.norm = _bn1d(cout)


class _WinAttn(nn.Module):
    """encoder_list.{e}.win_attn — names match the upstream DSVT encoder."""

    def __init__(self):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(D_MODEL, NUM_HEADS)
        self.norm1 = nn.LayerNorm(D_MODEL)
        self.norm2 = nn.LayerNorm(D_MODEL)
        self.linear1 = nn.Linear(D_MODEL, FFN_DIM)
        self.linear2 = nn.Linear(FFN_DIM, D_MODEL)


class _Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.win_attn = _WinAttn()
        self.norm = nn.LayerNorm(D_MODEL)


class _Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder_list = nn.ModuleList([_Encoder(), _Encoder()])


class _PosEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        # indices .0 (linear), .1 (bn), .3 (linear) match
        # position_embedding_head.{0,1,3} (cpp:603-637)
        self.position_embedding_head = nn.Sequential(
            nn.Linear(2, D_MODEL), _bn1d(D_MODEL), nn.ReLU(),
            nn.Linear(D_MODEL, D_MODEL))

    def forward(self, xy):
        return self.position_embedding_head(xy)


class _ResUnit(nn.Module):
    def __init__(self, cin, cout, stride, downsample):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = _bn2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = _bn2d(cout)
        if downsample:
            self.downsample_layer = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, 0, bias=False), _bn2d(cout))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        sc = self.downsample_layer(x) if hasattr(self, "downsample_layer") else x
        return F.relu(h + sc)


HEAD_BRANCHES = (("center", 2), ("center_z", 1), ("dim", 3),
                 ("rot", 2), ("iou", 1), ("hm", NUM_CLASSES))


class DSVTOracle(nn.Module):
    """Learned-layer shell; the dynamic graph lives in ``run_oracle``."""

    def __init__(self):
        super().__init__()
        self.vfe = nn.Module()
        self.vfe.pfn_layers = nn.ModuleList(
            [_PFNLayer(10, 96), _PFNLayer(192, 192)])

        bb3 = nn.Module()
        bb3.input_layer = nn.Module()
        bb3.input_layer.posembed_layers = nn.ModuleList([nn.ModuleList(
            [nn.ModuleList([_PosEmbed(), _PosEmbed()])
             for _ in range(NUM_BLOCKS)])])
        bb3.stage_0 = nn.ModuleList([_Block() for _ in range(NUM_BLOCKS)])
        bb3.residual_norm_stage_0 = nn.ModuleList(
            [nn.LayerNorm(D_MODEL) for _ in range(NUM_BLOCKS)])
        self.backbone_3d = bb3

        bb2 = nn.Module()
        stages = []
        # (units, channels, first stride): cpp:1140-1364 / params.h:86-233
        cin = D_MODEL
        for units, ch, stride in ((2, 128, 1), (3, 128, 2), (3, 256, 2)):
            stage = nn.ModuleList()
            for u in range(units):
                stage.append(_ResUnit(cin if u == 0 else ch, ch,
                                      stride if u == 0 else 1, u == 0))
            stages.append(stage)
            cin = ch
        bb2.blocks = nn.ModuleList(stages)
        bb2.deblocks = nn.ModuleList()
        for src_ch, k in ((128, 1), (128, 2), (256, 4)):
            bb2.deblocks.append(nn.Sequential(
                nn.ConvTranspose2d(src_ch, 128, k, k, 0, bias=False),
                _bn2d(128), nn.ReLU()))
        self.backbone_2d = bb2

        dh = nn.Module()
        dh.shared_conv = nn.Sequential(
            nn.Conv2d(384, 64, 3, 1, 1, bias=False), _bn2d(64), nn.ReLU())
        heads = nn.ModuleDict()
        for name, c in HEAD_BRANCHES:
            heads[name] = nn.Sequential(
                nn.Sequential(nn.Conv2d(64, 64, 3, 1, 1, bias=False),
                              _bn2d(64), nn.ReLU()),
                nn.Conv2d(64, c, 3, 1, 1, bias=True))
        dh.heads_list = nn.ModuleList([heads])
        self.dense_head = dh

    def load_wts(self, path: str) -> None:
        raw = parse_wts(path)
        state = self.state_dict()
        new_state = {}
        for key, tensor in state.items():
            if key.endswith("num_batches_tracked"):
                new_state[key] = tensor
                continue
            src = raw["module." + key]
            assert src.size == tensor.numel(), (
                f"{key}: wts has {src.size} values, model wants {tensor.numel()}")
            new_state[key] = torch.from_numpy(
                src.reshape(tuple(tensor.shape)).copy())
        self.load_state_dict(new_state)
        self.eval()


# ---------------------------------------------------------------------------
# Dynamic stages — serial emulations of the CUDA kernels
# ---------------------------------------------------------------------------


def voxelize(points: np.ndarray):
    """points [N,4] -> (point_feats [M,10], point_pillar [M], coords [P,2],
    counts [P]).  Serial emulation of points2Features.cu:669-865: membership
    = first 48 in-range points per cell in file order; pillars in
    first-arrival order; cluster mean over the capped membership."""
    # cell binning by exact comparison against the fp32 cell-edge table —
    # the same rule as dsvt_ai_trt_tpu.ops.voxelize.  The reference's
    # floorf((x-min)/size) (points2Features.cu:687-688) bins points within
    # one ulp of a cell edge by the fp32 quotient's rounding, which is not
    # reproducible across compilers/backends (XLA rewrites it, the TPU
    # divide is Newton-iterated); the edge-table rule is bit-deterministic
    # everywhere and differs from the CUDA binary only for that sub-ulp
    # boundary class (documented divergence).
    f32 = np.float32
    xmin, ymin, zmin = map(f32, PC_MIN)
    xmax, ymax, zmax = map(f32, PC_MAX)
    vx, vy, vz = map(f32, VOXEL)
    gx = GRID[0]

    def edges(vmin, vsize, n):
        return (np.float64(vmin) + np.float64(vsize) * np.arange(n + 1)).astype(f32)

    pix = np.searchsorted(edges(PC_MIN[0], VOXEL[0], GRID[0]),
                          points[:, 0], side="right") - 1
    piy = np.searchsorted(edges(PC_MIN[1], VOXEL[1], GRID[1]),
                          points[:, 1], side="right") - 1
    piz = np.searchsorted(edges(PC_MIN[2], VOXEL[2], GRID[2]),
                          points[:, 2], side="right") - 1
    pix = np.clip(pix, 0, GRID[0] - 1)
    piy = np.clip(piy, 0, GRID[1] - 1)
    piz = np.clip(piz, 0, GRID[2] - 1)

    groups: Dict[int, List[int]] = {}
    for i in range(points.shape[0]):
        x, y, z = points[i, 0], points[i, 1], points[i, 2]
        if not (xmin <= x < xmax and ymin <= y < ymax and zmin <= z < zmax):
            continue
        cell = piy[i] * gx + pix[i]
        members = groups.setdefault(int(cell), [])
        if len(members) < CAP_PER_PILLAR:          # points2Features.cu:697-699
            members.append(i)

    feats, point_pillar, coords, counts = [], [], [], []
    half = f32(0.5)
    # compaction caps (buffer sizes in the reference; its kernels bound-
    # check NEITHER counter — generateBaseFeatures_kernel atomicAdds
    # pillar_num without limit (points2Features.cu:751) and
    # generateFeatures_kernel atomicAdds point_num without limit (cu:829),
    # so exceeding MAX_PILLARS_NUM / MAX_POINTS_NUM_1 is a buffer overflow
    # there.  The sane emulation truncates at the buffer sizes; on the
    # bundled frames neither cap binds (asserted by
    # tests/test_oracle_parity.py::test_voxelizer_caps_nonbinding).
    point_budget = MAX_KEPT_POINTS
    for pid, (cell, members) in enumerate(groups.items()):
        if pid >= MAX_PILLARS:
            break
        if point_budget <= 0:
            break
        members = members[:point_budget]
        point_budget -= len(members)
        pts = points[members]                       # capped membership
        mean = pts[:, :3].mean(axis=0).astype(f32)  # cluster center (cu:812-825)
        for j, p in zip(members, pts):
            fc = (p[0] - ((f32(pix[j]) + half) * vx + xmin),
                  p[1] - ((f32(piy[j]) + half) * vy + ymin),
                  p[2] - ((f32(piz[j]) + half) * vz + zmin))  # cu:848-853
            feats.append([p[0], p[1], p[2], p[3],
                          p[0] - mean[0], p[1] - mean[1], p[2] - mean[2],
                          fc[0], fc[1], fc[2]])     # layout cu:833-861
            point_pillar.append(pid)
        coords.append((cell // gx, cell % gx))      # (iy, ix)
        counts.append(len(members))
    return (np.asarray(feats, np.float32), np.asarray(point_pillar),
            np.asarray(coords, np.int64), np.asarray(counts))


def scatter_max(point_feats: torch.Tensor, point_pillar: np.ndarray,
                n_pillars: int):
    """torchScatterMax.cu:201-259: per-pillar channelwise max, broadcast back."""
    C = point_feats.shape[1]
    vmax = torch.full((n_pillars, C), -1e6)
    idx = torch.from_numpy(point_pillar)
    vmax = vmax.scatter_reduce(0, idx[:, None].expand(-1, C), point_feats,
                               reduce="amax", include_self=True)
    return vmax[idx], vmax


def window_partition(coords: np.ndarray, shape, shift):
    """windowPartition.cu:278-381: first-arrival window registry; returns
    (win_members: list of pillar-id lists, keys_y [P], keys_x [P],
    xy_centered [P,2])."""
    wx, wy, wz = shape
    sx, sy, _sz = shift
    nwx = GRID[0] // wx + 1                         # windowPartition.cu:425-427

    win_of: Dict[int, int] = {}
    members: List[List[int]] = []
    P = coords.shape[0]
    key_y = np.empty(P, np.int64)
    key_x = np.empty(P, np.int64)
    xy_c = np.empty((P, 2), np.float32)
    for pid in range(P):
        iy, ix = coords[pid]
        sxx, syy = ix + sx, iy + sy
        win = (syy // wy) * nwx + (sxx // wx)
        cx, cy, cz = sxx % wx, syy % wy, 0
        key_y[pid] = cy * (wx * wz) + cx * wz + cz  # getSet.cu:386
        key_x[pid] = cx * (wy * wz) + cy * wz + cz  # getSet.cu:461
        xy_c[pid] = (cx - wx / 2.0, cy - wy / 2.0)  # windowPartition.cu:367-368
        if win not in win_of:
            win_of[win] = len(members)
            members.append([])
        members[win_of[win]].append(pid)
    return members, key_y, key_x, xy_c


def set_partition(members, key_y, key_x):
    """getSet.cu:326-609: per-window sorts + Eq.(3) spreading.  Returns
    (inds [2, nset, 36] int64, mask0 [nset, 36] float32) — mask0 is the
    axis-0 duplicate mask, the only one the reference ever consumes."""
    inds_y, inds_x, mask0 = [], [], []
    for mem in members:
        mem = np.asarray(mem)
        n = len(mem)
        nsets = (n + SET_SIZE - 1) // SET_SIZE      # getLocalIndex, ceil
        sorted_y = mem[np.argsort(key_y[mem], kind="stable")]
        sorted_x = mem[np.argsort(key_x[mem], kind="stable")]
        for j in range(nsets):
            row_y, row_x, row_m = [], [], []
            prev = -1
            for k in range(SET_SIZE):
                local = ((j * SET_SIZE + k) * n) // SET_SIZE // nsets  # Eq.(3)
                row_y.append(sorted_y[local])
                row_x.append(sorted_x[local])
                # duplicate mask from repeated *global* ids (getSet.cu:541-566);
                # keys are unique per window so this equals local-index repeats
                row_m.append(NEG_INF if (k > 0 and row_y[-1] == prev) else 0.0)
                prev = row_y[-1]
            inds_y.append(row_y)
            inds_x.append(row_x)
            mask0.append(row_m)
    return (np.asarray([inds_y, inds_x], np.int64),
            np.asarray(mask0, np.float32))


def attention_pass(x: torch.Tensor, pos: torch.Tensor, inds: np.ndarray,
                   mask0: np.ndarray, enc: _Encoder) -> torch.Tensor:
    """One encoder pass: gather -> nn.MultiheadAttention -> last-writer
    scatter-back -> LN/FFN/LN/add/LN (dsvt-ai-trt.cpp:648-757)."""
    idx = torch.from_numpy(inds)                     # [nset, 36]
    qk = (x + pos)[idx]                              # getValueByIndex.cu:296-300
    v = x[idx]
    nset = idx.shape[0]

    # torch MHA wants (L, N, E); mask (N*heads, L, S), additive
    mask = torch.from_numpy(mask0)[:, None, None, :].expand(
        nset, NUM_HEADS, SET_SIZE, SET_SIZE).reshape(
        nset * NUM_HEADS, SET_SIZE, SET_SIZE)
    out, _ = enc.win_attn.self_attn(
        qk.transpose(0, 1), qk.transpose(0, 1), v.transpose(0, 1),
        attn_mask=mask, need_weights=False)
    out = out.transpose(0, 1)                        # [nset, 36, C]

    # last-writer-wins scatter (mapSetFeature2voxel.cu:258-275)
    res = torch.zeros_like(x)
    flat_idx = idx.reshape(-1)
    res[flat_idx] = out.reshape(-1, D_MODEL)

    w = enc.win_attn
    x1 = w.norm1(x + res)
    ffn = w.linear2(F.gelu(w.linear1(x1), approximate="tanh"))
    x2 = w.norm2(x1 + ffn)
    return enc.norm(x2 + x)


# ---------------------------------------------------------------------------
# End-to-end forward
# ---------------------------------------------------------------------------


@torch.no_grad()
def run_oracle(model: DSVTOracle, points: np.ndarray,
               parity_atan: bool = True) -> np.ndarray:
    """points [N,4] -> boxes [n, 9] = (x,y,z,dx,dy,dz,heading,class,score),
    post score/range filter, pre NMS (= the engine's OUTPUT_VOXELS binding,
    filterBoxByScore.cu:266-309)."""
    point_feats, point_pillar, coords, _counts = voxelize(points)
    P = coords.shape[0]

    # PFN (cpp:577-590)
    pf = torch.from_numpy(point_feats)
    l0 = model.vfe.pfn_layers[0]
    h = F.relu(l0.norm(l0.linear(pf)))
    h_max, _ = scatter_max(h, point_pillar, P)
    h = torch.cat([h, h_max], dim=1)
    l1 = model.vfe.pfn_layers[1]
    h = F.relu(l1.norm(l1.linear(h)))
    _, x = scatter_max(h, point_pillar, P)           # [P, 192]

    # partitions (cpp:592-601)
    parts = []
    for shape, shift in WINDOWS:
        members, key_y, key_x, xy_c = window_partition(coords, shape, shift)
        inds, mask0 = set_partition(members, key_y, key_x)
        parts.append({"inds": inds, "mask0": mask0, "xy": xy_c})

    # pos-embeds: posembed_layers.0.{b}.{e}(window_partition_{e}.xy) (cpp:603-637)
    pos = [[model.backbone_3d.input_layer.posembed_layers[0][b][e](
        torch.from_numpy(parts[e]["xy"])) for e in range(2)]
        for b in range(NUM_BLOCKS)]

    # 4 DSVT blocks: block b uses get_set_op_{b%2}; BOTH passes use that
    # op's axis-0 mask (cpp:658,708,778,828,...)
    for b in range(NUM_BLOCKS):
        sp = parts[b % 2]
        x_in = x
        for e in range(2):
            enc = model.backbone_3d.stage_0[b].encoder_list[e]
            x = attention_pass(x, pos[b][e], sp["inds"][e], sp["mask0"], enc)
        x = model.backbone_3d.residual_norm_stage_0[b](x + x_in)

    # map2bev (map2bev.cu:250-266) + NCHW transpose (cpp:1132-1133)
    bev = torch.zeros(GRID[1], GRID[0], D_MODEL)
    bev[coords[:, 0], coords[:, 1]] = x
    bev = bev.permute(2, 0, 1)[None]                 # [1, 192, H, W]

    # 2D backbone (cpp:1140-1364)
    laterals = []
    for s, stage in enumerate(model.backbone_2d.blocks):
        for unit in stage:
            bev = unit(bev)
        laterals.append(model.backbone_2d.deblocks[s](bev))
    feat = torch.cat(laterals, dim=1)                # [1, 384, H, W]

    # CenterHead (cpp:1369-1468)
    shared = model.dense_head.shared_conv(feat)
    heads = {name: model.dense_head.heads_list[0][name](shared)
             for name, _ in HEAD_BRANCHES}

    # decode (cpp:1471-1691)
    H, W = GRID[1], GRID[0]
    hm = torch.sigmoid(heads["hm"])[0].reshape(NUM_CLASSES, H * W)
    cls_scores, cls_inds = torch.topk(hm, TOP_K, dim=1)
    scores, sel = torch.topk(cls_scores.reshape(-1), TOP_K)
    classes = sel // TOP_K                           # cpp:1571
    inds = cls_inds.reshape(-1)[sel]
    ys = (inds // W).float()
    xs = (inds % W).float()

    def gather(name):
        t = heads[name][0]                           # [c, H, W]
        return t.reshape(t.shape[0], -1)[:, inds].T  # [K, c]

    center = gather("center")
    center_z = gather("center_z")[:, 0]
    dim = torch.exp(gather("dim"))                   # cpp:1487
    rot = gather("rot")
    if parity_atan:
        heading = torch.atan(rot[:, 1] / rot[:, 0])  # cpp:1667-1669
    else:
        heading = torch.atan2(rot[:, 1], rot[:, 0])

    vx, vy, _ = VOXEL
    x_m = (xs + center[:, 0]) * vx + PC_MIN[0]
    y_m = (ys + center[:, 1]) * vy + PC_MIN[1]
    keep = ((x_m >= PC_MIN[0]) & (x_m < PC_MAX[0])
            & (y_m >= PC_MIN[1]) & (y_m < PC_MAX[1])
            & (center_z >= PC_MIN[2]) & (center_z < PC_MAX[2])
            & (scores >= SCORE_THRESHOLD))           # filterBoxByScore.cu:288-296

    boxes = torch.stack([x_m, y_m, center_z, dim[:, 0], dim[:, 1], dim[:, 2],
                         heading, classes.float(), scores], dim=1)
    return boxes[keep].numpy()


def main():
    import argparse
    ap = argparse.ArgumentParser(description="Run the torch oracle on frames")
    ap.add_argument("--wts", required=True)
    ap.add_argument("frames", nargs="+")
    args = ap.parse_args()
    torch.set_num_threads(max(torch.get_num_threads(), 4))
    model = DSVTOracle()
    model.load_wts(args.wts)
    for path in args.frames:
        boxes = run_oracle(model, load_bin(path))
        print(f"{path}: {boxes.shape[0]} boxes")
        for b in boxes:
            print("  " + ",".join(f"{v:.4f}" for v in b))


if __name__ == "__main__":
    main()
