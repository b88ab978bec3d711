"""Visualize detections over the point cloud.

Plays the role of the reference's Mayavi viewer
(tools/show_box_in_points.py there; box corner math at :12-54 uses
rotz(-rt)).  Mayavi is interactive and unavailable headless, so this tool
renders matplotlib BEV images (and optionally dumps corner JSON) instead.

Usage:
  python tools/show_box_in_points.py --data /root/reference/data/bin \
      --outputs outputs --save-dir viz
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dsvt_ai_trt_tpu.io.pointcloud import load_bin, frame_paths  # noqa: E402
from dsvt_ai_trt_tpu.io.output import load_txt  # noqa: E402


def box_corners_bev(row: np.ndarray) -> np.ndarray:
    """BEV corners for one result row (x,y,z,l,w,h,rt,id,score).

    Matches the reference viewer's convention: l along the heading axis
    after rotation by -rt about z (kitti-style compute_box_3d with rotz(-rt),
    reference tools/show_box_in_points.py:12-54 swaps to w,l order)."""
    x, y, _z, l, w = row[0], row[1], row[2], row[3], row[4]
    rt = row[6]
    ox = np.array([-w / 2, w / 2, w / 2, -w / 2])
    oy = np.array([-l / 2, -l / 2, l / 2, l / 2])
    c, s = np.cos(rt), np.sin(rt)
    return np.stack([ox * c - oy * s + x, ox * s + oy * c + y], -1)


def render_frame(points: np.ndarray, boxes: np.ndarray, path: str,
                 title: str = "") -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10))
    ax.scatter(points[:, 0], points[:, 1], s=0.2, c=points[:, 2],
               cmap="viridis", alpha=0.5, linewidths=0)
    for row in boxes:
        corners = box_corners_bev(row)
        loop = np.vstack([corners, corners[:1]])
        ax.plot(loop[:, 0], loop[:, 1], "r-", linewidth=1.0)
        ax.text(row[0], row[1], f"{int(row[7])}", color="yellow", fontsize=6)
    ax.set_aspect("equal")
    ax.set_title(title)
    ax.set_xlim(-75, 75)
    ax.set_ylim(-75, 75)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def box_corners_3d(row: np.ndarray) -> np.ndarray:
    """8 xyz corners for one result row, bottom face first.

    Same convention as the reference viewer's compute_box_3d
    (tools/show_box_in_points.py:12-54 there: rotz(-rt), z at box bottom,
    l<->w swapped into the txt row by helper.h:470-481)."""
    x, y, z, l, w, h = row[:6]
    rt = row[6]
    ox = np.array([-w, w, w, -w, -w, w, w, -w]) / 2
    oy = np.array([-l, -l, l, l, -l, -l, l, l]) / 2
    oz = np.array([0.0, 0, 0, 0, h, h, h, h])
    c, s = np.cos(rt), np.sin(rt)
    return np.stack([ox * c - oy * s + x, ox * s + oy * c + y, oz + z], -1)


_BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
              (0, 4), (1, 5), (2, 6), (3, 7)]


def render_frame_3d(points: np.ndarray, boxes: np.ndarray, path: str,
                    title: str = "", max_points: int = 30000) -> None:
    """Headless 3D counterpart of the Mayavi scene: point cloud scatter with
    box wireframes (the reference's draw_gt_boxes3d, mayavi_tool/viz_util.py:94)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = points[:: max(1, len(points) // max_points)]
    fig = plt.figure(figsize=(12, 9))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.1, c=pts[:, 2],
               cmap="viridis", alpha=0.4, linewidths=0)
    for row in boxes:
        corners = box_corners_3d(row)
        for a, b in _BOX_EDGES:
            ax.plot(*zip(corners[a], corners[b]), "r-", linewidth=1.0)
    ax.set_title(title)
    ax.set_xlim(-60, 60)
    ax.set_ylim(-60, 60)
    ax.set_zlim(-5, 10)
    ax.set_box_aspect((1, 1, 0.12))
    ax.view_init(elev=35, azim=-60)
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/data/bin")
    ap.add_argument("--outputs", default="outputs")
    ap.add_argument("--save-dir", default="viz")
    ap.add_argument("--json", action="store_true",
                    help="also dump box corners as json")
    ap.add_argument("--three-d", action="store_true",
                    help="also render a 3D wireframe view per frame")
    ap.add_argument("--html", metavar="PATH",
                    help="write ONE self-contained interactive WebGL viewer "
                         "(all frames embedded; the Mayavi-scene counterpart "
                         "— orbit/zoom/pan, arrow keys step frames)")
    args = ap.parse_args()

    os.makedirs(args.save_dir, exist_ok=True)
    html_frames = []
    for bin_path in frame_paths(args.data):
        name = os.path.splitext(os.path.basename(bin_path))[0]
        txt = os.path.join(args.outputs, name + ".txt")
        if not os.path.exists(txt):
            continue
        pts, n = load_bin(bin_path, 60000)
        seconds, boxes = load_txt(txt)
        out_png = os.path.join(args.save_dir, name + ".png")
        render_frame(pts[:n], boxes, out_png,
                     title=f"{name}: {len(boxes)} boxes, {seconds*1e3:.1f} ms")
        if args.three_d:
            render_frame_3d(pts[:n], boxes,
                            os.path.join(args.save_dir, name + "_3d.png"),
                            title=f"{name}: {len(boxes)} boxes")
        if args.json:
            corners = {str(i): box_corners_bev(b).tolist()
                       for i, b in enumerate(boxes)}
            with open(os.path.join(args.save_dir, name + ".json"), "w") as f:
                json.dump(corners, f)
        if args.html:
            html_frames.append({"name": name, "points": pts[:n],
                                "boxes": boxes, "seconds": seconds})
        print(f"{name}: {len(boxes)} boxes -> {out_png}")
    if args.html and html_frames:
        from html_viewer import write_html
        write_html(html_frames, args.html)
        print(f"interactive viewer ({len(html_frames)} frames) -> {args.html}")


if __name__ == "__main__":
    main()
