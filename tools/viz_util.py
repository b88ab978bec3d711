"""Lidar/box drawing helpers (matplotlib).

Counterpart of the reference's tools/mayavi_tool/viz_util.py
(draw_lidar_simple :18, draw_lidar :38, draw_gt_boxes3d :94) for headless
environments: BEV axes instead of an interactive Mayavi scene.
"""

from __future__ import annotations

import numpy as np


def _ax(fig_size=(10, 10)):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=fig_size)
    ax.set_aspect("equal")
    ax.set_facecolor("black")
    return fig, ax


def draw_lidar_simple(points: np.ndarray, ax=None, color_by: int = 2):
    """Scatter a point cloud in BEV, colored by the given column
    (default: height, like the reference's color=pc[:,2])."""
    fig = None
    if ax is None:
        fig, ax = _ax()
    ax.scatter(points[:, 0], points[:, 1], s=0.2, c=points[:, color_by],
               cmap="viridis", alpha=0.6, linewidths=0)
    return fig, ax


def draw_lidar(points: np.ndarray, ax=None):
    fig, ax = draw_lidar_simple(points, ax)
    if ax is not None:
        ax.set_xlim(-75, 75)
        ax.set_ylim(-75, 75)
    return fig, ax


def draw_boxes3d(corners_list, ax, color="r", labels=None):
    """Draw a list of [8, 3] corner arrays (compute_box_3d output) as their
    BEV footprints (the bottom face, corners 0..3)."""
    for i, corners in enumerate(corners_list):
        footprint = np.asarray(corners)[:4, :2]
        loop = np.vstack([footprint, footprint[:1]])
        ax.plot(loop[:, 0], loop[:, 1], color=color, linewidth=1.0)
        if labels is not None:
            cx, cy = footprint.mean(axis=0)
            ax.text(cx, cy, str(labels[i]), color="yellow", fontsize=6)
    return ax
