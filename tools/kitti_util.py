"""KITTI calibration / label utilities for the visualization tools.

Counterpart of the reference's tools/kitti_util.py (Object3d at :12,
Calibration at :49, rotation helpers at :219-244, projection helpers below
that) — reimplemented on plain NumPy with no cv2 dependency.
"""

from __future__ import annotations

import numpy as np


class Object3d:
    """One KITTI label line."""

    def __init__(self, label_line: str):
        data = label_line.split(" ")
        self.type = data[0]
        vals = [float(x) for x in data[1:]]
        self.truncation = vals[0]
        self.occlusion = int(vals[1])
        self.alpha = vals[2]
        self.xmin, self.ymin, self.xmax, self.ymax = vals[3:7]
        self.box2d = np.array(vals[3:7])
        self.h, self.w, self.l = vals[7:10]
        self.t = tuple(vals[10:13])   # location (x, y, z) in camera coords
        self.ry = vals[13]
        self.score = vals[14] if len(vals) > 14 else 1.0

    def __repr__(self):
        return (f"Object3d({self.type}, t={self.t}, lwh=({self.l},{self.w},"
                f"{self.h}), ry={self.ry})")


def rotx(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def roty(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def rotz(t: float) -> np.ndarray:
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def transform_from_rot_trans(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    R = R.reshape(3, 3)
    t = t.reshape(3, 1)
    return np.vstack((np.hstack([R, t]), [0, 0, 0, 1]))


def inverse_rigid_trans(Tr: np.ndarray) -> np.ndarray:
    inv = np.zeros_like(Tr)
    inv[0:3, 0:3] = Tr[0:3, 0:3].T
    inv[0:3, 3] = -Tr[0:3, 0:3].T @ Tr[0:3, 3]
    inv[3, 3] = 1.0 if Tr.shape[0] == 4 else inv[3, 3]
    return inv


class Calibration:
    """KITTI calib file: P2 projection, velodyne->camera transform, R0."""

    def __init__(self, calib_filepath: str):
        calibs = self._read_calib_file(calib_filepath)
        self.P = calibs["P2"].reshape(3, 4)
        self.V2C = calibs["Tr_velo_to_cam"].reshape(3, 4)
        self.C2V = inverse_rigid_trans(
            np.vstack([self.V2C, [0, 0, 0, 1]]))[:3, :]
        self.R0 = calibs["R0_rect"].reshape(3, 3)
        self.c_u = self.P[0, 2]
        self.c_v = self.P[1, 2]
        self.f_u = self.P[0, 0]
        self.f_v = self.P[1, 1]

    @staticmethod
    def _read_calib_file(filepath: str) -> dict:
        data = {}
        with open(filepath) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                key, value = line.split(":", 1)
                try:
                    data[key] = np.array([float(x) for x in value.split()])
                except ValueError:
                    pass
        return data

    @staticmethod
    def cart2hom(pts_3d: np.ndarray) -> np.ndarray:
        return np.hstack((pts_3d, np.ones((pts_3d.shape[0], 1))))

    def project_velo_to_ref(self, pts: np.ndarray) -> np.ndarray:
        return self.cart2hom(pts) @ self.V2C.T

    def project_ref_to_velo(self, pts: np.ndarray) -> np.ndarray:
        return self.cart2hom(pts) @ self.C2V.T

    def project_ref_to_rect(self, pts: np.ndarray) -> np.ndarray:
        return (self.R0 @ pts.T).T

    def project_rect_to_ref(self, pts: np.ndarray) -> np.ndarray:
        return (np.linalg.inv(self.R0) @ pts.T).T

    def project_velo_to_rect(self, pts: np.ndarray) -> np.ndarray:
        return self.project_ref_to_rect(self.project_velo_to_ref(pts))

    def project_rect_to_velo(self, pts: np.ndarray) -> np.ndarray:
        return self.project_ref_to_velo(self.project_rect_to_ref(pts))

    def project_rect_to_image(self, pts: np.ndarray) -> np.ndarray:
        pts_hom = self.cart2hom(pts) @ self.P.T
        pts_hom[:, 0] /= pts_hom[:, 2]
        pts_hom[:, 1] /= pts_hom[:, 2]
        return pts_hom[:, :2]

    def project_velo_to_image(self, pts: np.ndarray) -> np.ndarray:
        return self.project_rect_to_image(self.project_velo_to_rect(pts))


def compute_box_3d(center, lwh, heading) -> np.ndarray:
    """8 corners of a 3D box in velodyne coords (z up), heading about z.

    Matches the result-txt convention used by the viewer (rotz(-rt),
    reference tools/show_box_in_points.py:12-54).
    """
    l, w, h = lwh
    x = np.array([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2])
    y = np.array([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2])
    z = np.array([0, 0, 0, 0, h, h, h, h]) - h / 2
    corners = rotz(-heading) @ np.vstack([x, y, z])
    return (corners + np.asarray(center).reshape(3, 1)).T
