"""KITTI odometry dataset handler (stereo pngs, velodyne bins, semantics).

Reference: src/dataset_handler/KittiHandler.cpp. Sequence folder layout:
  <seq>/image_2/*.png, <seq>/image_3/*.png, <seq>/velodyne/*.bin,
  <seq>/image_semantic/*.bin (float32 HxWxC), <seq>/cvo_calib.txt
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np

from unified_cvo_tpu.frontend.calibration import Calibration, read_calibration


class KittiHandler:
    def __init__(self, folder: str, data_type: str = "stereo"):
        self.folder = folder
        sub = "image_2" if data_type == "stereo" else "velodyne"
        names = [
            os.path.splitext(f)[0]
            for f in os.listdir(os.path.join(folder, sub))
            if not f.startswith(".")
        ]
        self.names = sorted(names)
        self.curr_index = 0
        self._loader = None
        self._pending = {}
        try:
            from unified_cvo_tpu import native

            if native.available():
                self._loader = native.PrefetchLoader(2)
        except Exception:
            self._loader = None

    def _read_f32(self, path):
        if self._loader is not None:
            ticket = self._pending.pop(path, None)
            if ticket is None:
                ticket = self._loader.submit(path, 0)
            return self._loader.get(ticket)
        return np.fromfile(path, np.float32)

    def __len__(self):
        return len(self.names)

    def set_start_index(self, idx: int):
        self.curr_index = idx

    def next_frame_index(self):
        return self.curr_index

    def read_next_stereo(self):
        if self.curr_index >= len(self.names):
            return None
        name = self.names[self.curr_index]
        left = cv2.imread(os.path.join(self.folder, "image_2", name + ".png"))
        right = cv2.imread(os.path.join(self.folder, "image_3", name + ".png"))
        if left is None or right is None:
            return None
        return left, right

    def read_next_stereo_semantic(self, num_classes: int = 19):
        pair = self.read_next_stereo()
        if pair is None:
            return None
        left, right = pair
        name = self.names[self.curr_index]
        path = os.path.join(self.folder, "image_semantic", name + ".bin")
        sem = np.fromfile(path, np.float32).reshape(
            left.shape[0], left.shape[1], num_classes
        )
        return left, right, sem

    def read_next_lidar(self):
        """Velodyne [N,4] xyz+intensity, rotated into the camera-style frame
        the reference uses (KittiHandler.cpp:120-145: x<-−y, y<-−z, z<-x)."""
        if self.curr_index >= len(self.names):
            return None
        name = self.names[self.curr_index]
        pts = self._read_f32(
            os.path.join(self.folder, "velodyne", name + ".bin")
        ).reshape(-1, 4)
        # prefetch the next scan on the native IO threads while the chip
        # registers this one
        if self.curr_index + 1 < len(self.names) and self._loader is not None:
            nxt = self.names[self.curr_index + 1]
            p = os.path.join(self.folder, "velodyne", nxt + ".bin")
            if p not in self._pending:
                self._pending[p] = self._loader.submit(p, 0)
        xyz = pts[:, :3]
        rotated = np.stack([-xyz[:, 1], -xyz[:, 2], xyz[:, 0]], axis=1)
        return np.concatenate([rotated, pts[:, 3:4]], axis=1)

    def next(self):
        self.curr_index += 1

    def calibration(self) -> Calibration:
        return read_calibration(os.path.join(self.folder, "cvo_calib.txt"), "stereo")


def write_kitti_pose_row(f, T: np.ndarray):
    """One KITTI-format row: the top 3x4 of the accumulated pose."""
    row = T[:3, :4].reshape(-1)
    f.write(" ".join(f"{v:.9g}" for v in row) + "\n")
    f.flush()


def read_kitti_poses(path: str) -> np.ndarray:
    """[N,4,4] poses from a KITTI-format trajectory file."""
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    n = rows.shape[0]
    out = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    out[:, :3, :4] = rows
    return out
