"""DataLoader facade: per-frame (pose, colorized cloud, image).

Host-side equivalent of dataloader::DataLoader::get_item
(data_loader.cpp:113-330): read the image, read the LiDAR/depth cloud,
colorize by projection, and hand back world-frame points + colors. Dataset
dispatch mirrors the reference's type enum (data_loader.cpp:14-43) — Kitti=3
and Spires=5 were the only constructible types there; we add Replica/TUM for
the known-pose RGB-D modes the Photo-SLAM configs cover.

The colorization itself runs as a jitted JAX op (ops/colorize.py) on
fixed-capacity padded clouds so the per-frame ingest never recompiles.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.colorize import colorize_pointcloud
from .base_parser import FrameSet, load_depth, load_image_rgb
from .kitti import KittiParser
from .pointcloud_io import read_points
from .replica import ReplicaParser, backproject_depth
from .spires import SpiresParser
from .tum import TumParser

DATASET_TYPES = {
    "replica": 0,
    "kitti": 3,
    "spires": 5,
    "tum": 6,
    "euroc": 7,
}


class FrameData(NamedTuple):
    cam_pose: np.ndarray  # [4,4] T_world_cam
    points: np.ndarray  # [M, 3] world-frame colorized points
    colors: np.ndarray  # [M, 3] float RGB
    image: np.ndarray  # [H, W, 3] float RGB


@functools.partial(jax.jit, static_argnums=(5,))
def _colorize_padded(points, image, proj, tr, lidar_pose, _cap):
    return colorize_pointcloud(points, image, proj, tr, lidar_pose)


class DataLoader:
    """Streams frames of any supported dataset."""

    def __init__(
        self,
        dataset_path: str | Path,
        dataset_type: str,
        cloud_capacity: int = 1 << 17,
        cloud_stride: int = 1,
    ):
        self.type = dataset_type
        self.cloud_capacity = cloud_capacity
        self.cloud_stride = cloud_stride
        if dataset_type == "kitti":
            self.parser = KittiParser(dataset_path)
        elif dataset_type == "spires":
            self.parser = SpiresParser(dataset_path)
        elif dataset_type == "replica":
            self.parser = ReplicaParser(dataset_path)
        elif dataset_type == "tum":
            self.parser = TumParser(dataset_path)
        elif dataset_type == "euroc":
            from .euroc import EurocParser

            self.parser = EurocParser(dataset_path)
        else:
            raise ValueError(f"unsupported dataset type: {dataset_type}")
        self.frames: FrameSet = self.parser.frames()

    def __len__(self) -> int:
        return len(self.frames)

    # -- lidar datasets ----------------------------------------------------
    def _get_item_lidar(self, idx: int) -> FrameData:
        fr = self.frames
        image = load_image_rgb(fr.color_files[idx])
        pts = read_points(fr.depth_files[idx])[:: self.cloud_stride]
        cam_pose = fr.color_poses[idx]
        lidar_pose = fr.depth_poses[idx]

        intr = fr.intrinsics
        if self.type == "kitti":
            proj = self.parser.P.astype(np.float32)
            tr = self.parser.Tr.astype(np.float32)
        else:
            # Generic: project with K through T_cam_lidar = inv(T_W_C) @ T_W_L.
            k = np.array(
                [[intr.fx, 0, intr.cx, 0], [0, intr.fy, intr.cy, 0], [0, 0, 1, 0]],
                np.float32,
            )
            proj = k[:3, :4]
            tr = (np.linalg.inv(cam_pose.astype(np.float64)) @ lidar_pose).astype(
                np.float32
            )

        cap = self.cloud_capacity
        m = min(len(pts), cap)
        padded = np.zeros((cap, 3), np.float32)
        padded[:m] = pts[:m]
        out = _colorize_padded(
            jnp.asarray(padded), jnp.asarray(image), jnp.asarray(proj),
            jnp.asarray(tr), jnp.asarray(lidar_pose), cap,
        )
        valid = np.array(out.valid)  # copy: jax buffers are read-only
        valid[m:] = False
        return FrameData(
            cam_pose=cam_pose,
            points=np.asarray(out.points_world)[valid],
            colors=np.asarray(out.colors)[valid],
            image=image,
        )

    # -- rgbd datasets -----------------------------------------------------
    def _get_item_rgbd(self, idx: int) -> FrameData:
        fr = self.frames
        image = load_image_rgb(fr.color_files[idx])
        depth = load_depth(fr.depth_files[idx], self.parser.depth_scale)
        stride = max(self.cloud_stride, 1)
        pts_cam = backproject_depth(depth, fr.intrinsics, stride=stride)
        cam_pose = fr.color_poses[idx].astype(np.float64)
        pts_world = pts_cam @ cam_pose[:3, :3].T + cam_pose[:3, 3]
        ys, xs = np.meshgrid(
            np.arange(0, depth.shape[0], stride),
            np.arange(0, depth.shape[1], stride),
            indexing="ij",
        )
        dv = depth[ys, xs] > 0
        cols = image[ys, xs][dv]
        return FrameData(
            cam_pose=fr.color_poses[idx],
            points=pts_world.astype(np.float32),
            colors=cols.astype(np.float32),
            image=image,
        )

    # -- stereo datasets -----------------------------------------------------
    def _get_item_stereo(self, idx: int) -> FrameData:
        """EuRoC: SGBM depth on the rectified pair, backprojected and
        colorized from the rectified left image."""
        import cv2

        from .base_parser import CameraIntrinsics
        from .euroc import stereo_depth
        from .replica import backproject_depth

        fr = self.frames
        rect = self.parser.rectification()
        left = cv2.imread(str(fr.color_files[idx]), cv2.IMREAD_GRAYSCALE)
        right = cv2.imread(str(fr.depth_files[idx]), cv2.IMREAD_GRAYSCALE)
        depth = stereo_depth(left, right, rect)
        left_rect = cv2.remap(left, *rect["maps0"], cv2.INTER_LINEAR)
        image = (
            np.repeat(left_rect[..., None], 3, axis=-1).astype(np.float32) / 255.0
        )

        p1 = rect["P1"]
        intr = CameraIntrinsics(
            p1[0, 0], p1[1, 1], p1[0, 2], p1[1, 2],
            depth.shape[1], depth.shape[0],
        )
        stride = max(self.cloud_stride, 1)
        pts_rect = backproject_depth(depth, intr, stride=stride)
        # rectified cam -> cam0 -> world
        r1 = rect["R1"]
        t_wc0 = fr.color_poses[idx].astype(np.float64)
        pts_c0 = pts_rect @ r1  # == (R1^T @ p)^T rows
        pts_world = pts_c0 @ t_wc0[:3, :3].T + t_wc0[:3, 3]
        ys, xs = np.meshgrid(
            np.arange(0, depth.shape[0], stride),
            np.arange(0, depth.shape[1], stride),
            indexing="ij",
        )
        dv = depth[ys, xs] > 0
        cols = image[ys, xs][dv]
        # pose of the rectified camera for rendering/training
        t_rect = np.eye(4)
        t_rect[:3, :3] = r1.T
        pose_rect = (t_wc0 @ t_rect).astype(np.float32)
        return FrameData(
            cam_pose=pose_rect,
            points=pts_world.astype(np.float32),
            colors=cols.astype(np.float32),
            image=image,
        )

    def get_item(self, idx: int) -> FrameData:
        if self.type in ("kitti", "spires"):
            return self._get_item_lidar(idx)
        if self.type == "euroc":
            return self._get_item_stereo(idx)
        return self._get_item_rgbd(idx)

    def get_pose(self, idx: int) -> np.ndarray:
        return self.frames.color_poses[idx]
