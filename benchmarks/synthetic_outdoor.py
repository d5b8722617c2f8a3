"""Deterministic synthetic outdoor scene (KITTI operating mode fixture).

Ground plane + roadside boxes + bright sky, raycast analytically. Used by
the outdoor streaming test: the LiDAR+camera pipeline (colorized cloud per
frame, 1 training iteration per frame, live sky segmentation) runs on this
scene end-to-end, matching the reference's train_kitti mode
(/root/reference/src/gaussian_mapper.cpp:160-333) without shipping data.

Convention: OpenCV camera (x right, y DOWN, z forward); the world ground
plane is y = +1.5, the camera drives along +z at y = 0.
"""

from __future__ import annotations

import numpy as np

GROUND_Y = 1.5

# roadside boxes: (center_x, center_z, half_w, half_d, height, rgb)
_BOXES = [
    (-4.0, 8.0, 1.0, 1.0, 2.5, (0.55, 0.25, 0.20)),
    (4.5, 14.0, 1.2, 1.5, 3.0, (0.20, 0.35, 0.55)),
    (-5.0, 22.0, 1.5, 1.0, 2.0, (0.30, 0.45, 0.25)),
    (4.0, 30.0, 1.0, 2.0, 3.5, (0.45, 0.40, 0.20)),
    (-3.5, 38.0, 1.2, 1.2, 2.8, (0.35, 0.25, 0.45)),
]


def _sky(d: np.ndarray) -> np.ndarray:
    """Bright sky by elevation (above-horizon rays): the brightness-style
    segmenter used in tests masks exactly this region."""
    up = np.clip(-d[..., 1], 0.0, 1.0)  # -y is up
    return np.stack(
        [0.75 + 0.2 * up, 0.8 + 0.15 * up, 0.9 + 0.1 * up], axis=-1
    )


def _ground_tex(x: np.ndarray, z: np.ndarray) -> np.ndarray:
    checker = ((np.floor(x / 1.0) + np.floor(z / 1.0)) % 2.0)[..., None]
    a = np.array([0.32, 0.30, 0.28])
    b = np.array([0.22, 0.22, 0.24])
    base = a[None, :] * checker + b[None, :] * (1 - checker)
    return np.clip(base + 0.05 * np.sin(0.7 * z)[..., None], 0.05, 0.5)


def raycast_outdoor(t_wc: np.ndarray, width: int, height: int, fov=np.pi / 2):
    """(rgb [H,W,3], zdepth [H,W]); sky pixels carry depth = inf."""
    from benchmarks.synthetic_room import camera_rays

    o, d = camera_rays(t_wc, width, height, fov)

    best_t = np.full((height, width), np.inf)
    rgb = _sky(d / np.linalg.norm(d, axis=-1, keepdims=True))

    # ground plane y = GROUND_Y
    with np.errstate(divide="ignore", invalid="ignore"):
        tg = (GROUND_Y - o[1]) / d[..., 1]
    gx = o[0] + tg * d[..., 0]
    gz = o[2] + tg * d[..., 2]
    ok = (tg > 1e-6) & (tg < best_t) & (np.abs(gx - o[0]) < 60) & (gz - o[2] < 80)
    rgb[ok] = _ground_tex(gx[ok], gz[ok])
    best_t[ok] = tg[ok]

    # boxes: slab intersection per AABB
    for bx, bz, hw, hd, h, color in _BOXES:
        lo = np.array([bx - hw, GROUND_Y - h, bz - hd])
        hi = np.array([bx + hw, GROUND_Y, bz + hd])
        with np.errstate(divide="ignore", invalid="ignore"):
            t0 = (lo[None, None, :] - o[None, None, :]) / d
            t1 = (hi[None, None, :] - o[None, None, :]) / d
        tmin = np.minimum(t0, t1).max(axis=-1)
        tmax = np.maximum(t0, t1).min(axis=-1)
        ok = (tmax > tmin) & (tmin > 1e-6) & (tmin < best_t)
        hit = o[None, :] + tmin[ok, None] * d[ok]
        shade = 0.8 + 0.2 * np.clip((GROUND_Y - hit[:, 1]) / h, 0, 1)
        rgb[ok] = np.asarray(color)[None, :] * shade[:, None]
        best_t[ok] = tmin[ok]

    return rgb.astype(np.float32), best_t.astype(np.float32)


def drive_pose(dist: float, sway: float = 0.0) -> np.ndarray:
    """T_wc: camera at (sway, 0, dist) looking down +z."""
    t = np.eye(4, dtype=np.float32)
    t[0, 3] = sway
    t[2, 3] = dist
    return t


def lidar_cloud(t_wc, width, height, fov=np.pi / 2, stride=4):
    """Colorized-LiDAR stand-in: world points + colors sampled from the
    raycast at a pixel stride (the cuda_colorize product, SURVEY §2.1)."""
    rgb, depth = raycast_outdoor(t_wc, width, height, fov)
    fx = 0.5 * width / np.tan(fov / 2)
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    ys, xs = np.mgrid[0:height:stride, 0:width:stride]
    z = depth[ys, xs]
    ok = np.isfinite(z) & (z < 60.0)
    zc = z[ok].astype(np.float64)
    xc = (xs[ok] - cx) / fx * zc
    yc = (ys[ok] - cy) / fx * zc
    pts_cam = np.stack([xc, yc, zc], -1)
    t = t_wc.astype(np.float64)
    pts_w = (pts_cam @ t[:3, :3].T + t[:3, 3]).astype(np.float32)
    cols = rgb[ys, xs][ok].astype(np.float32)
    return pts_w, cols
