"""LiDAR point-cloud colorization by camera projection.

TPU-native equivalent of the cuda_colorize kernel
(cuda_colorize/colorize_pointcloud.cu:14-56): transform each LiDAR point to
the camera frame via Tr_velo_to_cam, project with the 3x4 P matrix, keep
points with z > 0.2 that land inside the image, sample the pixel color
(nearest, truncating pixel cast like the CUDA (int) casts), and transform
the point to world with the LiDAR pose.

The CUDA version compacts valid points with nonzero/index_select
(:104-106); under XLA shapes are static, so we return a validity mask
instead and let the (host or jit) consumer compact/pad.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ColorizedCloud(NamedTuple):
    points_world: jnp.ndarray  # [N, 3]
    colors: jnp.ndarray  # [N, 3]
    valid: jnp.ndarray  # [N] bool


def colorize_pointcloud(
    points: jnp.ndarray,  # [N, 3] in LiDAR frame
    image: jnp.ndarray,  # [H, W, 3] float RGB
    proj: jnp.ndarray,  # [3, 4] camera projection P
    tr_velo_to_cam: jnp.ndarray,  # [4, 4]
    lidar_pose: jnp.ndarray,  # [4, 4] T_world_lidar
) -> ColorizedCloud:
    h, w = image.shape[0], image.shape[1]

    def affine(p, m):
        return jnp.stack(
            [
                m[i, 0] * p[:, 0] + m[i, 1] * p[:, 1] + m[i, 2] * p[:, 2] + m[i, 3]
                for i in range(3)
            ],
            axis=-1,
        )

    p_cam = affine(points, tr_velo_to_cam)
    p_proj = affine(p_cam, proj)
    in_front = p_cam[:, 2] > 0.2
    z = jnp.where(p_proj[:, 2] == 0, 1e-9, p_proj[:, 2])
    px = (p_proj[:, 0] / z).astype(jnp.int32)
    py = (p_proj[:, 1] / z).astype(jnp.int32)
    in_img = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    valid = in_front & in_img

    pxc = jnp.clip(px, 0, w - 1)
    pyc = jnp.clip(py, 0, h - 1)
    colors = image[pyc, pxc]
    p_world = affine(points, lidar_pose)
    return ColorizedCloud(points_world=p_world, colors=colors, valid=valid)
