"""Geometry transforms: quaternions, covariances, camera matrices.

Conventions distilled from the reference (derivations re-done from scratch,
documented here so every later module agrees):

* Quaternion layout is (w, x, y, z) (reference stores rots with index 0 = w,
  gaussian_model.cpp:170). `quat_to_rotmat` produces the *standard* rotation
  matrix R so that Sigma = R @ diag(s^2) @ R^T — algebraically identical to
  forward.cu:154-193 (which builds the transpose column-major and computes
  M^T M).
* World-to-camera ("view") matrix W2C maps p_cam = W2C @ [p_world, 1]. The
  reference stores its transpose so flat CUDA indexing works
  (gaussian_keyframe.cpp:142-163); we store the plain matrix and document the
  equivalence.
* The projection matrix is the OpenGL-style asymmetric-free pinhole frustum
  of gaussian_keyframe.cpp:205-233; full_proj = P @ W2C.
* NDC -> pixel is ((v + 1) * S - 1) / 2 (auxiliary.h:33-36).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion(s) (w,x,y,z) -> rotation matrix [..., 3, 3].

    Matches general_utils::build_rotation (include/general_utils.h:26-57);
    does NOT normalize (callers pass normalized quats, as the rasterizer's
    activation does — gaussian_model.cpp:48-71).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_cov3d(scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float | jnp.ndarray = 1.0) -> jnp.ndarray:
    """3D covariance upper-triangular packing [N, 6].

    Sigma = R S S^T R^T with S = diag(scale_modifier * scales); packed as
    (xx, xy, xz, yy, yz, zz) like forward.cu:154-193.
    """
    # Fully elementwise (no [N,3,3] batched matmuls — those lower to
    # per-point micro-dots on TPU and are ~100x slower than VPU math).
    w, x, y, z = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    s = scale_modifier * scales
    s0, s1, s2 = s[..., 0], s[..., 1], s[..., 2]
    m00 = (1.0 - 2.0 * (y * y + z * z)) * s0
    m01 = (2.0 * (x * y - w * z)) * s1
    m02 = (2.0 * (x * z + w * y)) * s2
    m10 = (2.0 * (x * y + w * z)) * s0
    m11 = (1.0 - 2.0 * (x * x + z * z)) * s1
    m12 = (2.0 * (y * z - w * x)) * s2
    m20 = (2.0 * (x * z - w * y)) * s0
    m21 = (2.0 * (y * z + w * x)) * s1
    m22 = (1.0 - 2.0 * (x * x + y * y)) * s2
    return jnp.stack(
        [
            m00 * m00 + m01 * m01 + m02 * m02,
            m00 * m10 + m01 * m11 + m02 * m12,
            m00 * m20 + m01 * m21 + m02 * m22,
            m10 * m10 + m11 * m11 + m12 * m12,
            m10 * m20 + m11 * m21 + m12 * m22,
            m20 * m20 + m21 * m21 + m22 * m22,
        ],
        axis=-1,
    )


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """logit, as general_utils::inverse_sigmoid."""
    return jnp.log(x / (1.0 - x))


def focal_to_fov(focal: float, pixels: int) -> float:
    """graphics_utils.h fov2focal/focal2fov conventions."""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def fov_to_focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * math.tan(fov * 0.5))


def world_to_view(q: np.ndarray, t: np.ndarray) -> np.ndarray:
    """W2C 4x4 from camera pose quaternion (w,x,y,z) + translation (Tcw).

    The reference's getWorld2View2 (gaussian_keyframe.cpp:180-202) with the
    default trans=0/scale=1 reduces to exactly [R|t; 0 1]; host-side NumPy
    since poses arrive from the tracker on host.
    """
    w2c = np.eye(4, dtype=np.float64)
    qw, qx, qy, qz = (float(v) for v in q)
    n = math.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qw, qx, qy, qz = qw / n, qx / n, qy / n, qz / n
    w2c[0, 0] = 1 - 2 * (qy * qy + qz * qz)
    w2c[0, 1] = 2 * (qx * qy - qw * qz)
    w2c[0, 2] = 2 * (qx * qz + qw * qy)
    w2c[1, 0] = 2 * (qx * qy + qw * qz)
    w2c[1, 1] = 1 - 2 * (qx * qx + qz * qz)
    w2c[1, 2] = 2 * (qy * qz - qw * qx)
    w2c[2, 0] = 2 * (qx * qz - qw * qy)
    w2c[2, 1] = 2 * (qy * qz + qw * qx)
    w2c[2, 2] = 1 - 2 * (qx * qx + qy * qy)
    w2c[:3, 3] = np.asarray(t, dtype=np.float64)
    return w2c.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style projection (gaussian_keyframe.cpp:205-233)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    p = np.zeros((4, 4), dtype=np.float32)
    p[0, 0] = znear / right
    p[1, 1] = znear / top
    p[3, 2] = 1.0
    p[2, 2] = zfar / (zfar - znear)
    p[2, 3] = -(zfar * znear) / (zfar - znear)
    return p


class CameraMatrices(NamedTuple):
    """Per-view transform bundle fed to the rasterizer (all jnp, traced).

    Mirrors the tensors computed by computeTransformTensors
    (gaussian_keyframe.cpp:138-169), stored untransposed:
      view:      [4,4] W2C
      full_proj: [4,4] P @ W2C
      campos:    [3]   camera center in world = C2W[:3, 3]
      tanfovx/y: scalars tan(FoV/2)
    """

    view: jnp.ndarray
    full_proj: jnp.ndarray
    campos: jnp.ndarray
    tanfovx: jnp.ndarray
    tanfovy: jnp.ndarray

    @staticmethod
    def from_pose(
        q: np.ndarray,
        t: np.ndarray,
        fovx: float,
        fovy: float,
        znear: float = 0.01,
        zfar: float = 100.0,
    ) -> "CameraMatrices":
        w2c = world_to_view(q, t)
        proj = projection_matrix(znear, zfar, fovx, fovy)
        full = (proj @ w2c).astype(np.float32)
        c2w = np.linalg.inv(w2c)
        return CameraMatrices(
            view=jnp.asarray(w2c),
            full_proj=jnp.asarray(full),
            campos=jnp.asarray(c2w[:3, 3].astype(np.float32)),
            tanfovx=jnp.float32(math.tan(fovx * 0.5)),
            tanfovy=jnp.float32(math.tan(fovy * 0.5)),
        )


def ndc_to_pix(v: jnp.ndarray, size: int | jnp.ndarray) -> jnp.ndarray:
    """auxiliary.h:33-36."""
    return ((v + 1.0) * size - 1.0) * 0.5


def nerfpp_norm(cam_centers: np.ndarray) -> tuple[np.ndarray, float]:
    """Scene extent from camera centers (gaussian_scene.cpp:79-121).

    Returns (translate, radius): centroid-negation and 1.1 * max distance
    from centroid to any camera center.
    """
    centers = np.asarray(cam_centers, dtype=np.float64)  # [K, 3]
    centroid = centers.mean(axis=0)
    dists = np.linalg.norm(centers - centroid[None, :], axis=1)
    radius = float(dists.max()) * 1.1 if len(centers) else 1.0
    return (-centroid).astype(np.float32), radius
