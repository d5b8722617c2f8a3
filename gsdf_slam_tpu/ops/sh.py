"""Spherical-harmonics color evaluation.

TPU-native equivalent of the reference's SH pipeline:
  - constants and per-degree polynomial basis as in
    /root/reference/cuda_rasterizer/auxiliary.h:23-31 and
    /root/reference/include/sh_utils.h:33-61
  - forward color conversion as in
    /root/reference/cuda_rasterizer/forward.cu:32-101 (computeColorFromSH):
    separate DC term (SH_C0 * dc) plus degree-1..3 terms from the "rest"
    coefficients, +0.5 offset, clamp at 0.

The whole evaluation is a batched polynomial-basis contraction: we build the
basis matrix [N, 16] and contract against coefficients [N, 16, 3] — one fused
XLA op, MXU-friendly when N is large.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
# Degree-4 constants (reference include/sh_utils.h:52-61). The models the
# reference trains are degree 3; degree 4 exists only on the eval_sh surface.
SH_C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)

MAX_SH_DEGREE = 3
NUM_SH_COEFFS = (MAX_SH_DEGREE + 1) ** 2  # 16


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB2SH = (rgb - 0.5) / C0 (reference include/sh_utils.h:138)."""
    return (rgb - 0.5) / SH_C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    """SH2RGB = sh * C0 + 0.5 (reference include/sh_utils.h:143)."""
    return sh * SH_C0 + 0.5


def sh_basis(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Real SH basis values for unit directions.

    Args:
      dirs: [..., 3] unit view directions (gaussian_center - cam_pos, normed).
      degree: active SH degree in [0, 4] (static).

    Returns:
      [..., (degree+1)**2] basis, ordered to match the reference layout where
      coefficient 0 is the DC term and 1.. follow forward.cu:64-85
      (degree 4 per include/sh_utils.h:121-134).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    terms = [SH_C0 * one]
    if degree > 0:
        terms += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        terms += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        terms += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    if degree > 3:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        terms += [
            SH_C4[0] * xy * (xx - yy),
            SH_C4[1] * yz * (3.0 * xx - yy),
            SH_C4[2] * xy * (7.0 * zz - 1.0),
            SH_C4[3] * yz * (7.0 * zz - 3.0),
            SH_C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            SH_C4[5] * xz * (7.0 * zz - 3.0),
            SH_C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            SH_C4[7] * xz * (xx - 3.0 * yy),
            SH_C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(terms, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH at unit directions (reference include/sh_utils.h:64-136).

    Matches the reference `eval_sh` surface exactly: degree 0..4, NO +0.5
    offset and NO clamp (those belong to computeColorFromSH, see
    eval_sh_color).

    Args:
      deg: SH degree in [0, 4] (static).
      sh: [..., C, (deg+1)**2] coefficients (channel-major like the
        reference's torch layout).
      dirs: [..., 3] unit directions.

    Returns:
      [..., C].
    """
    if not (0 <= deg <= 4):
        raise ValueError(f"deg must be in [0, 4], got {deg}")
    coeff = (deg + 1) ** 2
    if sh.shape[-1] < coeff:
        raise ValueError(f"sh has {sh.shape[-1]} coeffs, need >= {coeff}")
    basis = sh_basis(dirs, deg)  # [..., K]
    return jnp.sum(sh[..., :coeff] * basis[..., None, :], axis=-1)


def eval_sh_color(
    dc: jnp.ndarray,
    sh_rest: jnp.ndarray,
    means: jnp.ndarray,
    campos: jnp.ndarray,
    degree: int,
    active_degree: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SH -> clamped RGB, matching forward.cu:32-101 exactly.

    Args:
      dc: [N, 1, 3] DC coefficients (the reference's separate_sh dc input).
      sh_rest: [N, 15, 3] higher-order coefficients ("rest").
      means: [N, 3] gaussian centers (world).
      campos: [3] camera center (world).
      degree: active SH degree (static int).

    Returns:
      [N, 3] RGB in [0, inf) clamped at 0 after the +0.5 offset.
    """
    d = means - campos[None, :]
    # eps INSIDE the sqrt: dead capacity slots sit at the camera origin and
    # jnp.linalg.norm's VJP at exactly 0 is 0/0 — the NaN survives any
    # outer clamp (0 * NaN) and poisons the dead slots' xyz gradients.
    d = d * jax.lax.rsqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-24)
    basis = sh_basis(d, degree)  # [N, K]
    k = basis.shape[-1]
    if active_degree is not None:
        # Traced SH-degree ramp (setShDegree/oneUpShDegree,
        # gaussian_model.cpp:103-112): zero the bands above the active
        # degree so the ramp never recompiles. Band of coeff j is
        # floor(sqrt(j)).
        j = jnp.arange(k)
        band = jnp.floor(jnp.sqrt(j.astype(jnp.float32))).astype(jnp.int32)
        basis = jnp.where(band[None, :] <= active_degree, basis, 0.0)
    coeffs = jnp.concatenate([dc, sh_rest], axis=1)  # [N, 1+R, 3]
    # A state sized for a lower degree than `degree` simply has no higher
    # coefficients — identical to evaluating them as zero.
    k = min(k, coeffs.shape[1])
    # broadcast-multiply-reduce on the VPU: a batched [16]x[16,3] einsum
    # lowers to per-point micro-matmuls, ~100x slower on TPU.
    rgb = jnp.sum(basis[:, :k, None] * coeffs[:, :k, :], axis=1) + 0.5
    return jnp.maximum(rgb, 0.0)
