"""Per-Gaussian rasterization preprocess: cull, project, 2D covariance.

TPU-native replacement for preprocessCUDA (forward.cu:198-312). On GPU this
is a one-thread-per-Gaussian kernel; here it is a fully vectorized XLA op
graph over the capacity-padded Gaussian buffer — every step is elementwise or
a tiny fixed-size contraction, so XLA fuses it into a handful of VPU loops.

All numeric conventions match the reference bit-for-bit at fp32:
  * frustum cull at p_view.z <= 0.2          (auxiliary.h:160-194)
  * p_w = 1 / (p_hom.w + 1e-7)               (forward.cu:250)
  * EWA cov2D with 1.3*tanfov clamp and +0.3 px low-pass
                                              (forward.cu:104-149)
  * radius = ceil(3 * sqrt(lambda_max)), lambda via mid +- sqrt(max(0.1,...))
                                              (forward.cu:282-291)
  * tile rect via truncation-and-clamp        (auxiliary.h:38-51)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .sh import eval_sh_color
from .transforms import CameraMatrices, build_cov3d, ndc_to_pix

TILE = 16  # BLOCK_X == BLOCK_Y == 16 (cuda_rasterizer/config.h:15-16)


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (capacity-padded [P, ...])."""

    means2d: jnp.ndarray  # [P, 2] pixel coords
    depths: jnp.ndarray  # [P] camera-space z
    conics: jnp.ndarray  # [P, 3] inverse 2D covariance (a, b, c)
    colors: jnp.ndarray  # [P, 3] RGB from SH
    radii: jnp.ndarray  # [P] int32, 0 => culled
    rect_min: jnp.ndarray  # [P, 2] int32 tile coords (x, y)
    rect_max: jnp.ndarray  # [P, 2] int32 tile coords, exclusive
    tiles_touched: jnp.ndarray  # [P] int32 rect area (0 => skip)


def band_view(pre: Preprocessed, tile_row0, num_tile_rows: int) -> Preprocessed:
    """Restrict preprocessed Gaussians to a horizontal band of tile rows.

    The band starts at tile row `tile_row0` (traced int scalar is fine) and
    spans `num_tile_rows` (static). Returns a Preprocessed whose rects and
    means2d live in BAND coordinates — downstream binning/blend then run on
    a (grid_w, num_tile_rows) grid and produce the band's pixels. Everything
    is translation-invariant (conics, depths, colors); `radii` keeps the
    FULL-image visibility so the reference's radii>0 filter
    (forward.cu:296-297) stays view-global. Used by the tile-sharded
    multi-chip step (parallel/tile_sharding.py) — the reference has no
    equivalent (single GPU renders the whole frame,
    rasterizer_impl.cu:456-500)."""
    ty0 = jnp.asarray(tile_row0, jnp.int32)
    rmin_y = jnp.clip(pre.rect_min[:, 1] - ty0, 0, num_tile_rows)
    rmax_y = jnp.clip(pre.rect_max[:, 1] - ty0, 0, num_tile_rows)
    h = rmax_y - rmin_y  # >= 0: clip preserves rect_max >= rect_min
    w = pre.rect_max[:, 0] - pre.rect_min[:, 0]
    area = jnp.where(pre.tiles_touched > 0, w * h, 0)
    y_shift = (ty0 * TILE).astype(jnp.float32)
    means2d = pre.means2d - jnp.array([0.0, 1.0], jnp.float32) * y_shift
    return pre._replace(
        means2d=means2d,
        rect_min=jnp.stack([pre.rect_min[:, 0], rmin_y], axis=1),
        rect_max=jnp.stack([pre.rect_max[:, 0], rmax_y], axis=1),
        tiles_touched=area.astype(jnp.int32),
    )


def tile_grid(width: int, height: int) -> tuple[int, int]:
    gw = (width + TILE - 1) // TILE
    gh = (height + TILE - 1) // TILE
    return gw, gh


def _affine3(p: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Rows 0..2 of m @ [p, 1], expanded elementwise (full f32 on the VPU)."""
    return jnp.stack(
        [
            m[i, 0] * p[:, 0] + m[i, 1] * p[:, 1] + m[i, 2] * p[:, 2] + m[i, 3]
            for i in range(3)
        ],
        axis=-1,
    )


def compute_cov2d(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    cam: CameraMatrices,
    focal_x: jnp.ndarray,
    focal_y: jnp.ndarray,
) -> jnp.ndarray:
    """EWA projection of the 3D covariance to screen space [P, 3].

    cov2d = J @ R_w2c @ Sigma @ R_w2c^T @ J^T with the frustum-clamped
    Jacobian of forward.cu:104-149, plus the 0.3-pixel low-pass on the
    diagonal. Returns packed (cov_xx, cov_xy, cov_yy).
    """
    r = cam.view[:3, :3]
    # Written elementwise, NOT as a matmul: tiny [P,3]x[3,3] dots would hit
    # the MXU's default (bf16) precision and wreck sub-pixel accuracy.
    t = _affine3(means3d, cam.view)
    # Guard |tz|: culled/dead slots can sit near tz == 0, and 1/tz infs
    # poison their (otherwise zero) gradients via 0*inf = NaN. Visible
    # gaussians always have tz > 0.2 (frustum cull), so clamping the
    # magnitude to 0.1 changes nothing for them while keeping every
    # jacobian finite for culled slots.
    tz_raw = t[:, 2]
    tz = jnp.where(jnp.abs(tz_raw) < 0.1, 0.1, tz_raw)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    tx = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    # J rows: [fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2]
    inv_tz = 1.0 / tz
    j00 = focal_x * inv_tz
    j02 = -(focal_x * tx) * inv_tz * inv_tz
    j11 = focal_y * inv_tz
    j12 = -(focal_y * ty) * inv_tz * inv_tz

    # V = R @ Sigma @ R^T, but we only need rows 0..2 contracted with J's
    # sparsity: T = J @ R is [P, 2, 3] with T[0] = j00*R0 + j02*R2, etc.
    t0 = j00[:, None] * r[0][None, :] + j02[:, None] * r[2][None, :]  # [P,3]
    t1 = j11[:, None] * r[1][None, :] + j12[:, None] * r[2][None, :]

    # Elementwise quadratic forms (batched [3]x[3,3] einsums are slow on TPU).
    c = cov3d  # (xx, xy, xz, yy, yz, zz)
    a0, a1, a2 = t0[:, 0], t0[:, 1], t0[:, 2]
    b0, b1, b2 = t1[:, 0], t1[:, 1], t1[:, 2]
    s00 = a0 * c[:, 0] + a1 * c[:, 1] + a2 * c[:, 2]
    s01 = a0 * c[:, 1] + a1 * c[:, 3] + a2 * c[:, 4]
    s02 = a0 * c[:, 2] + a1 * c[:, 4] + a2 * c[:, 5]
    r00 = b0 * c[:, 0] + b1 * c[:, 1] + b2 * c[:, 2]
    r01 = b0 * c[:, 1] + b1 * c[:, 3] + b2 * c[:, 4]
    r02 = b0 * c[:, 2] + b1 * c[:, 4] + b2 * c[:, 5]
    cxx = s00 * a0 + s01 * a1 + s02 * a2 + 0.3
    cxy = s00 * b0 + s01 * b1 + s02 * b2
    cyy = r00 * b0 + r01 * b1 + r02 * b2 + 0.3
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def preprocess(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    dc: jnp.ndarray,
    sh_rest: jnp.ndarray,
    alive: jnp.ndarray,
    cam: CameraMatrices,
    *,
    width: int,
    height: int,
    sh_degree: int,
    scale_modifier: float = 1.0,
    means2d_offset: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    active_sh_degree: jnp.ndarray | None = None,
) -> Preprocessed:
    """Vectorized preprocess over the full (padded) Gaussian buffer.

    `alive` is the fixed-capacity liveness mask: dead slots behave exactly
    like frustum-culled Gaussians (radius 0, 0 tiles).

    `means2d_offset` is an all-zeros [P, 2] array added to the projected
    pixel-space means; its cotangent is the screen-space positional gradient
    the densification policy consumes — the JAX analog of the reference's
    retain_grad screenspace_points tensor (gaussian_renderer.cpp:41-48).
    """
    gw, gh = tile_grid(width, height)
    focal_x = width / (2.0 * cam.tanfovx)
    focal_y = height / (2.0 * cam.tanfovy)

    # Frustum cull (auxiliary.h:160-194): camera-space z <= 0.2.
    # All projective dots are expanded elementwise — a [P,3]x[3,4] matmul
    # would run at default (bf16) MXU precision and cost ~0.05 px of error.
    v = cam.view
    p_view_z = v[2, 0] * means3d[:, 0] + v[2, 1] * means3d[:, 1] + v[2, 2] * means3d[:, 2] + v[2, 3]
    in_front = p_view_z > 0.2
    valid = jnp.logical_and(alive, in_front)

    # Projection (forward.cu:248-251).
    fp = cam.full_proj
    p_hom = jnp.stack(
        [
            fp[i, 0] * means3d[:, 0] + fp[i, 1] * means3d[:, 1] + fp[i, 2] * means3d[:, 2] + fp[i, 3]
            for i in range(4)
        ],
        axis=-1,
    )
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :2] * p_w[:, None]

    if cov3d_precomp is None:
        cov3d = build_cov3d(scales, quats, scale_modifier)
    else:
        cov3d = cov3d_precomp
    cov2d = compute_cov2d(means3d, cov3d, cam, focal_x, focal_y)

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    valid = jnp.logical_and(valid, det != 0.0)
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conics = jnp.stack(
        [cov2d[:, 2] * inv_det, -cov2d[:, 1] * inv_det, cov2d[:, 0] * inv_det],
        axis=-1,
    )

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    means2d = jnp.stack(
        [ndc_to_pix(p_proj[:, 0], width), ndc_to_pix(p_proj[:, 1], height)],
        axis=-1,
    )
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    # Tile rect (auxiliary.h:38-51). The C (int) casts truncate toward zero;
    # since both bounds are then clamped into [0, grid], astype truncation
    # followed by clip is exactly equivalent.
    #
    # TPU redesign: the rect is the tight per-axis AABB of the splat's
    # {alpha >= 1/255} super-level ellipse, capped at the reference's 3-sigma
    # square. The reference emits keys for the full 3-sigma rect and then
    # culls every tile whose in-tile peak opacity is < 1/255
    # (max_contrib_power_rect_gaussian_float, rasterizer_impl.cu:66-118,
    # threshold test :193-198). Any tile outside this AABB cannot intersect
    # the ellipse, so its peak is < 1/255 and the reference culls it too —
    # the post-cull pair set (and therefore the image and all gradients) is
    # IDENTICAL, but the pair buffer, sort, and kernel work all shrink.
    # d^T conic d <= 2 ln(255 op)  =>  |dx| <= sqrt(2 ln(255 op) * cov_xx).
    grid_i = jnp.array([gw, gh], dtype=jnp.int32)
    # NOT capped at 9: for op > e^4.5/255 (~0.35) the reference blends pixels
    # beyond the 3-sigma ellipse level; the 3-sigma square is enforced
    # separately by the min with radius_f (the reference's rect bound).
    power_cap = jnp.maximum(
        2.0 * jnp.log(jnp.maximum(opacities, 1e-30) * 255.0), 0.0
    )
    ext = jnp.ceil(
        jnp.sqrt(power_cap[:, None] * jnp.maximum(cov2d[:, (0, 2)], 0.0))
    )
    ext = jnp.minimum(ext, radius_f[:, None])
    # the reference-exact 3-sigma rect, kept for the radii/visibility filter
    rmin3 = jnp.clip(((means2d - radius_f[:, None]) / TILE).astype(jnp.int32), 0, grid_i)
    rmax3_f = jnp.maximum(0.0, (means2d + radius_f[:, None] + TILE - 1) / TILE)
    rmax3 = jnp.minimum(rmax3_f.astype(jnp.int32), grid_i)
    area3 = (rmax3[:, 0] - rmin3[:, 0]) * (rmax3[:, 1] - rmin3[:, 1])

    rmin = jnp.clip(((means2d - ext) / TILE).astype(jnp.int32), 0, grid_i)
    # True pixel-coverage bound, NOT the reference's (v + TILE-1)/TILE
    # idiom: that truncation under-covers by one tile whenever
    # (mean + extent) mod TILE < 1 (the last covered pixel row is the
    # first row of the next tile). The reference has the same quirk on its
    # 3-sigma radius — but with the TIGHT extent the quirk would fire at
    # different boundaries than the reference's, dropping pixels the
    # reference blends (caught by the f64 forward golden). Computing the
    # correct inclusive bound here and clamping into the reference's
    # quirky 3-sigma rect (rmax3 min below) preserves exact reference
    # semantics: never more than the reference's rect, never fewer than
    # the ellipse's true tile coverage.
    rmax_f = jnp.maximum(0.0, jnp.floor(means2d + ext) / TILE + 1.0)
    rmax = jnp.minimum(
        jnp.minimum(rmax_f.astype(jnp.int32), rmax3), grid_i
    )
    # op exactly 1/255 keeps its mean tile (peak alpha passes the >= test in
    # both the reference cull and the blend's ALPHA_MIN gate); only strictly
    # smaller opacities can never contribute anywhere.
    zero_ext = opacities * 255.0 < 1.0
    area = jnp.where(
        zero_ext, 0, (rmax[:, 0] - rmin[:, 0]) * (rmax[:, 1] - rmin[:, 1])
    )

    # radii parity: the reference's visibility filter is radii > 0 with the
    # 3-sigma rect's area test (forward.cu:296-297), independent of the cull.
    valid_radii = jnp.logical_and(valid, area3 > 0)
    valid = jnp.logical_and(valid, area > 0)

    if colors_precomp is None:
        colors = eval_sh_color(
            dc, sh_rest, means3d, cam.campos, sh_degree, active_sh_degree
        )
    else:
        colors = colors_precomp

    radii = jnp.where(valid_radii, radius_f, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(valid, area, 0).astype(jnp.int32)
    return Preprocessed(
        means2d=means2d,
        depths=p_view_z,
        conics=conics,
        colors=colors,
        radii=radii,
        rect_min=rmin,
        rect_max=rmax,
        tiles_touched=tiles_touched,
    )
