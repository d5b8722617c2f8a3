"""Regenerate the committed double-precision forward golden.

A from-scratch float64 NumPy transcription of the reference rasterizer's
EXACT forward math — each step cites the formula source in
/root/reference/cuda_rasterizer/ — evaluated on a nontrivial scene and
committed as a fixture. The production f32 renderer must match it within
float tolerance (tests/test_render.py::test_forward_matches_f64_golden);
because this file derives from the reference equations and NOT from
gsdf_slam_tpu's implementation, both cannot drift together.

Run from the repo root:  python tests/fixtures/make_forward_golden.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

HEIGHT, WIDTH = 64, 64
TILE = 16  # BLOCK_X/BLOCK_Y, config.h:15-16
N = 48


def quat_rotmat(q):
    """Standard unit-quaternion (w,x,y,z) rotation matrix — the net effect
    of computeCov3D's glm column-major construction (forward.cu:176-179)."""
    r, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
    ])


def sh_color(dc, sh, dirn):
    """computeColorFromSH (forward.cu:32-101), degree 3, f64; returns the
    clamped RGB (max(rgb + 0.5, 0))."""
    C0 = 0.28209479177387814
    C1 = 0.4886025119029199
    C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396)
    C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435)
    x, y, z = dirn
    res = C0 * dc
    res = res - C1 * y * sh[0] + C1 * z * sh[1] - C1 * x * sh[2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    res = (res + C2[0] * xy * sh[3] + C2[1] * yz * sh[4]
           + C2[2] * (2.0 * zz - xx - yy) * sh[5]
           + C2[3] * xz * sh[6] + C2[4] * (xx - yy) * sh[7])
    res = (res + C3[0] * y * (3.0 * xx - yy) * sh[8]
           + C3[1] * xy * z * sh[9]
           + C3[2] * y * (4.0 * zz - xx - yy) * sh[10]
           + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[11]
           + C3[4] * x * (4.0 * zz - xx - yy) * sh[12]
           + C3[5] * z * (xx - yy) * sh[13]
           + C3[6] * x * (xx - 3.0 * yy) * sh[14])
    return np.maximum(res + 0.5, 0.0)


def forward_golden(xyz, scales, quats, opac, dc, sh_rest, view, full_proj,
                   campos, tanfovx, tanfovy, bg):
    """Full forward at float64: preprocess + depth-ordered per-pixel blend.

    preprocess: forward.cu:198-312; cov2D: :104-149; cov3D: :154-193;
    blend loop skip/termination rules: :403-453 (power>0 continue,
    alpha=min(.99, op*exp(power)), alpha<1/255 continue, test_T<1e-4 done);
    ndc2Pix/getRect: auxiliary.h:33-51; near cull z<=0.2: auxiliary.h:160-196.
    """
    n = xyz.shape[0]
    fx = WIDTH / (2.0 * tanfovx)   # focal from tanfov, as the renderer
    fy = HEIGHT / (2.0 * tanfovy)  # settings carry it (gaussian_renderer.cpp:54)
    grid_w = (WIDTH + TILE - 1) // TILE
    grid_h = (HEIGHT + TILE - 1) // TILE

    rec = []
    for i in range(n):
        p = xyz[i].astype(np.float64)
        p_view = view[:3, :3] @ p + view[:3, 3]
        if p_view[2] <= 0.2:  # in_frustum, auxiliary.h:181
            continue
        ph = full_proj @ np.append(p, 1.0)
        pw = 1.0 / (ph[3] + 1e-7)  # 0.0000001f, forward.cu:251
        p_proj = ph[:3] * pw

        # cov3D = R S S R^T (computeCov3D net math, forward.cu:154-193)
        r = quat_rotmat(quats[i].astype(np.float64))
        s = np.diag(scales[i].astype(np.float64) ** 2)
        vrk = r @ s @ r.T

        # computeCov2D (forward.cu:104-149): clamp to 1.3*tanfov, J @ W
        t = p_view.copy()
        limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
        t[0] = np.clip(t[0] / t[2], -limx, limx) * t[2]
        t[1] = np.clip(t[1] / t[2], -limy, limy) * t[2]
        j = np.array([
            [fx / t[2], 0.0, -(fx * t[0]) / (t[2] * t[2])],
            [0.0, fy / t[2], -(fy * t[1]) / (t[2] * t[2])],
        ])
        w = view[:3, :3]
        cov = j @ w @ vrk @ w.T @ j.T
        cov[0, 0] += 0.3  # low-pass, forward.cu:146-147
        cov[1, 1] += 0.3
        det = cov[0, 0] * cov[1, 1] - cov[0, 1] * cov[0, 1]
        if det == 0.0:
            continue
        conic = np.array([cov[1, 1], -cov[0, 1], cov[0, 0]]) / det

        # Radius/rect are integer DECISIONS the reference makes in f32
        # (forward.cu:285-291): a ceil() near an integer or a rect division
        # near a tile boundary must round exactly as f32 does, or the
        # golden gains/loses whole tiles no f32 implementation can match.
        mid32 = np.float32(0.5) * (np.float32(cov[0, 0]) + np.float32(cov[1, 1]))
        det32 = np.float32(det)
        lam1_32 = mid32 + np.float32(np.sqrt(np.float32(max(
            np.float32(0.1), mid32 * mid32 - det32))))
        radius = float(np.ceil(np.float32(3.0) * np.float32(np.sqrt(lam1_32))))
        px = ((p_proj[0] + 1.0) * WIDTH - 1.0) * 0.5  # ndc2Pix
        py = ((p_proj[1] + 1.0) * HEIGHT - 1.0) * 0.5
        px32, py32 = float(np.float32(px)), float(np.float32(py))
        rect_min = (min(grid_w, max(0, int(np.float32(px32 - radius) / TILE))),
                    min(grid_h, max(0, int(np.float32(py32 - radius) / TILE))))
        rect_max = (min(grid_w, max(0, int(np.float32(px32 + radius + TILE - 1) / TILE))),
                    min(grid_h, max(0, int(np.float32(py32 + radius + TILE - 1) / TILE))))
        if (rect_max[0] - rect_min[0]) * (rect_max[1] - rect_min[1]) == 0:
            continue

        d = p - campos.astype(np.float64)
        dirn = d / np.linalg.norm(d)
        col = sh_color(dc[i].astype(np.float64)[0],
                       sh_rest[i].astype(np.float64), dirn)

        # Per-tile opacity cull (the fork's SNUGBOX duplicateWithKeys,
        # rasterizer_impl.cu:66-118 max_contrib_power_rect_gaussian_float;
        # threshold log(opacity*255), :170,193): a tile emits NO pair when
        # the probe-point opacity factor exceeds the threshold — this is
        # part of the reference's IMAGE semantics, not just a perf cull
        # (the closed form is a heuristic probe, not the exact minimum).
        # Boundary convention: probe steps strictly by sign of min_diff
        # (matches ops/binning._tile_opacity_keep's documented fix of the
        # copysign(patch, 0.0) edge; measure-zero difference).
        keep = np.zeros((grid_h, grid_w), bool)
        patch = float(TILE - 1)
        thresh = np.log(float(opac[i]) * 255.0)
        for tyi in range(rect_min[1], rect_max[1]):
            for txi in range(rect_min[0], rect_max[0]):
                t_min = (txi * TILE, tyi * TILE)
                t_max = (t_min[0] + patch, t_min[1] + patch)
                x_min_diff = t_min[0] - px
                x_left = 1.0 if x_min_diff > 0.0 else 0.0
                not_in_x = x_left + (1.0 if px > t_max[0] else 0.0)
                y_min_diff = t_min[1] - py
                y_above = 1.0 if y_min_diff > 0.0 else 0.0
                not_in_y = y_above + (1.0 if py > t_max[1] else 0.0)
                factor = 0.0
                if not_in_x + not_in_y > 0.0:
                    pxp = x_left * t_min[0] + (1.0 - x_left) * t_max[0]
                    pyp = y_above * t_min[1] + (1.0 - y_above) * t_max[1]
                    dxp = patch if x_min_diff > 0.0 else -patch
                    dyp = patch if y_min_diff > 0.0 else -patch
                    diffx, diffy = px - pxp, py - pyp
                    sat = lambda v: min(1.0, max(0.0, v))
                    txf = not_in_y * sat((dxp * conic[0] * diffx + dxp * conic[1] * diffy)
                                         / (patch * patch * conic[0]))
                    tyf = not_in_x * sat((dyp * conic[1] * diffx + dyp * conic[2] * diffy)
                                         / (patch * patch * conic[2]))
                    mx_, my_ = pxp + txf * dxp, pyp + tyf * dyp
                    ddx, ddy = px - mx_, py - my_
                    factor = (0.5 * (conic[0] * ddx * ddx + conic[2] * ddy * ddy)
                              + conic[1] * ddx * ddy)
                keep[tyi, txi] = factor <= thresh

        # depth key at f32 like the sort keys (rasterizer_impl.cu:482-491):
        # f64 near-ties must not reorder vs the production pipeline
        rec.append((np.float32(p_view[2]), i, px, py, conic,
                    float(opac[i]), col, keep))

    rec.sort(key=lambda r: (r[0], r[1]))  # stable (depth, index)

    ys, xs = np.mgrid[0:HEIGHT, 0:WIDTH].astype(np.float64)
    tx, ty = (xs / TILE).astype(int), (ys / TILE).astype(int)
    t_acc = np.ones((HEIGHT, WIDTH))
    done = np.zeros((HEIGHT, WIDTH), bool)
    color = np.zeros((HEIGHT, WIDTH, 3))
    for _, _, px, py, conic, op, col, keep in rec:
        in_rect = keep[ty, tx]
        dx = px - xs
        dy = py - ys
        power = -0.5 * (conic[0] * dx * dx + conic[2] * dy * dy) - conic[1] * dx * dy
        alpha = np.minimum(0.99, op * np.exp(power))
        # DECISIONS at float32 (the reference decides in f32, forward.cu:
        # 428-441: any f64 golden would flip hairline skip/termination
        # outcomes a correct f32 implementation cannot match); ARITHMETIC
        # stays float64.
        alpha32 = alpha.astype(np.float32)
        test_t32 = (t_acc.astype(np.float32) * (np.float32(1.0) - alpha32))
        live = (in_rect & ~done & (power.astype(np.float32) <= 0.0)
                & (alpha32 >= np.float32(1.0 / 255.0)))
        terminate = live & (test_t32 < np.float32(1e-4))  # done BEFORE applying
        done = done | terminate
        apply = live & ~terminate
        color += np.where(apply[..., None], (alpha * t_acc)[..., None] * col[None, None, :], 0.0)
        t_acc = np.where(apply, t_acc * (1.0 - alpha), t_acc)
    return color + t_acc[..., None] * bg[None, None, :], t_acc


def make_scene(seed=5):
    rng = np.random.default_rng(seed)
    xyz = np.stack([
        rng.uniform(-1.6, 1.6, N), rng.uniform(-1.6, 1.6, N),
        rng.uniform(0.8, 4.0, N),
    ], -1).astype(np.float32)
    xyz[0, 2] = 0.1   # behind the near plane -> culled
    xyz[1] = (8.0, 8.0, 2.0)  # far outside the frustum rect
    scales = rng.uniform(0.03, 0.5, (N, 3)).astype(np.float32)
    scales[2] = (1.2, 0.02, 0.02)  # extreme anisotropy
    q = rng.normal(0, 1, (N, 4))
    quats = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    opac = rng.uniform(0.05, 1.0, N).astype(np.float32)
    # A stack of near-opaque overlapping splats in front of the image
    # center: exercises the 0.99 alpha clamp AND drives T below 1e-4 so
    # the early-termination rule actually fires in the golden.
    for k in range(3, 10):
        opac[k] = 1.0
        xyz[k] = (0.15 * (k - 6), 0.1 * (k - 6), 1.2 + 0.15 * k)
        scales[k] = (0.35, 0.35, 0.35)
    dc = rng.normal(0, 0.8, (N, 1, 3)).astype(np.float32)
    sh_rest = (rng.normal(0, 0.25, (N, 15, 3))).astype(np.float32)
    return xyz, scales, quats, opac, dc, sh_rest


def main():
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from gsdf_slam_tpu.ops.transforms import CameraMatrices

    xyz, scales, quats, opac, dc, sh_rest = make_scene()
    cam = CameraMatrices.from_pose(
        np.array([0.995, 0.05, -0.08, 0.02]), np.array([0.1, -0.05, 0.2]),
        1.2, 1.2,
    )
    view = np.asarray(cam.view, np.float64)
    full = np.asarray(cam.full_proj, np.float64)
    campos = np.asarray(cam.campos, np.float64)
    bg = np.array([0.15, 0.08, 0.3])

    img, final_t = forward_golden(
        xyz, scales, quats, opac, dc, sh_rest, view, full, campos,
        float(cam.tanfovx), float(cam.tanfovy), bg,
    )
    out = Path(__file__).resolve().parent / "forward_golden.npz"
    np.savez_compressed(
        out, xyz=xyz, scales=scales, quats=quats, opac=opac, dc=dc,
        sh_rest=sh_rest, view=view.astype(np.float32),
        full_proj=full.astype(np.float32), campos=campos.astype(np.float32),
        tanfovx=np.float32(cam.tanfovx), tanfovy=np.float32(cam.tanfovy),
        bg=bg.astype(np.float32), image=img, final_t=final_t,
    )
    print("wrote", out, "mean", img.mean(), "minT", final_t.min())


if __name__ == "__main__":
    main()
