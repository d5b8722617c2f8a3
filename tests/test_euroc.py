"""EuRoC stereo path on a synthetic fixture: parsing, rectification, SGBM
depth, and colorized-cloud geometry."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def fake_euroc(tmp_path):
    """Minimal EuRoC layout: identical pinhole cams with a pure-x baseline,
    a textured fronto-parallel plane at known depth."""
    rng = np.random.default_rng(0)
    base = tmp_path / "seq" / "mav0"
    fx = fy = 200.0
    cx, cy = 376.0, 240.0
    baseline = 0.2
    depth = 5.0
    # plane texture rendered for each camera: x_right = x_left - fx*b/z
    disparity = fx * baseline / depth
    tex = rng.uniform(0, 255, (480 + 64, 752 + 256)).astype(np.uint8)
    tex = cv2.GaussianBlur(tex, (5, 5), 0)
    left = tex[32 : 32 + 480, 128 : 128 + 752]
    right = tex[32 : 32 + 480, 128 + int(round(disparity)) : 128 + int(round(disparity)) + 752]

    t = 1403636579763555584  # EuRoC-style ns timestamp
    for cam, img in (("cam0", left), ("cam1", right)):
        d = base / cam / "data"
        d.mkdir(parents=True)
        cv2.imwrite(str(d / f"{t}.png"), img)
        k = [fx, fy, cx, cy]
        t_bs = np.eye(4)
        if cam == "cam1":
            t_bs[0, 3] = baseline  # cam1 sits +x of cam0 in body frame
        (base / cam / "sensor.yaml").write_text(
            "intrinsics: [{}, {}, {}, {}]\n".format(*k)
            + "distortion_coefficients: [0.0, 0.0, 0.0, 0.0]\n"
            + "T_BS:\n  data: [{}]\n".format(
                ", ".join(str(v) for v in t_bs.reshape(-1))
            )
        )
    gt = base / "state_groundtruth_estimate0"
    gt.mkdir(parents=True)
    (gt / "data.csv").write_text(
        f"#timestamp,px,py,pz,qw,qx,qy,qz\n{t},0,0,0,1,0,0,0\n"
    )
    return tmp_path / "seq"


def test_euroc_stereo_depth_and_cloud(fake_euroc):
    from gsdf_slam_tpu.data import DataLoader

    dl = DataLoader(fake_euroc, "euroc", cloud_stride=8)
    assert len(dl) == 1
    fr = dl.get_item(0)
    assert fr.image.shape == (480, 752, 3)
    assert len(fr.points) > 500, "SGBM found too little depth"
    # plane at z=5 in the camera frame; pose is identity body frame
    z = fr.points[:, 2]
    med = float(np.median(z))
    assert abs(med - 5.0) < 0.35, f"median depth {med} != 5.0"
    assert np.isfinite(fr.points).all()
    assert 0.0 <= fr.colors.min() and fr.colors.max() <= 1.0


def test_euroc_rotated_rig_plane_geometry(tmp_path):
    """Rotated stereo rig (cam1 yawed 2 deg): R1 != I, so a transposed
    rectification rotation in the loader (`pts_rect @ R1`, loader.py) would
    tilt the recovered plane by ~4 deg. The backprojected cloud must stay a
    fronto-parallel z=5 plane in the world frame (VERDICT r1 weak #7)."""
    rng = np.random.default_rng(1)
    base = tmp_path / "seq" / "mav0"
    fx = fy = 200.0
    cx, cy = 376.0, 240.0
    baseline = 0.2
    depth = 5.0
    yaw = np.deg2rad(2.0)

    k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    r_bs1 = np.array(
        [[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]]
    )
    # non-axis-aligned baseline: rectification aligns the new x-axis with
    # the baseline, forcing R1 itself ~8.5 deg away from identity (with a
    # pure-x baseline R1 stays ~I and a transposed R1 would go unnoticed)
    t_bs1 = np.array([baseline, 0.0, 0.03])
    # world->cam1 (body == cam0 == world here)
    r10 = r_bs1.T
    t10 = -r10 @ t_bs1
    n = np.array([0.0, 0.0, 1.0])
    h10 = k @ (r10 + np.outer(t10, n) / depth) @ np.linalg.inv(k)

    tex = rng.uniform(0, 255, (480, 752)).astype(np.uint8)
    tex = cv2.GaussianBlur(tex, (5, 5), 0)
    left = tex
    right = cv2.warpPerspective(left, h10, (752, 480))

    t = 1403636579763555584
    for cam, img, t_bs_r, t_bs_t in (
        ("cam0", left, np.eye(3), np.zeros(3)),
        ("cam1", right, r_bs1, t_bs1),
    ):
        d = base / cam / "data"
        d.mkdir(parents=True)
        cv2.imwrite(str(d / f"{t}.png"), img)
        t_bs = np.eye(4)
        t_bs[:3, :3] = t_bs_r
        t_bs[:3, 3] = t_bs_t
        (base / cam / "sensor.yaml").write_text(
            f"intrinsics: [{fx}, {fy}, {cx}, {cy}]\n"
            + "distortion_coefficients: [0.0, 0.0, 0.0, 0.0]\n"
            + "T_BS:\n  data: [{}]\n".format(
                ", ".join(str(v) for v in t_bs.reshape(-1))
            )
        )
    gt = base / "state_groundtruth_estimate0"
    gt.mkdir(parents=True)
    (gt / "data.csv").write_text(
        f"#timestamp,px,py,pz,qw,qx,qy,qz\n{t},0,0,0,1,0,0,0\n"
    )

    from gsdf_slam_tpu.data import DataLoader

    dl = DataLoader(tmp_path / "seq", "euroc", cloud_stride=8)
    fr = dl.get_item(0)
    pts = fr.points
    assert len(pts) > 300
    # keep the well-conditioned central region (warp edges are invalid)
    sel = (np.abs(pts[:, 0]) < 6.0) & (np.abs(pts[:, 1]) < 4.0)
    pts = pts[sel]
    med = float(np.median(pts[:, 2]))
    assert abs(med - depth) < 0.35, f"median depth {med} != {depth}"
    # plane tilt: fit z = a*x + b*y + c; a transposed R1 gives |a| ~ 0.07
    a_mat = np.stack([pts[:, 0], pts[:, 1], np.ones(len(pts))], -1)
    coef, *_ = np.linalg.lstsq(a_mat, pts[:, 2], rcond=None)
    assert abs(coef[0]) < 0.02, f"plane tilted in x: slope {coef[0]}"
    assert abs(coef[1]) < 0.02, f"plane tilted in y: slope {coef[1]}"


def test_train_euroc_stereo_demo(fake_euroc, tmp_path, monkeypatch):
    """BASELINE config #4 entrypoint end-to-end on the synthetic rig:
    rectify -> SGBM -> feed_keyframe -> live render/eval -> results
    (VERDICT r4 item 6; mirrors scripts/euroc_stereo.sh)."""
    import importlib
    import json
    import sys

    demo = importlib.import_module("demo.train_euroc_stereo")
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "train_euroc_stereo.py", str(fake_euroc),
        "--extra-iterations", "3", "--eval-interval", "1",
        "--cloud-stride", "8", "--capacity", "4096",
        "--output", str(out),
    ])
    demo.main()
    evals = json.loads((out / "live_eval.json").read_text())
    assert len(evals) == 1 and np.isfinite(evals[0]["psnr_db"])
    assert evals[0]["gaussians"] > 0
    plys = list(out.rglob("*.ply"))
    assert plys, "no PLY checkpoint written"
