"""Fisheye (Kannala-Brandt) camera model support.

The reference's Camera carries a PINHOLE/FISHEYE model id
(include/camera.h:52-54) for the legacy Photo-SLAM fisheye-calibrated rigs;
engine/camera_undistort.py implements the fisheye path with cv2.fisheye.
These tests build a synthetic KB rig and verify the undistortion maps,
masks, depth backprojection, YAML config knob, and a full mapper ingest +
train iteration on distorted fisheye input.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

# a TUM-VI-class Kannala-Brandt calibration (near-equidistant, monotone
# theta-polynomial — wild made-up coefficients are non-invertible at the
# corners), scaled to a small test image
W, H = 128, 96
K = np.array([[80.0, 0, 63.5], [0, 80.0, 47.5], [0, 0, 1.0]])
D_KB = np.array([0.0034, 0.0007, -0.0039, 0.0005])  # k1..k4


def _render_checker(width, height, period=16):
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    return (((xs // period) + (ys // period)) % 2).astype(np.float32)


def _distort_image(ideal, k, d):
    """Synthesize the DISTORTED capture of an ideal-pinhole scene: for each
    distorted pixel, find the ideal pixel it observes (undistort maps do the
    inverse lookup, so the round trip below is exact by construction)."""
    h, w = ideal.shape[:2]
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.stack([xs, ys], -1).reshape(-1, 1, 2).astype(np.float64)
    norm = cv2.fisheye.undistortPoints(pix.transpose(1, 0, 2), k, d.reshape(4, 1))
    norm = norm.reshape(-1, 2)
    ix = (k[0, 0] * norm[:, 0] + k[0, 2]).reshape(h, w).astype(np.float32)
    iy = (k[1, 1] * norm[:, 1] + k[1, 2]).reshape(h, w).astype(np.float32)
    return cv2.remap(ideal, ix, iy, cv2.INTER_LINEAR)


def test_fisheye_undistort_roundtrip():
    from gsdf_slam_tpu.engine.camera_undistort import UndistortRectifier

    ideal = _render_checker(W, H)
    distorted = _distort_image(ideal, K, D_KB)
    u = UndistortRectifier(K, D_KB, W, H, model="fisheye")
    rec = u.undistort(distorted)
    # central region (well inside the valid mask) must match the ideal
    # pinhole view; borders may be black (mask handles them)
    c = (slice(H // 4, 3 * H // 4), slice(W // 4, 3 * W // 4))
    valid = u.mask[c] > 0
    assert valid.mean() > 0.9
    err = np.abs(rec[c] - ideal[c])[valid]
    assert np.mean(err) < 0.08, f"mean err {np.mean(err):.3f}"
    assert u.mask.shape == (H, W)
    masks = u.pyramid_masks([0.5])
    assert masks[0].shape == (H // 2, W // 2)
    # widening the rectified FOV past the capture (smaller new-K focal)
    # samples outside the source image -> the mask must flag those pixels
    new_k = K.copy()
    new_k[0, 0] *= 0.4
    new_k[1, 1] *= 0.4
    uw = UndistortRectifier(K, D_KB, W, H, new_k=new_k, model="fisheye")
    assert uw.mask.mean() < 1.0
    assert uw.mask[H // 2, W // 2] == 1.0  # center still valid


def test_fisheye_backproject_projects_back():
    from gsdf_slam_tpu.engine.camera_undistort import UndistortRectifier

    u = UndistortRectifier(K, D_KB, W, H, model="fisheye")
    rng = np.random.default_rng(0)
    depth = rng.uniform(1.0, 3.0, (H, W)).astype(np.float32)
    pts = u.backproject_depth(depth, stride=4)
    assert pts.shape[1] == 3 and len(pts) == (H // 4) * (W // 4)
    # KB-project the camera-frame points back: must land on the source pixels
    proj, _ = cv2.fisheye.projectPoints(
        pts.reshape(-1, 1, 3).astype(np.float64), np.zeros(3), np.zeros(3),
        K, D_KB.reshape(4, 1),
    )
    proj = proj.reshape(-1, 2)
    ys, xs = np.meshgrid(np.arange(0, H, 4), np.arange(0, W, 4), indexing="ij")
    src = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float64)
    assert np.max(np.abs(proj - src)) < 1e-3


def test_intrinsics_from_yaml_models(tmp_path):
    from gsdf_slam_tpu.data.base_parser import intrinsics_from_yaml

    fe = tmp_path / "fisheye.yaml"
    fe.write_text(
        "%YAML:1.0\n"
        'Camera.type: "KannalaBrandt8"\n'
        "Camera1.fx: 190.9\nCamera1.fy: 190.9\n"
        "Camera1.cx: 254.9\nCamera1.cy: 256.8\n"
        "Camera1.k1: 0.0034\nCamera1.k2: 0.0007\n"
        "Camera1.k3: -0.0039\nCamera1.k4: 0.0005\n"
        "Camera.width: 512\nCamera.height: 512\n"
    )
    intr = intrinsics_from_yaml(fe)
    assert intr.model == "fisheye"
    assert intr.width == 512 and abs(intr.fx - 190.9) < 1e-9
    np.testing.assert_allclose(intr.dist, [0.0034, 0.0007, -0.0039, 0.0005])

    ph = tmp_path / "pinhole.yaml"
    ph.write_text(
        "%YAML:1.0\n"
        'Camera.type: "PinHole"\n'
        "Camera1.fx: 458.654\nCamera1.fy: 457.296\n"
        "Camera1.cx: 367.215\nCamera1.cy: 248.375\n"
        "Camera1.k1: -0.28340811\nCamera1.k2: 0.07395907\n"
        "Camera1.p1: 0.00019359\nCamera1.p2: 1.76187114e-05\n"
        "Camera.width: 752\nCamera.height: 480\n"
    )
    intr = intrinsics_from_yaml(ph)
    assert intr.model == "pinhole"
    assert intr.dist is not None and abs(intr.dist[0] + 0.28340811) < 1e-9

    rect = tmp_path / "rect.yaml"
    rect.write_text(
        "%YAML:1.0\n"
        'Camera.type: "Rectified"\n'
        "Camera.fx: 320.0\nCamera.fy: 320.0\n"
        "Camera.cx: 320.0\nCamera.cy: 240.0\n"
        "Camera.width: 640\nCamera.height: 480\n"
    )
    intr = intrinsics_from_yaml(rect)
    assert intr.model == "pinhole" and intr.dist is None


def test_mapper_trains_on_fisheye_ingest():
    """Distorted fisheye RGB-D frames ingest + train with the undistortion
    mask wired through the loss (gaussian_mapper.cpp:415-417 analog)."""
    from gsdf_slam_tpu.data import CameraIntrinsics
    from gsdf_slam_tpu.engine import GaussianMapper, MapperSettings

    intr = CameraIntrinsics(
        fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2],
        width=W, height=H, dist=D_KB.copy(), model="fisheye",
    )
    ideal = np.repeat(_render_checker(W, H)[..., None], 3, -1)
    distorted = _distort_image(ideal, K, D_KB)
    rng = np.random.default_rng(1)
    depth = rng.uniform(1.5, 2.5, (H, W)).astype(np.float32)

    m = GaussianMapper(
        settings=MapperSettings(), capacity=1 << 12, max_pairs=1 << 14,
        ingest_capacity=1 << 10,
    )
    m.feed_keyframe(0, np.eye(4, dtype=np.float32), distorted, depth=depth,
                    intrinsics=intr)
    out = m.train_for_one_iteration()
    assert out is not None and np.isfinite(out["loss"])
    # the keyframe trains on the UNDISTORTED image with the fisheye mask
    kf = next(iter(m.scene.keyframes.values()))
    assert kf.mask is not None and 0.0 < float(np.mean(kf.mask)) <= 1.0
    # a fisheye undistorter was built (not the radtan one)
    (und,) = m._undistorters.values()
    assert und.model == "fisheye"
