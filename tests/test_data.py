"""Data-plane tests on synthetic fixtures: poses, calib, IO, colorization."""

import numpy as np
import pytest

from gsdf_slam_tpu.data import (
    CameraIntrinsics,
    DataLoader,
    load_poses,
    read_kitti_bin,
    read_pcd,
)
from gsdf_slam_tpu.data.replica import backproject_depth
from gsdf_slam_tpu.io import read_ply, write_ply


def test_pose_formats(tmp_path):
    m = np.arange(16, dtype=np.float64).reshape(4, 4)
    # type 0: 4 numbers per line
    p0 = tmp_path / "p0.txt"
    p0.write_text("\n".join(" ".join(str(v) for v in row) for row in m) + "\n")
    poses, _ = load_poses(p0, 0)
    np.testing.assert_allclose(poses[0], m, atol=1e-6)
    # type 1: 16 per line
    p1 = tmp_path / "p1.txt"
    p1.write_text(" ".join(str(v) for v in m.reshape(-1)) + "\n")
    poses, _ = load_poses(p1, 1)
    np.testing.assert_allclose(poses[0], m, atol=1e-6)
    # type 2: KITTI 12 per line, bottom row identity
    p2 = tmp_path / "p2.txt"
    p2.write_text(" ".join(str(v) for v in m[:3].reshape(-1)) + "\n")
    poses, _ = load_poses(p2, 2)
    np.testing.assert_allclose(poses[0, :3], m[:3], atol=1e-6)
    np.testing.assert_allclose(poses[0, 3], [0, 0, 0, 1], atol=1e-6)
    # type 3: TUM t x y z qx qy qz qw — identity quat
    p3 = tmp_path / "p3.txt"
    p3.write_text("123.5 1 2 3 0 0 0 1\n")
    poses, stamps = load_poses(p3, 3)
    np.testing.assert_allclose(poses[0][:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(poses[0][:3, 3], [1, 2, 3], atol=1e-6)
    assert stamps[0] == 123.5


def test_kitti_bin_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(10, 4)).astype(np.float32)
    f = tmp_path / "000000.bin"
    pts.tofile(f)
    got = read_kitti_bin(f)
    np.testing.assert_allclose(got, pts[:, :3])


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    props = {"x": rng.normal(size=7).astype(np.float32),
             "y": rng.normal(size=7).astype(np.float32),
             "z": rng.normal(size=7).astype(np.float32)}
    f = tmp_path / "cloud.ply"
    write_ply(f, props)
    back = read_ply(f)
    for k in props:
        np.testing.assert_allclose(back[k], props[k], atol=1e-7)


def test_pcd_ascii(tmp_path):
    f = tmp_path / "c.pcd"
    f.write_text(
        "# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
        "COUNT 1 1 1\nWIDTH 2\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        "POINTS 2\nDATA ascii\n1 2 3\n4 5 6\n"
    )
    got = read_pcd(f)
    np.testing.assert_allclose(got, [[1, 2, 3], [4, 5, 6]])


def test_backproject_depth():
    intr = CameraIntrinsics(fx=10.0, fy=10.0, cx=2.0, cy=2.0, width=5, height=5)
    depth = np.zeros((5, 5), np.float32)
    depth[2, 2] = 2.0  # principal point -> straight ahead
    depth[0, 0] = 1.0
    pts = backproject_depth(depth, intr)
    assert pts.shape == (2, 3)
    np.testing.assert_allclose(pts[1], [0, 0, 2.0], atol=1e-6)
    np.testing.assert_allclose(pts[0], [-0.2, -0.2, 1.0], atol=1e-6)


@pytest.fixture
def fake_kitti(tmp_path):
    cv2 = pytest.importorskip("cv2")
    base = tmp_path / "kitti"
    (base / "image_2").mkdir(parents=True)
    (base / "velodyne").mkdir()
    fx = fy = 50.0
    cx, cy = 32.0, 16.0
    (base / "calib.txt").write_text(
        f"P0: {fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0\n"
        f"P2: {fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0\n"
        "Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n"
    )
    (base / "poses.txt").write_text("1 0 0 0 0 1 0 0 0 0 1 0\n")
    img = np.zeros((32, 64, 3), np.uint8)
    img[:, :, 2] = 255  # red in RGB = channel 2 in BGR file
    cv2.imwrite(str(base / "image_2" / "000000.png"), img)
    pts = np.array([[0.0, 0.0, 5.0, 0.0], [0.0, 0.0, -5.0, 0.0]], np.float32)
    pts.tofile(base / "velodyne" / "000000.bin")
    return base


def test_kitti_loader_colorizes(fake_kitti):
    dl = DataLoader(fake_kitti, "kitti", cloud_capacity=16)
    assert len(dl) == 1
    fr = dl.get_item(0)
    # only the point in front of the camera survives; it lands on the
    # principal point of a pure-red image
    assert fr.points.shape == (1, 3)
    np.testing.assert_allclose(fr.points[0], [0, 0, 5.0], atol=1e-5)
    np.testing.assert_allclose(fr.colors[0], [1.0, 0, 0], atol=1e-5)
    # intrinsics hardcode 1226x370 like the reference parser
    assert dl.frames.intrinsics.width == 1226


def test_tum_parser_and_mono_feed(tmp_path):
    """TUM layout parsing (timestamps, TUM pose format, association) and the
    mono SLAM feed with fr1's real distortion -> undistorter engages."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    seq = tmp_path / "rgbd_dataset_freiburg1_fake"
    (seq / "rgb").mkdir(parents=True)
    rgb_lines, gt_lines = [], []
    for i in range(3):
        t = 1305031102.175304 + 0.1 * i
        name = f"rgb/{t:.6f}.png"
        img = (rng.uniform(0, 255, (480, 640, 3))).astype(np.uint8)
        cv2.imwrite(str(seq / name), img)
        rgb_lines.append(f"{t:.6f} {name}")
        # pose at t + tiny offset tests nearest-timestamp association
        gt_lines.append(f"{t + 0.004:.6f} {0.01 * i} 0 0 0 0 0 1")
    # NO depth.txt: real monocular sequences ship rgb+groundtruth only
    (seq / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (seq / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines) + "\n")

    from gsdf_slam_tpu.data.tum import TUM_INTRINSICS, TumParser

    parser = TumParser(seq, family="fr1")
    fr = parser.frames()
    assert len(fr.color_files) == 3
    assert fr.color_poses.shape == (3, 4, 4)
    np.testing.assert_allclose(fr.color_poses[1][:3, 3], [0.01, 0, 0], atol=1e-6)
    assert TUM_INTRINSICS["fr1"].dist is not None

    from test_mapper import _mapper, make_frames

    m = _mapper(make_frames(n=1))
    m.dataloader = None
    img = cv2.cvtColor(cv2.imread(str(fr.color_files[0])), cv2.COLOR_BGR2RGB)
    kf = m.feed_keyframe(
        0, fr.color_poses[0].astype(np.float32),
        img.astype(np.float32) / 255.0, intrinsics=TUM_INTRINSICS["fr1"],
    )
    # fr1 distortion -> undistorter built, loss mask present
    assert len(m._undistorters) == 1
    assert kf.mask is not None
