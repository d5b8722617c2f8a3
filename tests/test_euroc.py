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
