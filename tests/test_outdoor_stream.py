"""Outdoor streaming end-to-end: the KITTI operating mode on a synthetic
drive — colorized LiDAR clouds, 1 training iteration per ingested frame
(gaussian_mapper.cpp:328-331), LIVE sky segmentation through the in-repo
ONNX runtime, growth via increasePcd dedup, shipped cfg/kitti.yaml."""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from test_skyseg import _write_brightness_net


@pytest.mark.slow
def test_kitti_mode_streaming_with_live_skyseg(tmp_path):
    pytest.importorskip("cv2")
    from benchmarks.synthetic_outdoor import (
        drive_pose,
        lidar_cloud,
        raycast_outdoor,
    )
    from gsdf_slam_tpu.data.loader import FrameData
    from gsdf_slam_tpu.engine import GaussianMapper, MapperSettings

    onnx = tmp_path / "skyseg.onnx"
    _write_brightness_net(onnx)

    root = Path(__file__).resolve().parent.parent
    settings = MapperSettings.from_yaml(root / "cfg" / "kitti.yaml")
    settings = dataclasses.replace(
        settings,
        skyseg_onnx_path=str(onnx),
        new_keyframe_times_of_use=30,  # revisit budget for the polish phase
    )
    m = GaussianMapper(
        settings=settings, capacity=1 << 15, max_pairs=1 << 17,
        ingest_capacity=1 << 12,
    )

    w, h = 96, 64
    n_frames = 16
    for i in range(n_frames):
        pose = drive_pose(2.0 * i, sway=0.3 * np.sin(0.4 * i))
        rgb, _ = raycast_outdoor(pose, w, h)
        pts, cols = lidar_cloud(pose, w, h, stride=3)
        kf = m.ingest_frame(i, FrameData(
            cam_pose=pose, points=pts, colors=cols, image=rgb,
        ))
        out = m.train_for_one_iteration()  # 1 iter per frame, like KITTI
        assert out is not None and np.isfinite(out["loss"])
    n_stream = int(m.state.count)
    assert n_stream > 2000  # increasePcd grew the map along the drive

    # live skyseg blacked out the sky and masked it from the loss:
    # the top image rows are sky along the whole drive
    assert kf.mask is not None
    assert kf.mask[:10].mean() < 0.1
    assert kf.mask[-10:].mean() > 0.9
    assert np.all(kf.image[:5] == 0.0)

    # offline polish on the accumulated keyframes, then evaluate a
    # held-out pose on NON-sky pixels
    for _ in range(150):
        m.train_for_one_iteration()
    eval_pose = drive_pose(2.0 * (n_frames - 4) + 1.0, sway=0.1)
    gt, depth = raycast_outdoor(eval_pose, w, h)
    img = m.render_from_pose(
        np.linalg.inv(eval_pose.astype(np.float64)).astype(np.float32), w, h
    )
    nonsky = np.isfinite(depth) & (depth < 50.0)
    assert nonsky.mean() > 0.3
    mse = float(np.mean((img[nonsky] - gt[nonsky]) ** 2))
    psnr = -10 * np.log10(mse)
    assert np.isfinite(psnr) and psnr >= 17.0, psnr
    # the trained model carries no bright sky geometry: rendered sky stays
    # near the (black) background
    sky = ~np.isfinite(depth)
    assert img[sky].mean() < 0.25
