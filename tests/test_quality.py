"""Quality regression: the mapper must train the committed synthetic room
(benchmarks/synthetic_room.py) to a held-out PSNR floor through the public
RGB-D keyframe path — the standing guard for the BASELINE quality target."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_synthetic_room_raycaster_is_deterministic():
    from benchmarks.synthetic_room import raycast_room, room_pose

    pose = room_pose(0.7, 0.1)
    rgb1, d1 = raycast_room(pose, 64, 48)
    rgb2, d2 = raycast_room(pose, 64, 48)
    np.testing.assert_array_equal(rgb1, rgb2)
    assert rgb1.shape == (48, 64, 3) and d1.shape == (48, 64)
    assert np.all(np.isfinite(d1)) and np.all(d1 > 0.3) and np.all(d1 < 8.0)
    assert rgb1.std() > 0.1  # textured, not flat


@pytest.mark.slow
def test_quality_floor_on_mini_room():
    """Train a small room config end-to-end; held-out PSNR floor.

    This config measured 23.2 dB / 0.75 SSIM (CPU, 2026-08); the floor
    leaves ~1 dB margin for seed/backend noise. ~5 minutes on CPU."""
    from benchmarks.quality import run_quality

    res = run_quality(
        n_frames=12,
        width=96,
        height=72,
        iterations=500,
        capacity=1 << 14,
        max_pairs=1 << 17,
        n_eval=4,
        times_of_use=60,
        progress=False,
    )
    assert np.isfinite(res["psnr_mean"])
    assert res["psnr_mean"] >= 22.0, res
    assert res["ssim_mean"] >= 0.70, res
