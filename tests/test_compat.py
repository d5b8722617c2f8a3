"""Reference-named facade smoke test (gsdf_slam_tpu.compat)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_compat_model_renderer_scene_roundtrip():
    from gsdf_slam_tpu.compat import (
        Camera,
        GaussianKeyframe,
        GaussianModel,
        GaussianRenderer,
        GaussianScene,
    )

    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-1.5, 1.5, 80), rng.uniform(-1.5, 1.5, 80),
         rng.uniform(2.5, 4.0, 80)], -1,
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (80, 3)).astype(np.float32)

    model = GaussianModel(sh_degree=3, capacity=256)
    model.create_from_pcd(pts, cols)
    assert len(model) == 80
    model.increase_pcd(pts + 10.0, cols, iteration=1)  # disjoint voxels
    assert len(model) == 160
    model.reset_opacity()
    assert float(np.max(np.asarray(model.opacity))) <= 0.011

    scene = GaussianScene()
    cam = Camera(0, 24.0, 24.0, 15.5, 15.5, 32, 32)
    scene.add_camera(cam)
    kf = GaussianKeyframe(
        fid=0, camera=cam, t_cw=np.eye(4, dtype=np.float32),
        image=np.zeros((32, 32, 3), np.float32),
    )
    scene.add_keyframe(kf)
    _, extent = scene.nerfpp_norm()
    assert extent >= 0.0

    out = GaussianRenderer.render(kf, 32, 32, model)
    assert out.image.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(out.image)).all()

    # drop gaussians with exist_since_iter > iteration - stable = 0:
    # the increase_pcd batch (exist=1) goes, the initial batch (0) stays
    model.prune_young(iteration=6, stable_num_iter=6)
    assert len(model) == 80
