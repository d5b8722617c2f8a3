"""SLAM-era machinery tests: monocular inactive-geo densify + depth cache
(include/gaussian_mapper.h:252-262) and loop-closure existence pruning
(stable_num_iter_existence_, :275)."""

import dataclasses

import numpy as np
import pytest

from test_mapper import _mapper, make_frames

I4 = np.eye(4, dtype=np.float32)


def _img(rng, hw=(32, 32)):
    return rng.uniform(0.1, 0.9, (*hw, 3)).astype(np.float32)


def test_mono_points_free_stream_grows_geometry():
    """A feed_keyframe stream with NO points and NO depth must still grow
    geometry via inactive-geo densify (bootstrap prior + rendered depth)."""
    rng = np.random.default_rng(0)
    m = _mapper(make_frames(n=1))
    assert m.settings.do_inactive_geo_densify  # default on, like the member
    for i in range(3):
        pose = I4.copy()
        pose[0, 3] = 0.02 * i
        m.feed_keyframe(i, pose, _img(rng))
        out = m.train_for_one_iteration()
        assert out is not None and np.isfinite(out["loss"])
    assert int(m.state.count) > 0


def test_mono_sparse_depth_propagation():
    """Sparse tracker points propagate their depth to nearby pixels; grown
    geometry sits near the sparse depth, not the bootstrap prior."""
    rng = np.random.default_rng(1)
    m = _mapper(make_frames(n=1))
    m.settings = dataclasses.replace(
        m.settings,
        inactive_geo_densify_max_pixel_dist=50.0,
        monocular_init_depth=2.0,
    )
    # sparse wall at z=4 covering the view frustum
    g = np.linspace(-3, 3, 12)
    xx, yy = np.meshgrid(g, g)
    pts = np.stack([xx.reshape(-1), yy.reshape(-1), np.full(144, 4.0)], -1).astype(
        np.float32
    )
    m.feed_keyframe(0, I4, _img(rng), points=pts,
                    colors=np.full((144, 3), 0.5, np.float32))
    n = int(m.state.count)
    assert n > len(pts)  # sparse points + densified pixels
    xyz = np.asarray(m.state.xyz[:n])
    # densified points inherit z≈4 from the nearest sparse pixel
    assert np.quantile(xyz[:, 2], 0.1) > 3.5


def test_depth_cache_flush_cadence():
    """max_depth_cached=2: first mono keyframe only caches, second flushes
    the pooled cloud into increasePcd (depth_cached_/max_depth_cached_)."""
    rng = np.random.default_rng(2)
    m = _mapper(make_frames(n=1))
    m.settings = dataclasses.replace(m.settings, max_depth_cached=2)
    m.feed_keyframe(0, I4, _img(rng))
    assert m.depth_cached == 1 and int(m.state.count) == 0
    m.feed_keyframe(1, I4, _img(rng))
    assert m.depth_cached == 0 and len(m.depth_cache_points) == 0
    assert int(m.state.count) > 0


def test_existence_pruning_on_large_pose_update():
    """A large pose correction prunes Gaussians younger than
    stable_num_iter_existence; stable ones survive."""
    rng = np.random.default_rng(3)
    frames = make_frames(n=2)
    m = _mapper(frames)
    m.settings = dataclasses.replace(
        m.settings,
        stable_num_iter_existence=5,
        large_rotation_threshold=10.0,  # degrees
        large_translation_threshold=1.0,
    )
    m.ingest_frame(0, frames[0])
    n0 = int(m.state.count)
    assert n0 > 0
    for _ in range(8):  # age the initial map well past stability
        m.train_for_one_iteration()
    # new young geometry at iteration 8
    m.ingest_frame(1, frames[1])
    n1 = int(m.state.count)
    assert n1 > n0
    # small correction: no pruning
    pose = np.linalg.inv(frames[1].cam_pose.astype(np.float64))
    t_wc_small = frames[1].cam_pose.copy()
    t_wc_small[0, 3] += 0.01
    m.update_keyframe_pose(1, t_wc_small)
    assert int(m.state.count) == n1
    # big rotation: young points (exist_since_iter == 8 > 8 - 5) pruned
    th = np.deg2rad(25.0)
    rot = np.eye(4, dtype=np.float32)
    rot[:3, :3] = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    m.update_keyframe_pose(1, (rot @ t_wc_small.astype(np.float64)).astype(np.float32))
    n2 = int(m.state.count)
    assert n2 < n1
    assert n2 > 0  # the aged initial map survives
    # survivors are exactly the stable ones
    exist = np.asarray(m.state.exist_since_iter[:n2])
    assert np.all(exist <= m.iteration - m.settings.stable_num_iter_existence)


def test_render_depth_state():
    """Expected-depth render returns the Gaussian depth where coverage."""
    import jax.numpy as jnp

    from gsdf_slam_tpu.engine.train import render_depth_state
    from gsdf_slam_tpu.models.gaussian_model import create_from_pcd
    from gsdf_slam_tpu.ops.rasterize import RasterizeConfig
    from gsdf_slam_tpu.ops.transforms import CameraMatrices

    rng = np.random.default_rng(4)
    pts = np.stack(
        [rng.uniform(-1.5, 1.5, 80), rng.uniform(-1.5, 1.5, 80),
         np.full(80, 3.0)], -1
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (80, 3)).astype(np.float32)
    state = create_from_pcd(jnp.asarray(pts), jnp.asarray(cols),
                            jnp.ones(80, bool), 128)
    # crank opacity for solid coverage
    state = state.replace(opacity=jnp.full((128, 1), 4.0))
    cam = CameraMatrices.from_pose(
        q=np.array([1.0, 0, 0, 0]), t=np.zeros(3),
        fovx=np.pi / 2, fovy=np.pi / 2
    )
    cfg = RasterizeConfig(height=32, width=32, max_pairs=1 << 13)
    depth, cov = render_depth_state(state, cam, cfg)
    depth, cov = np.asarray(depth), np.asarray(cov)
    covered = cov > 0.5
    assert covered.mean() > 0.3
    np.testing.assert_allclose(depth[covered], 3.0, atol=0.1)


@pytest.mark.slow
def test_undistortion_wired_with_pyramid_masks():
    """A distorted camera gets undistorted at ingest; the black remap edges
    are masked at EVERY pyramid level (gaussian_mapper.cpp:172-204, 415-417;
    camera.h:72-105)."""
    pytest.importorskip("cv2")
    from gsdf_slam_tpu.data import CameraIntrinsics

    rng = np.random.default_rng(5)
    h, w = 48, 64
    m = _mapper(make_frames(n=1, hw=(h, w)))
    m.dataloader = None  # SLAM feed path
    m.settings = dataclasses.replace(
        m.settings,
        do_gaus_pyramid_training=True,
        num_gaus_pyramid_sub_levels=2,
        gaus_pyramid_sub_level_times_of_use=1,
        do_inactive_geo_densify=False,
    )
    intr = CameraIntrinsics(
        fx=w / 2, fy=w / 2, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h,
        dist=np.array([0.4, 0.0, 0.0, 0.0]),  # pincushion -> black corners
    )
    img = rng.uniform(0.2, 0.9, (h, w, 3)).astype(np.float32)
    kf = m.feed_keyframe(0, I4, img, depth=np.full((h, w), 3.0, np.float32),
                         intrinsics=intr)
    assert len(m._undistorters) == 1
    assert kf.mask is not None
    assert kf.mask.min() == 0.0 and kf.mask.max() == 1.0  # black corners masked
    assert len(kf.pyramid_masks) == 2
    for lvl, pm in enumerate(kf.pyramid_masks):
        assert pm.shape == kf.pyramid_images[lvl].shape[:2]
        assert pm.min() == 0.0  # corner masking survives downscale
    # training at a sub-level applies the level mask (no crash, finite loss)
    out = m.train_for_one_iteration()
    assert out is not None and np.isfinite(out["loss"])
