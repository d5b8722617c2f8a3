"""End-to-end mapper test: streaming ingest + train on a synthetic scene."""

import dataclasses

import numpy as np
import pytest

from gsdf_slam_tpu.config import OptimizationParams
from gsdf_slam_tpu.data.loader import FrameData
from gsdf_slam_tpu.engine import GaussianMapper, MapperSettings
from gsdf_slam_tpu.engine.settings import parse_opencv_yaml


def make_frames(n=3, seed=0, hw=(32, 32)):
    """Synthetic frames: colored wall points seen from slightly moved cams."""
    rng = np.random.default_rng(seed)
    h, w = hw
    frames = []
    for i in range(n):
        m = 60
        pts = np.stack(
            [rng.uniform(-2, 2, m), rng.uniform(-2, 2, m), rng.uniform(2.8, 3.4, m)],
            -1,
        ).astype(np.float32)
        cols = rng.uniform(0, 1, (m, 3)).astype(np.float32)
        pose = np.eye(4, dtype=np.float32)  # T_world_cam
        pose[0, 3] = 0.05 * i
        img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        frames.append(FrameData(cam_pose=pose, points=pts, colors=cols, image=img))
    return frames


class FakeLoader:
    def __init__(self, frames, intr):
        self._frames = frames
        from gsdf_slam_tpu.data import CameraIntrinsics, FrameSet

        self.frames = FrameSet(
            color_files=[], depth_files=[],
            color_poses=np.stack([f.cam_pose for f in frames]),
            depth_poses=np.stack([f.cam_pose for f in frames]),
            intrinsics=intr,
        )

    def __len__(self):
        return len(self._frames)

    def get_item(self, i):
        return self._frames[i]


def _mapper(frames, **kw):
    from gsdf_slam_tpu.data import CameraIntrinsics

    h, w = frames[0].image.shape[:2]
    intr = CameraIntrinsics(fx=w / 2, fy=w / 2, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h)
    settings = MapperSettings(
        opt=OptimizationParams(densification_interval=0, opacity_reset_interval=0),
        new_keyframe_times_of_use=2,
    )
    return GaussianMapper(
        settings=settings,
        dataloader=FakeLoader(frames, intr),
        capacity=512, max_pairs=2048, ingest_capacity=128,
        **kw,
    )


def test_streaming_run_and_results(tmp_path):
    frames = make_frames()
    m = _mapper(frames)
    m.result_dir = tmp_path
    m.run()
    assert m.iteration == 3
    assert int(m.state.count) > 0
    assert len(m.scene.keyframes) == 3
    # render from the first pose
    img = m.render_from_pose(np.eye(4, dtype=np.float32), 32, 32)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    # save + reload checkpoint round-trip
    ply = m.save_ply(tmp_path)
    assert ply.exists()
    assert (tmp_path / "cameras.json").exists()
    n_before = int(m.state.count)
    xyz_before = np.asarray(m.state.xyz[:n_before]).copy()
    m2 = GaussianMapper(capacity=256)
    m2.load_ply(ply)
    assert int(m2.state.count) == n_before
    np.testing.assert_allclose(np.asarray(m2.state.xyz[:n_before]), xyz_before, atol=1e-6)


def test_capacity_growth():
    frames = make_frames(n=2)
    m = _mapper(frames)
    m.capacity = 128
    m.ingest_frame(0, frames[0])
    assert m.state.capacity >= 128
    # force growth: ingest a big far-away cloud
    big = FrameData(
        cam_pose=np.eye(4, dtype=np.float32),
        points=np.random.default_rng(1).uniform(10, 20, (100, 3)).astype(np.float32),
        colors=np.zeros((100, 3), np.float32),
        image=frames[0].image,
    )
    m.ingest_frame(1, big)
    assert m.state.capacity >= 128
    assert int(m.state.count) > 60


def test_keyframe_sampling_budget():
    frames = make_frames(n=2)
    m = _mapper(frames)
    m.ingest_frame(0, frames[0])
    m.ingest_frame(1, frames[1])
    # budgets: 2 each; after 4 samples all exhausted -> refill path must not hang
    for _ in range(6):
        assert m.train_for_one_iteration() is not None
    assert sum(m.kfs_used_times.values()) == 6


def test_opencv_yaml_parsing(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text(
        "%YAML:1.0\n# comment\nModel.sh_degree: 3\n"
        "Optimization.densification_interval: 5\nOptimization.lambda_dssim: 0.2\n"
        "Mapper.new_keyframe_times_of_use: 7\nGausPyramid.do: 1\n"
        "GausPyramid.num_sub_levels: 2\nGausPyramid.sub_level_times_of_use: 4\n"
    )
    s = MapperSettings.from_yaml(y)
    assert s.opt.densification_interval == 5
    assert s.new_keyframe_times_of_use == 7
    assert s.do_gaus_pyramid_training and s.num_gaus_pyramid_sub_levels == 2
    # reference quirk: densify_from_iter_ key missing -> 0
    assert s.opt.densify_from_iter == 0
    kv = parse_opencv_yaml(y)
    assert kv["Optimization.lambda_dssim"] == 0.2


def test_sky_mask_applied():
    frames = make_frames(n=1)
    sky = np.zeros((32, 32), bool)
    sky[:16] = True
    m = _mapper(frames, sky_mask=sky)
    kf = m.ingest_frame(0, frames[0])
    assert kf.image[:16].max() == 0.0
    assert kf.mask is not None and kf.mask[:16].max() == 0.0 and kf.mask[16:].min() == 1.0


@pytest.mark.slow
def test_pair_overflow_retries_same_iteration(capsys):
    """Pair-capacity overflow must never yield a silently-wrong frame: the
    mapper detects total_pairs > max_pairs on the bundled per-step metrics
    fetch, grows the capacity, and redoes the step from the pre-step state
    (the reference's dynamically resized binning buffer,
    rasterize_points.cu:28-36, never drops pairs)."""
    frames = make_frames(n=1, hw=(64, 64))
    m = _mapper(frames)
    m.max_pairs = 256  # far below what 60 splats x 16 tiles can produce
    m.auto_size_pairs = True
    m.ingest_frame(0, frames[0])
    out = m.train_for_one_iteration()
    assert out is not None
    # the returned step is the VALID retry: pairs fit the (grown) capacity
    assert out["total_pairs"] <= m.max_pairs
    assert m.max_pairs > 16
    assert "pair overflow" in capsys.readouterr().out
    assert m.iteration == 1


def test_sh_degree_sizes_f_rest(tmp_path):
    """A sh_degree: 1 config trains (deg+1)^2-1 = 3 rest coefficients and
    exports the degree-1 3DGS PLY layout (f_rest_0..8), like the reference
    sizes features_rest by degree (gaussian_model.cpp:150-163)."""
    import dataclasses as dc

    from gsdf_slam_tpu.config import ModelParams
    from gsdf_slam_tpu.io.ply import read_ply

    frames = make_frames(n=2)
    m = _mapper(frames)
    m.settings = dc.replace(m.settings, model=ModelParams(sh_degree=1))
    m.ingest_frame(0, frames[0])
    assert m.state.f_rest.shape[1:] == (3, 3)
    assert m.adam.m["f_rest"].shape[1:] == (3, 3)
    m.ingest_frame(1, frames[1])  # increase_pcd keeps the degree-1 sizing
    assert m.state.f_rest.shape[1:] == (3, 3)
    r = m.train_for_one_iteration()
    assert np.isfinite(r["loss"])
    ply = m.save_ply(tmp_path)
    props = read_ply(ply)
    rest_cols = [k for k in props if k.startswith("f_rest_")]
    assert len(rest_cols) == 9  # 3 coeffs x 3 channels, degree-1 layout


def test_prewarm_abstract_cache_matches_real_export():
    """The AOT-prewarm's abstract BinningCache skeleton must match the
    shapes a real export step produces BIT-EXACTLY, or every prewarmed
    executable lowers against shapes that never occur and silently misses
    the persistent cache (ADVICE r4 medium: the mpa formula in the mapper
    had drifted from ops/pallas_binning's realign-overhang slack)."""
    import jax

    from gsdf_slam_tpu.engine.train import render_state

    frames = make_frames(n=1)
    m = _mapper(frames, backend="pallas")
    m.ingest_frame(0, frames[0])
    cfg = m._raster_cfg(32, 32)
    assert cfg.use_pallas() and cfg.pallas_group > 1
    kf = next(iter(m.scene.keyframes.values()))
    out = render_state(
        m.state,
        kf.camera_matrices(m.settings.z_near, m.settings.z_far),
        np.zeros(3, np.float32),
        cfg,
        export_binning_cache=True,
    )
    real = jax.tree.map(
        lambda x: (tuple(x.shape), str(x.dtype)), out.binning_cache
    )
    abstract = jax.tree.map(
        lambda x: (tuple(x.shape), str(x.dtype)), m._abstract_cache(cfg)
    )
    assert real == abstract
