"""Pipelined metrics fetch (settings.metrics_pipeline_depth).

The reference blocks on loss.item() every iteration
(src/gaussian_mapper.cpp:437); over a TPU relay that round-trip dominates
small steps, so the mapper can keep up to N steps in flight and resolve
metrics FIFO. These tests pin the contract: identical trajectories to the
synchronous mode, lossless deferred overflow replay, and drain-on-demand
semantics around host actions.
"""

import dataclasses

import numpy as np
import pytest

from gsdf_slam_tpu.config import OptimizationParams
from gsdf_slam_tpu.engine import GaussianMapper, MapperSettings

from test_mapper import FakeLoader, make_frames


def _mapper(frames, depth, seed=7, max_pairs=4096, **skw):
    from gsdf_slam_tpu.data import CameraIntrinsics

    h, w = frames[0].image.shape[:2]
    intr = CameraIntrinsics(
        fx=w / 2, fy=w / 2, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h
    )
    settings = MapperSettings(
        opt=OptimizationParams(
            densification_interval=0, opacity_reset_interval=0
        ),
        new_keyframe_times_of_use=4,
        metrics_pipeline_depth=depth,
        **skw,
    )
    return GaussianMapper(
        settings=settings,
        dataloader=FakeLoader(frames, intr),
        capacity=512, max_pairs=max_pairs, ingest_capacity=128, seed=seed,
    )


def _run(depth, n_iters=8, **skw):
    frames = make_frames(n=3)
    m = _mapper(frames, depth, **skw)
    for i, f in enumerate(frames):
        m.ingest_frame(i, f)
    outs = [m.train_for_one_iteration() for _ in range(n_iters)]
    m.flush_metrics()
    return m, outs


@pytest.mark.slow
def test_pipelined_trajectory_matches_sync():
    """Same seed, same frames: depth-2 pipeline must land on the exact
    same parameters and EMA loss as the synchronous mode (the pipeline
    reorders HOST reads, never device math)."""
    m_sync, _ = _run(0)
    m_pipe, outs = _run(2)
    assert m_pipe.iteration == m_sync.iteration
    n = int(m_sync.state.count)
    assert int(m_pipe.state.count) == n
    np.testing.assert_array_equal(
        np.asarray(m_pipe.state.xyz[:n]), np.asarray(m_sync.state.xyz[:n])
    )
    np.testing.assert_array_equal(
        np.asarray(m_pipe.adam.m["xyz"][:n]),
        np.asarray(m_sync.adam.m["xyz"][:n]),
    )
    assert np.isclose(m_pipe.ema_loss, m_sync.ema_loss)
    # dispatched steps must never read as "no work": early calls report a
    # pending placeholder, later ones the lagged resolved metrics
    assert all(o is not None for o in outs)
    assert outs[0].get("pending") or np.isfinite(outs[0]["loss"])


@pytest.mark.slow
def test_pipelined_overflow_replay_is_lossless():
    """A pair overflow discovered at resolve time (≤depth steps late) must
    replay the overflowing step and everything dispatched after it from
    the retained pre-step state — final params identical to the
    synchronous run, which catches the same overflow immediately."""
    # tiny pair budget: the first step overflows, autosizing grows it
    m_sync, _ = _run(0, max_pairs=256)
    assert m_sync.max_pairs > 256  # the scenario actually overflowed
    m_pipe, _ = _run(2, max_pairs=256)
    assert m_pipe.max_pairs == m_sync.max_pairs
    n = int(m_sync.state.count)
    np.testing.assert_array_equal(
        np.asarray(m_pipe.state.xyz[:n]), np.asarray(m_sync.state.xyz[:n])
    )
    assert np.isclose(m_pipe.ema_loss, m_sync.ema_loss)


def test_flush_on_window_drain():
    """The window-budget sampler refills like the reference (+1 use to all
    when exhausted, gaussian_mapper.cpp:548-551), so None only means "no
    keyframes at all" — and an explicit flush resolves every in-flight
    step."""
    frames = make_frames(n=2)
    m = _mapper(frames, 2)
    assert m.train_for_one_iteration() is None  # nothing ingested yet
    m.ingest_frame(0, frames[0])
    m.ingest_frame(1, frames[1])
    budget = 2 * m.settings.new_keyframe_times_of_use
    for _ in range(budget + 2):  # crosses the refill boundary
        assert m.train_for_one_iteration() is not None
    assert m._pending
    m.flush_metrics()
    assert not m._pending
    assert np.isfinite(m.ema_loss) and m.ema_loss != 0.0


@pytest.mark.slow
def test_cadence_flushes_pipeline():
    """Densify cadence mutates state out-of-stream; it must only fire on a
    drained pipeline (an overflow replay would otherwise silently undo the
    surgery)."""
    frames = make_frames(n=3)
    m = _mapper(frames, 2)
    m.settings.opt = dataclasses.replace(
        m.settings.opt,
        densification_interval=3, densify_from_iter=1,
        densify_until_iter=100, opacity_reset_interval=0,
    )
    for i, f in enumerate(frames):
        m.ingest_frame(i, f)
    for _ in range(7):
        out = m.train_for_one_iteration()
        assert out is not None
        if m._cadence_due(m.iteration):
            assert not m._pending  # flushed before the surgery
    m.flush_metrics()
    assert np.isfinite(m.ema_loss)


def test_save_paths_flush(tmp_path):
    """save_ply / checkpoints resolve in-flight steps first, so the
    exported params reflect every dispatched step (incl. replays)."""
    frames = make_frames(n=2)
    m = _mapper(frames, 2)
    m.result_dir = tmp_path
    m.ingest_frame(0, frames[0])
    m.ingest_frame(1, frames[1])
    m.train_for_one_iteration()
    m.train_for_one_iteration()
    assert m._pending  # something actually in flight
    m.save_ply(tmp_path)
    assert not m._pending
