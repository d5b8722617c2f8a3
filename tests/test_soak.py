"""Capacity-machinery soak: a long streaming run with forced growth.

VERDICT r1 #9: the fixed-capacity + compaction design (the TPU answer to
CUDA tensor reallocation) needs a standing guard — hundreds of frames,
multiple capacity doublings, many densify cycles, asserting finite state,
improving fit, and a bounded number of distinct compiled step signatures."""

import dataclasses

import numpy as np
import pytest

from test_mapper import _mapper, make_frames

I4 = np.eye(4, dtype=np.float32)


@pytest.mark.slow
def test_streaming_soak_capacity_doublings():
    rng = np.random.default_rng(7)
    m = _mapper(make_frames(n=1))
    m.capacity = 256  # start small to force >= 2 doublings
    m.ingest_capacity = 128
    m.settings = dataclasses.replace(
        m.settings,
        opt=dataclasses.replace(
            m.settings.opt,
            densification_interval=5,
            densify_from_iter=0,
            densify_until_iter=10_000,
            densify_grad_threshold=2e-2,  # steady (not explosive) surgery
            opacity_reset_interval=40,
        ),
        new_keyframe_times_of_use=3,
        do_inactive_geo_densify=False,
    )

    h = w = 32
    caps_seen = {m.capacity}
    pair_caps_seen = set()
    psnrs = []
    n_frames = 60
    for i in range(n_frames):
        # slowly orbiting camera over a textured wall of fresh points each
        # frame — increase_pcd dedup passes some, densify multiplies them
        th = 0.03 * i
        pose = I4.copy()
        pose[0, 3], pose[1, 3] = 0.3 * np.sin(th), 0.3 * np.cos(th)
        pts = np.stack(
            [rng.uniform(-2, 2, 80), rng.uniform(-2, 2, 80),
             rng.uniform(2.8, 3.4, 80)], -1,
        ).astype(np.float32)
        cols = rng.uniform(0, 1, (80, 3)).astype(np.float32)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32) / h
        img = np.stack(
            [
                0.5 + 0.4 * np.sin(3 * xx + 0.1 * i),
                0.5 + 0.4 * np.cos(2 * yy + 0.05 * i),
                np.full((h, w), 0.5, np.float32),
            ],
            -1,
        ).astype(np.float32)
        m.feed_keyframe(i, pose, img, points=pts, colors=cols)
        out = m.train_for_one_iteration()
        assert out is not None
        assert np.isfinite(out["loss"]), f"non-finite loss at frame {i}"
        psnrs.append(out["psnr"])
        caps_seen.add(m.state.capacity)
        pair_caps_seen.add(m.max_pairs)
        assert int(m.state.count) <= m.state.capacity

    # the run forced real growth
    assert m.state.capacity >= 256 * 4, f"caps: {sorted(caps_seen)}"
    assert int(m.state.count) > 256
    # every parameter finite (incl. Adam moments after surgery churn)
    for k, v in m.state.params().items():
        assert np.isfinite(np.asarray(v)).all(), k
    for k in m.adam.m:
        assert np.isfinite(np.asarray(m.adam.m[k])).all(), k
        assert np.isfinite(np.asarray(m.adam.v[k])).all(), k
    # recompiles bounded: capacity visits are logarithmic in growth (the
    # doubling policy), pair sizes a handful of 16k-granular values
    max_caps = int(np.log2(m.state.capacity // 256)) + 2
    assert len(caps_seen) <= max_caps, sorted(caps_seen)
    assert len(pair_caps_seen) <= 8, sorted(pair_caps_seen)
    # the fit improves over the stream despite constant growth/churn
    assert np.mean(psnrs[-15:]) > np.mean(psnrs[:15]), (
        np.mean(psnrs[:15]), np.mean(psnrs[-15:])
    )
