"""Cross-step binning persistence (BinningCache) correctness.

The cache freezes the pair permutation; payload stays fresh. With UNCHANGED
params a cached re-render must be bit-near the fresh render (same pairs,
same order, same math), and its gradients must match the fresh gradients.
With params perturbed after the cache was built, the image may differ only
by membership/order staleness — and must stay finite even when gaussians
move behind the camera (sanitized payload).

The reference has no equivalent (it re-bins every iteration,
rasterizer_impl.cu:456-500); this is the TPU-first optimization documented
in docs/PERF.md, quality-bounded by the mapper's rebin_interval.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsdf_slam_tpu.ops import RasterizeConfig, render

from test_render import make_scene

CFG = RasterizeConfig(
    height=64, width=64, max_pairs=4096, chunk=128,
    backend="pallas", pallas_group=8,
)


def _render(scene, cfg, **kw):
    return render(*scene, cfg, **kw)


@pytest.mark.slow
def test_export_matches_plain_and_cached_matches_fresh():
    scene = make_scene(p=96, seed=3)
    plain = jax.jit(_render, static_argnums=(1,))(scene, CFG)
    exp = jax.jit(
        lambda s: _render(s, CFG, export_binning_cache=True)
    )(scene)
    np.testing.assert_array_equal(plain.image, exp.image)
    cache = exp.binning_cache
    assert cache is not None
    # the exported cache is pruned to LIVE pairs (build_pruned_cache);
    # on a non-saturating scene nothing is dead so the counts agree
    assert int(cache.total_pairs) <= int(plain.total_pairs)

    cached = jax.jit(
        lambda s, c: _render(s, CFG, binning_cache=c)
    )(scene, cache)
    # identical params + frozen permutation == identical blend inputs
    np.testing.assert_allclose(cached.image, plain.image, atol=1e-6)
    np.testing.assert_allclose(cached.final_t, plain.final_t, atol=1e-6)
    assert int(cached.total_pairs) == int(plain.total_pairs)


@pytest.mark.slow
def test_cached_gradients_match_fresh():
    scene = make_scene(p=96, seed=4)
    exp = jax.jit(lambda s: _render(s, CFG, export_binning_cache=True))(scene)
    cache = exp.binning_cache

    def loss(params, cache):
        s = params + scene[6:]
        out = _render(s, CFG, binning_cache=cache)
        return jnp.sum(out.image**2) + 0.1 * jnp.sum(out.final_t)

    params = scene[:6]
    g_fresh = jax.jit(jax.grad(lambda p: loss(p, None)))(params)
    g_cached = jax.jit(jax.grad(loss))(params, cache)
    for a, b in zip(g_fresh, g_cached):
        scale = max(float(jnp.abs(a).max()), 1e-4)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-5
        )


@pytest.mark.slow
def test_cached_step_stays_finite_when_gaussians_go_invalid():
    """Gaussians culled AFTER the cache was built (moved behind the camera,
    opacity decayed below 1/255) must blend as nothing — no NaN/inf in the
    image or the gradients (the fresh path would simply not emit pairs)."""
    scene = make_scene(p=96, seed=5)
    exp = jax.jit(lambda s: _render(s, CFG, export_binning_cache=True))(scene)
    cache = exp.binning_cache

    means = np.asarray(scene[0]).copy()
    opac = np.asarray(scene[3]).copy()
    means[4:10, 2] = -3.0  # behind the camera: garbage projection payload
    opac[10:16] = 1e-4  # below the 1/255 contribution floor
    moved = (jnp.asarray(means),) + scene[1:3] + (jnp.asarray(opac),) + scene[4:]

    def loss(params, cache):
        out = _render(params + moved[6:], CFG, binning_cache=cache)
        return jnp.sum(out.image) + jnp.sum(out.final_t)

    out = jax.jit(lambda s, c: _render(s, CFG, binning_cache=c))(moved, cache)
    assert bool(jnp.isfinite(out.image).all())
    grads = jax.jit(jax.grad(loss))(moved[:6], cache)
    for g in grads:
        assert bool(jnp.isfinite(g).all())
    # and the invalidated gaussians got exactly zero gradients
    assert float(jnp.abs(grads[0][4:10]).max()) == 0.0
    assert float(jnp.abs(grads[3][10:16]).max()) == 0.0


def test_cached_render_tracks_small_motion():
    """Sub-pixel parameter drift (the rebin_interval regime) must render
    near-identically through a stale cache: same membership, fresh values."""
    scene = make_scene(p=96, seed=6)
    exp = jax.jit(lambda s: _render(s, CFG, export_binning_cache=True))(scene)
    cache = exp.binning_cache

    means = np.asarray(scene[0]) + np.float32(1e-4)  # ~0.03 px at f=32
    moved = (jnp.asarray(means),) + scene[1:]
    fresh = jax.jit(_render, static_argnums=(1,))(moved, CFG)
    cached = jax.jit(lambda s, c: _render(s, CFG, binning_cache=c))(moved, cache)
    # membership identical at this drift -> same image to fp tolerance
    np.testing.assert_allclose(cached.image, fresh.image, atol=1e-5)


@pytest.mark.slow
def test_mapper_rebin_interval_trains_and_invalidates():
    """Mapper-level cadence: rebin_interval=3 trains through cached steps,
    reuses a cache at most twice per (kf, level), and drops every cache on
    a densify/ingest event."""
    import dataclasses as dc

    from gsdf_slam_tpu.config import OptimizationParams
    from gsdf_slam_tpu.engine import GaussianMapper, MapperSettings

    from test_mapper import FakeLoader, make_frames

    frames = make_frames(n=2, hw=(32, 32))
    from gsdf_slam_tpu.data import CameraIntrinsics

    h, w = frames[0].image.shape[:2]
    intr = CameraIntrinsics(
        fx=w / 2, fy=w / 2, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h
    )
    settings = MapperSettings(
        opt=OptimizationParams(
            densification_interval=8, densify_from_iter=2,
            densify_until_iter=100, opacity_reset_interval=0,
        ),
        new_keyframe_times_of_use=8,
        rebin_interval=3,
    )
    m = GaussianMapper(
        settings=settings, dataloader=FakeLoader(frames, intr),
        capacity=512, max_pairs=4096, ingest_capacity=128,
        backend="pallas",
    )
    m.ingest_frame(0, frames[0])
    losses = []
    saw_cached = False
    for _ in range(7):
        pre = {k: v["uses"] for k, v in m._bin_cache.items()}
        r = m.train_for_one_iteration()
        losses.append(r["loss"])
        for k, v in m._bin_cache.items():
            if k in pre and v["uses"] > pre[k]:
                saw_cached = True
    assert all(np.isfinite(losses))
    assert saw_cached, "cadence never reused a binning cache"
    assert all(v["uses"] < 3 for v in m._bin_cache.values())
    # densify at iter 8 must clear every cache
    m.train_for_one_iteration()
    assert m.iteration == 8 and not m._bin_cache
    # ...and ingest invalidates too
    m.train_for_one_iteration()
    assert m._bin_cache
    m.ingest_frame(1, frames[1])
    assert not m._bin_cache
    # training continues fine after invalidation
    r = m.train_for_one_iteration()
    assert np.isfinite(r["loss"])


def test_cache_requires_grouped_pallas_path():
    scene = make_scene(p=32, seed=7)
    cfg = dataclasses.replace(CFG, backend="xla")
    try:
        _render(scene, cfg, export_binning_cache=True)
    except ValueError as e:
        assert "grouped Pallas" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError on the XLA path")


@pytest.mark.slow
def test_staged_rebin_after_densify():
    """rebin_interval_after_densify: fresh binning every step while
    densification is live (high drift), cached persistence only once
    iteration >= densify_until_iter (frozen gaussian set, small drift)."""
    from gsdf_slam_tpu.config import OptimizationParams
    from gsdf_slam_tpu.data import CameraIntrinsics
    from gsdf_slam_tpu.engine import GaussianMapper, MapperSettings

    from test_mapper import FakeLoader, make_frames

    frames = make_frames(n=1, hw=(32, 32))
    h, w = 32, 32
    intr = CameraIntrinsics(
        fx=w / 2, fy=w / 2, cx=w / 2 - 0.5, cy=h / 2 - 0.5, width=w, height=h
    )
    settings = MapperSettings(
        opt=OptimizationParams(
            densification_interval=0, densify_from_iter=0,
            densify_until_iter=4, opacity_reset_interval=0,
        ),
        new_keyframe_times_of_use=100,
        rebin_interval=1,                 # fresh during densification
        rebin_interval_after_densify=3,   # cached persistence after
    )
    m = GaussianMapper(
        settings=settings, dataloader=FakeLoader(frames, intr),
        capacity=512, max_pairs=4096, ingest_capacity=128,
        backend="pallas",
    )
    m.ingest_frame(0, frames[0])
    for _ in range(3):  # iterations 1-3: densification phase
        m.train_for_one_iteration()
        assert not m._bin_cache, "cache built during the fresh phase"
    reused = 0
    for _ in range(6):  # iterations 4-9: staged persistence active
        pre = {k: v["uses"] for k, v in m._bin_cache.items()}
        r = m.train_for_one_iteration()
        assert np.isfinite(r["loss"])
        reused += sum(
            v["uses"] > pre.get(k, 0) for k, v in m._bin_cache.items()
        )
    assert m._bin_cache, "no cache in the post-densify phase"
    assert reused >= 3, "staged cadence never reused a binning cache"
    assert all(v["uses"] < 3 for v in m._bin_cache.values())


def _saturating_scene(p=256, seed=7, hw=32):
    """Opaque splats stacked in depth so back pairs are dead work: big
    scales + opacity ~0.9 drive every pixel's T below T_EPS early."""
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-0.5, 0.5, p), rng.uniform(-0.5, 0.5, p),
        rng.uniform(2.0, 6.0, p),
    ], -1).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.3), np.log(0.8), (p, 3))).astype(np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (p, 1))
    ops = np.full(p, 0.9, np.float32)
    dc = rng.uniform(-0.5, 0.5, (p, 1, 3)).astype(np.float32)
    rest = np.zeros((p, 15, 3), np.float32)
    alive = np.ones(p, bool)
    from gsdf_slam_tpu.ops import CameraMatrices

    cam = CameraMatrices.from_pose(
        np.array([1.0, 0, 0, 0]), np.zeros(3), np.pi / 2, np.pi / 2
    )
    bg = np.zeros(3, np.float32)
    return (pts, scales, quats, ops, dc, rest, alive, cam, bg)


@pytest.mark.slow
def test_pruned_cache_exact_at_export_params():
    """build_pruned_cache drops ~dead pairs; at export parameters the
    pruned cached render and its gradients must match the UNPRUNED cached
    render exactly (dead pairs contribute zero to the image and to every
    surviving gradient — docs/PERF.md r5)."""
    scene = _saturating_scene()
    cfg = dataclasses.replace(CFG, height=32, width=32)
    cfg_noprune = dataclasses.replace(cfg, cache_prune_margin=0.0)

    exp_full = jax.jit(
        lambda s: _render(s, cfg_noprune, export_binning_cache=True),
        static_argnums=(),
    )(scene)
    exp_pruned = jax.jit(
        lambda s: _render(s, cfg, export_binning_cache=True)
    )(scene)
    # the export step's own image is exact either way
    np.testing.assert_array_equal(exp_full.image, exp_pruned.image)
    # total_pairs keeps pre-cull overflow semantics on both caches; the
    # live count is the sum of per-group counts
    assert int(exp_full.binning_cache.total_pairs) == int(
        exp_pruned.binning_cache.total_pairs
    )
    full_n = int(np.asarray(exp_full.binning_cache.ranges)[1].sum())
    pruned_n = int(np.asarray(exp_pruned.binning_cache.ranges)[1].sum())
    assert pruned_n < full_n, (
        f"saturating scene must prune pairs ({pruned_n} vs {full_n})"
    )

    def loss(params, cache, c):
        s = params + scene[6:]
        out = _render(s, c, binning_cache=cache)
        return jnp.sum(out.image**2) + 0.1 * jnp.sum(out.final_t)

    params = scene[:6]
    out_full = jax.jit(
        lambda s, c: _render(s, cfg_noprune, binning_cache=c)
    )(scene, exp_full.binning_cache)
    out_pruned = jax.jit(
        lambda s, c: _render(s, cfg, binning_cache=c)
    )(scene, exp_pruned.binning_cache)
    np.testing.assert_allclose(out_pruned.image, out_full.image, atol=1e-6)
    np.testing.assert_allclose(out_pruned.final_t, out_full.final_t, atol=1e-6)

    g_full = jax.jit(jax.grad(lambda p: loss(p, exp_full.binning_cache, cfg_noprune)))(params)
    g_pruned = jax.jit(jax.grad(lambda p: loss(p, exp_pruned.binning_cache, cfg)))(params)
    for a, b in zip(g_full, g_pruned):
        scale = max(float(jnp.abs(a).max()), 1e-4)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-5
        )


def test_build_pruned_cache_layout_invariants():
    """Unit check of the compaction math on a hand-built layout: group
    counts, chunk-aligned starts, order preservation, and the pruned
    kept_bounds (per-gaussian surviving-pair prefix)."""
    from gsdf_slam_tpu.ops.pallas_blend_grouped import build_pruned_cache

    chunk = 128
    p = 10
    # two groups: counts 200 and 150, chunk-aligned starts 0 and 256
    gstarts = np.array([0, 256], np.int32)
    gcounts = np.array([200, 150], np.int32)
    mpa = 512
    rng = np.random.default_rng(0)
    gid = np.full(mpa, 7777, np.int32)  # garbage on padding lanes
    slot = np.zeros(mpa, np.float32)
    keep = np.zeros(mpa, np.float32)
    lanes = []
    for s0, cnt in zip(gstarts, gcounts):
        g_sorted = np.sort(rng.integers(0, p, cnt))
        gid[s0 : s0 + cnt] = g_sorted
        slot[s0 : s0 + cnt] = np.linspace(0, 7.99, cnt).astype(int)
        keep[s0 : s0 + cnt] = rng.random(cnt) < 0.6
        lanes.append((s0, cnt))
    # original kept_bounds: all lanes were "kept" by the cull
    all_gids = np.concatenate(
        [gid[s0 : s0 + cnt] for s0, cnt in lanes]
    )
    kb = np.cumsum(np.bincount(all_gids, minlength=p + 1))[:p].astype(np.int32)
    ranges = jnp.asarray(np.stack([gstarts, gcounts]))

    cache = build_pruned_cache(
        ranges, jnp.asarray(gid), jnp.asarray(slot), jnp.asarray(kb),
        jnp.asarray(keep), jnp.int32(350), chunk=chunk, p=p,
    )
    new_ranges = np.asarray(cache.ranges)
    kept0 = int(keep[0:200].sum())
    kept1 = int(keep[256:406].sum())
    assert new_ranges[1].tolist() == [kept0, kept1]
    assert new_ranges[0][0] == 0
    assert new_ranges[0][1] == (kept0 + chunk - 1) // chunk * chunk
    assert int(cache.total_pairs) == 350  # pre-cull semantics pass through
    # order-preserving compaction of gid/slot
    ng_gid = np.asarray(cache.gid)
    ng_slot = np.asarray(cache.slot)
    for (s0, cnt), (ns0, ncnt) in zip(lanes, zip(new_ranges[0], new_ranges[1])):
        sel = keep[s0 : s0 + cnt] > 0
        np.testing.assert_array_equal(ng_gid[ns0 : ns0 + ncnt], gid[s0 : s0 + cnt][sel])
        np.testing.assert_array_equal(ng_slot[ns0 : ns0 + ncnt], slot[s0 : s0 + cnt][sel])
    # pruned kept_bounds = per-gaussian prefix of surviving pairs
    surviving = np.concatenate([
        gid[s0 : s0 + cnt][keep[s0 : s0 + cnt] > 0] for s0, cnt in lanes
    ])
    kb_pruned = np.cumsum(np.bincount(surviving, minlength=p + 1))[:p]
    np.testing.assert_array_equal(np.asarray(cache.kept_bounds), kb_pruned)


def test_build_pruned_cache_compact_overflow():
    """A compacted cache whose live pairs don't fit must flag
    compact_overflow and keep every group's aligned region in bounds
    (the mapper then discards it — engine/mapper._commit_bin_cache)."""
    from gsdf_slam_tpu.ops.pallas_blend_grouped import build_pruned_cache

    chunk = 128
    p = 10
    mpa = 512
    gstarts = np.array([0, 256], np.int32)
    gcounts = np.array([256, 200], np.int32)
    gid = np.zeros(mpa, np.int32)
    slot = np.zeros(mpa, np.float32)
    keep = np.ones(mpa, np.float32)  # nothing prunable: 456 live pairs
    kb = np.full(p, 456, np.int32)
    ranges = jnp.asarray(np.stack([gstarts, gcounts]))
    out_len = 256  # too small for 456 live pairs
    cache = build_pruned_cache(
        ranges, jnp.asarray(gid), jnp.asarray(slot), jnp.asarray(kb),
        jnp.asarray(keep), jnp.int32(456), chunk=chunk, p=p, out_len=out_len,
    )
    assert int(cache.compact_overflow) == 1
    nr = np.asarray(cache.ranges)
    for s0, cnt in zip(nr[0], nr[1]):
        assert 0 <= s0 <= out_len - chunk
        assert cnt >= 0
        aligned = (cnt + chunk - 1) // chunk * chunk
        assert s0 + aligned <= out_len
    assert cache.gid.shape == (out_len,)

    # and with a sufficient out_len the same inputs don't overflow
    ok = build_pruned_cache(
        ranges, jnp.asarray(gid), jnp.asarray(slot), jnp.asarray(kb),
        jnp.asarray(keep), jnp.int32(456), chunk=chunk, p=p, out_len=512,
    )
    assert int(ok.compact_overflow) == 0
    assert np.asarray(ok.ranges)[1].tolist() == [256, 200]
