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
    assert int(cache.total_pairs) == int(plain.total_pairs)

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
