"""View-parallel training correctness on a virtual 8-device CPU mesh.

The sharded step must equal a single-device step trained on the MEAN of the
per-view gradients with SUMMED densification statistics (parallel/sharding
docstring contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsdf_slam_tpu.config import OptimizationParams
from gsdf_slam_tpu.engine.train import render_state
from gsdf_slam_tpu.models import AdamState, adam_step, create_from_pcd
from gsdf_slam_tpu.models.optimizer import group_lrs
from gsdf_slam_tpu.ops import CameraMatrices, RasterizeConfig
from gsdf_slam_tpu.ops.losses import mapper_loss
from gsdf_slam_tpu.parallel import make_sharded_train_step
from gsdf_slam_tpu.parallel.sharding import batch_cameras, replicate_to_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
@pytest.mark.slow
def test_sharded_step_matches_mean_gradient():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)
    n, cap = 40, 64
    pts = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    pts[:, 2] += 3.0
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = create_from_pcd(jnp.asarray(pts), jnp.asarray(cols), jnp.ones(n, bool), cap)
    adam = AdamState.init(state.params())

    cfg = RasterizeConfig(height=32, width=32, max_pairs=1024, chunk=128)
    opt = OptimizationParams()
    cams = [
        CameraMatrices.from_pose(
            np.array([1.0, 0, 0, 0]), rng.normal(0, 0.05, 3), np.pi / 2, np.pi / 2
        )
        for _ in range(8)
    ]
    gts = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))
    bg = jnp.zeros(3)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    step, _ = make_sharded_train_step(mesh, cfg, opt)
    st_r = replicate_to_mesh(mesh, state)
    ad_r = replicate_to_mesh(mesh, adam)
    bs = NamedSharding(mesh, P("dp"))
    cams_b = jax.device_put(batch_cameras(cams), bs)
    gts_b = jax.device_put(gts, bs)
    s_out, a_out, metrics = step(
        st_r, ad_r, cams_b, gts_b, None, bg, jnp.int32(1), jnp.float32(1.0)
    )
    loss = metrics.loss

    # reference: mean gradient over the 8 views on one device
    def loss_fn(params, cam, gt):
        st = state.with_params(params)
        out = render_state(st, cam, bg, cfg)
        return mapper_loss(out.image, gt, None, opt.lambda_dssim)

    grads = [
        jax.grad(loss_fn)(state.params(), cams[i], gts[i]) for i in range(8)
    ]
    mean_g = jax.tree.map(lambda *x: sum(x) / 8.0, *grads)
    lrs = group_lrs(opt, 1.0, jnp.int32(1))
    want_params, want_adam = adam_step(state.params(), mean_g, adam, lrs)

    np.testing.assert_allclose(
        np.asarray(s_out.xyz), np.asarray(want_params["xyz"]), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(s_out.opacity), np.asarray(want_params["opacity"]), atol=2e-6
    )
    mean_loss = np.mean(
        [float(loss_fn(state.params(), cams[i], gts[i])) for i in range(8)]
    )
    assert abs(float(loss) - mean_loss) < 1e-5


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
@pytest.mark.slow
def test_mapper_mesh_mode_trains_and_densifies():
    """GaussianMapper(mesh=...) is a real training mode: batched sharded
    steps, densify/prune + capacity growth on the replicated state."""
    import dataclasses

    from jax.sharding import Mesh

    from test_mapper import _mapper, make_frames

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    frames = make_frames(n=4)
    m = _mapper(frames)
    m.mesh = mesh
    m.settings = dataclasses.replace(
        m.settings,
        opt=dataclasses.replace(
            m.settings.opt,
            densification_interval=3,
            densify_from_iter=0,
            densify_until_iter=100,
            densify_grad_threshold=1e-8,  # force clones/splits
            opacity_reset_interval=5,
        ),
        new_keyframe_times_of_use=100,
    )
    for i, f in enumerate(frames):
        m.ingest_frame(i, f)
    n0 = int(m.state.count)
    losses = []
    for _ in range(6):
        out = m.train_for_one_iteration()
        assert out is not None and np.isfinite(out["loss"])
        losses.append(out["loss"])
    assert m.iteration == 6
    # densify fired at iters 3 and 6 with a ~zero grad threshold -> growth
    assert int(m.state.count) > n0
    assert np.isfinite(np.asarray(m.state.xyz)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
@pytest.mark.slow
def test_sharded_trajectory_equivalence():
    """Multi-STEP equivalence: >= 20 view-parallel iterations through a
    densify surgery AND a capacity growth must (a) keep the replicated
    state bit-identical on every device, (b) track a single-device replay
    that averages the 8 per-view gradients (pmean semantics), sums the
    densification stats (psum), and applies the identical surgeries."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gsdf_slam_tpu.models import add_densification_stats, densify_and_prune
    from gsdf_slam_tpu.models.gaussian_model import with_capacity

    rng = np.random.default_rng(1)
    # capacity must hold the it=8 surgery losslessly: 48 split parents can
    # emit 96 children (split prunes the parent, densify_and_prune drops
    # appendees beyond capacity — the mapper's grow-and-redo loop is what
    # makes that lossless in production, and this test calls the raw op)
    n, cap = 48, 256
    pts = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    pts[:, 2] += 3.0
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = create_from_pcd(jnp.asarray(pts), jnp.asarray(cols), jnp.ones(n, bool), cap)
    adam = AdamState.init(state.params())

    cfg = RasterizeConfig(height=32, width=32, max_pairs=1024, chunk=128)
    opt = OptimizationParams()
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    step, _ = make_sharded_train_step(mesh, cfg, opt)
    bs = NamedSharding(mesh, P("dp"))

    st_r = replicate_to_mesh(mesh, state)
    ad_r = replicate_to_mesh(mesh, adam)
    st_s, ad_s = state, adam  # single-device replay
    bg = jnp.zeros(3)

    @jax.jit
    def replay_step(st, ad, cams, gts, iteration):
        def loss_fn(params, m2d, cam, gt):
            out = render_state(
                st.with_params(params), cam, bg, cfg, means2d_offset=m2d
            )
            return mapper_loss(out.image, gt, None, opt.lambda_dssim), out

        m2d0 = jnp.zeros((st.capacity, 2), jnp.float32)
        gs, outs = [], []
        for i in range(8):
            (_, out), g = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                st.params(), m2d0, cams[i], gts[i]
            )
            gs.append(g)
            outs.append(out)
        mean_g = jax.tree.map(lambda *x: sum(x) / 8.0, *(g[0] for g in gs))
        # summed stats / maxed radii (psum/pmax semantics)
        norm_sum = jnp.zeros(st.capacity)
        denom_sum = jnp.zeros(st.capacity)
        radii_max = jnp.zeros(st.capacity, jnp.int32)
        for g, out in zip(gs, outs):
            visible = out.radii > 0
            g2 = g[1] * jnp.array([0.5 * 32, 0.5 * 32], jnp.float32)
            norm_sum += jnp.where(visible, jnp.linalg.norm(g2, axis=-1), 0.0)
            denom_sum += visible.astype(jnp.float32)
            radii_max = jnp.maximum(radii_max, out.radii)
        st = st.replace(
            xyz_grad_accum=st.xyz_grad_accum + norm_sum,
            denom=st.denom + denom_sum,
            max_radii2d=jnp.maximum(st.max_radii2d, radii_max.astype(jnp.float32)),
        )
        lrs = group_lrs(opt, 1.0, iteration)
        new_p, ad = adam_step(st.params(), mean_g, ad, lrs)
        return st.with_params(new_p), ad

    def assert_replicas_identical(arr):
        shards = [np.asarray(s.data) for s in arr.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)

    for it in range(1, 23):
        cams = [
            CameraMatrices.from_pose(
                np.array([1.0, 0, 0, 0]), rng.normal(0, 0.05, 3),
                np.pi / 2, np.pi / 2,
            )
            for _ in range(8)
        ]
        gts = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))
        cams_b = jax.device_put(batch_cameras(cams), bs)
        gts_b = jax.device_put(gts, bs)
        st_r, ad_r, _ = step(
            st_r, ad_r, cams_b, gts_b, None, bg, jnp.int32(it), jnp.float32(1.0)
        )
        st_s, ad_s = replay_step(st_s, ad_s, cams, gts, jnp.int32(it))

        if it == 8:  # densify surgery on the replicated state (same key)
            key = jax.random.PRNGKey(42)
            kwargs = dict(max_grad=1e-9, min_opacity=0.005, extent=5.0,
                          max_screen_size=0)
            st_r, ad_r, aux_r = densify_and_prune(st_r, ad_r, key, **kwargs)
            n_after = int(st_r.count)
            st_s, ad_s, _ = densify_and_prune(st_s, ad_s, key, **kwargs)
            assert int(aux_r.dropped_for_capacity) == 0, "test capacity too small"
            assert n_after > n and int(st_s.count) == n_after
        if it == 12:  # capacity growth mid-trajectory
            st_r, ad_r = with_capacity(st_r, ad_r, cap * 2)
            st_r = replicate_to_mesh(mesh, st_r)
            ad_r = replicate_to_mesh(mesh, ad_r)
            st_s, ad_s = with_capacity(st_s, ad_s, cap * 2)

        if it % 5 == 0 or it == 22:
            assert_replicas_identical(st_r.xyz)
            assert_replicas_identical(st_r.opacity)
            c = int(st_r.count)
            assert c == int(st_s.count)
            # Tolerance grows after the it=8 surgery: psum vs Python-sum
            # reassociation noise (~1e-7) is amplified chaotically by Adam's
            # per-parameter renormalization (a sign flip near a tile-
            # membership boundary turns ~1e-7 into a full lr-sized step),
            # so a 22-step trajectory through a split surgery tracks the
            # replay only to ~1e-3. SEMANTIC equality is pinned elsewhere:
            # the single-step test above matches at 2e-6, replicas stay
            # bit-identical, and the surgery picks identical clone/split
            # sets (count equality).
            # measured drift: <=2.5e-4 at it=22 (8x headroom below)
            atol = 5e-6 if it <= 5 else 2e-3
            for name in ("xyz", "opacity", "scaling"):
                a = np.asarray(getattr(st_r, name))[:c]
                b = np.asarray(getattr(st_s, name))[:c]
                d = float(np.abs(a - b).max())
                print(f"it={it} {name}: max|sharded-replay|={d:.3e}")
                np.testing.assert_allclose(a, b, atol=atol)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
@pytest.mark.slow
def test_mapper_mesh_mode_pyramid_scheduling():
    """Mesh mode trains pyramid sub-levels batch-uniformly: the whole batch
    follows the low-res-first cadence of getCurrentGausPyramidLevel
    (gaussian_keyframe.cpp:234-246), consuming every distinct view's budget
    at the chosen level once per batch, then graduates to full res."""
    import dataclasses

    from jax.sharding import Mesh

    from test_mapper import _mapper, make_frames

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    frames = make_frames(n=4)
    m = _mapper(frames)
    m.mesh = mesh
    m.settings = dataclasses.replace(
        m.settings,
        new_keyframe_times_of_use=100,
        do_gaus_pyramid_training=True,
        num_gaus_pyramid_sub_levels=2,
        gaus_pyramid_sub_level_times_of_use=2,
    )
    for i, f in enumerate(frames):
        m.ingest_frame(i, f)
    kfs = list(m.scene.keyframes.values())
    assert all(kf.pyramid_times_of_use == [2, 2] for kf in kfs)
    assert all(
        [im.shape[:2] for im in kf.pyramid_images] == [(8, 8), (16, 16)]
        for kf in kfs
    )

    # every batch contains all 4 distinct keyframes (8 samples over a
    # 4-keyframe window), so budgets march in lockstep: two batches at
    # level 0, two at level 1, then full resolution
    for expect_after in ([1, 2], [0, 2], [0, 1], [0, 0]):
        out = m.train_for_one_iteration()
        assert out is not None and np.isfinite(out["loss"])
        assert all(kf.pyramid_times_of_use == expect_after for kf in kfs), (
            [kf.pyramid_times_of_use for kf in kfs],
            expect_after,
        )
    # budgets exhausted -> full-res step still works
    out = m.train_for_one_iteration()
    assert out is not None and np.isfinite(out["loss"])
    assert np.isfinite(np.asarray(m.state.xyz)).all()
