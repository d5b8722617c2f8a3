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
