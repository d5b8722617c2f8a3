"""Gaussian-buffer sharding (TP axis) correctness.

The param-sharded train step (parallel/param_sharding.py) holds each chip's
1/n of every parameter/Adam/stats row and gathers only the compact
screen-space payload at render time. It must (a) place state with 1/n rows
per device, (b) produce the same training trajectory as the single-device
engine.train.train_step, (c) keep per-row stats (densify accumulators)
exact so host-side surgery on the gathered state behaves identically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsdf_slam_tpu.config import OptimizationParams
from gsdf_slam_tpu.engine.train import train_step
from gsdf_slam_tpu.models import AdamState, create_from_pcd
from gsdf_slam_tpu.ops import CameraMatrices, RasterizeConfig
from gsdf_slam_tpu.parallel import (
    gather_state,
    make_param_sharded_train_step,
    shard_state_to_mesh,
)


def _scene(n=48, cap=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    pts[:, 2] += 3.0
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = create_from_pcd(
        jnp.asarray(pts), jnp.asarray(cols), jnp.ones(n, bool), cap
    )
    return state, AdamState.init(state.params())


CAM = CameraMatrices.from_pose(
    np.array([1.0, 0, 0, 0]), np.zeros(3), np.pi / 2, np.pi / 2
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
@pytest.mark.slow
def test_param_sharded_step_matches_single_device():
    from jax.sharding import Mesh

    state, adam = _scene()
    cap = state.capacity
    h, w = 40, 32
    cfg = RasterizeConfig(height=h, width=w, max_pairs=1024, chunk=128)
    opt = OptimizationParams()
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    bg = jnp.zeros(3)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    step, _ = make_param_sharded_train_step(mesh, cfg, opt, capacity=cap)
    st_s = shard_state_to_mesh(mesh, state, cap)
    ad_s = shard_state_to_mesh(mesh, adam, cap)
    # each device holds exactly 1/8 of the parameter rows — the point of
    # the axis: param+optimizer memory scales down with the mesh
    assert st_s.xyz.addressable_shards[0].data.shape == (cap // 8, 3)
    assert ad_s.m["xyz"].addressable_shards[0].data.shape == (cap // 8, 3)

    s_out, a_out, m = step(
        st_s, ad_s, CAM, gt, None, bg, jnp.int32(1), jnp.float32(1.0)
    )

    s_want, a_want, m_want = train_step(
        state, adam, CAM, gt, None, bg, jnp.int32(1), jnp.float32(1.0),
        cfg, opt,
    )

    assert abs(float(m.loss) - float(m_want.loss)) < 1e-6
    assert abs(float(m.psnr) - float(m_want.psnr)) < 1e-4
    for name in ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_out, name)),
            np.asarray(getattr(s_want, name)),
            atol=2e-6, err_msg=name,
        )
    # per-row densification stats are exact (surgery on the gathered state
    # then behaves identically to single-device)
    np.testing.assert_allclose(
        np.asarray(s_out.xyz_grad_accum),
        np.asarray(s_want.xyz_grad_accum),
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(s_out.denom), np.asarray(s_want.denom)
    )
    np.testing.assert_array_equal(
        np.asarray(s_out.max_radii2d), np.asarray(s_want.max_radii2d)
    )
    # Adam moments shard-exact too
    np.testing.assert_allclose(
        np.asarray(a_out.m["xyz"]), np.asarray(a_want.m["xyz"]), atol=2e-6
    )

    # multi-step: chain 3 more steps sharded vs single-device
    for it in range(2, 5):
        s_out, a_out, m = step(
            s_out, a_out, CAM, gt, None, bg, jnp.int32(it), jnp.float32(1.0)
        )
        s_want, a_want, m_want = train_step(
            s_want, a_want, CAM, gt, None, bg, jnp.int32(it),
            jnp.float32(1.0), cfg, opt,
        )
    np.testing.assert_allclose(
        np.asarray(s_out.xyz), np.asarray(s_want.xyz), atol=1e-5
    )

    # gather -> host surgery boundary: the gathered pytree is plain arrays
    g = gather_state(s_out)
    assert int(g.count) == int(s_want.count)
    np.testing.assert_allclose(
        np.asarray(g.opacity), np.asarray(s_want.opacity), atol=1e-5
    )


def test_shard_state_requires_divisible_capacity():
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    state, _ = _scene(n=10, cap=60)  # 60 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        shard_state_to_mesh(mesh, state, 60)
    with pytest.raises(ValueError, match="not divisible"):
        make_param_sharded_train_step(
            mesh, RasterizeConfig(height=16, width=16, max_pairs=256, chunk=128),
            OptimizationParams(), capacity=60,
        )
