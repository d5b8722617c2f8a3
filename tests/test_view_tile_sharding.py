"""2-D mesh (view x tile) training correctness on a virtual 8-device mesh.

The composed mode must be EXACTLY the 1-D view-parallel step over the same
views (parallel/sharding.py — itself pinned to the single-device
mean-gradient step by test_sharding.py), with each view's render banded
across the tile axis (parallel/tile_sharding.py — pinned to the
single-device render by test_tile_sharding.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsdf_slam_tpu.config import OptimizationParams
from gsdf_slam_tpu.models import AdamState, create_from_pcd
from gsdf_slam_tpu.ops import CameraMatrices, RasterizeConfig
from gsdf_slam_tpu.parallel import (
    make_sharded_train_step,
    make_view_tile_mesh,
    make_view_tile_sharded_train_step,
)
from gsdf_slam_tpu.parallel.sharding import batch_cameras, replicate_to_mesh


def _scene(n=48, cap=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    pts[:, 2] += 3.0
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = create_from_pcd(
        jnp.asarray(pts), jnp.asarray(cols), jnp.ones(n, bool), cap
    )
    return state, AdamState.init(state.params())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
@pytest.mark.parametrize("nv,nb", [(2, 4), (4, 2)])
@pytest.mark.slow
def test_view_tile_step_matches_view_parallel(nv, nb):
    """(nv, nb) mesh == 1-D view-parallel over the same nv views: same
    params, same Adam moments, same densification stats, same metrics."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(3)
    state, adam = _scene()
    h, w = 40, 32  # 3 tile rows: nb=2 bands of 2/1 rows, nb=4 has a void band
    cfg = RasterizeConfig(height=h, width=w, max_pairs=1024, chunk=128)
    opt = OptimizationParams()
    cams = [
        CameraMatrices.from_pose(
            np.array([1.0, 0, 0, 0]), rng.normal(0, 0.05, 3),
            np.pi / 2, np.pi / 2,
        )
        for _ in range(nv)
    ]
    gts = jnp.asarray(rng.uniform(0, 1, (nv, h, w, 3)).astype(np.float32))
    bg = jnp.zeros(3)

    mesh2d = make_view_tile_mesh(nv, nb)
    step2d, n_views = make_view_tile_sharded_train_step(mesh2d, cfg, opt)
    assert n_views == nv
    st2, ad2 = replicate_to_mesh(mesh2d, state), replicate_to_mesh(mesh2d, adam)
    bs2 = NamedSharding(mesh2d, P("dp"))
    s2, a2, m2 = step2d(
        st2, ad2,
        jax.device_put(batch_cameras(cams), bs2),
        jax.device_put(gts, bs2),
        None, bg, jnp.int32(1), jnp.float32(1.0),
    )

    mesh1d = Mesh(np.array(jax.devices()[:nv]), ("dp",))
    step1d, _ = make_sharded_train_step(mesh1d, cfg, opt)
    st1, ad1 = replicate_to_mesh(mesh1d, state), replicate_to_mesh(mesh1d, adam)
    bs1 = NamedSharding(mesh1d, P("dp"))
    s1, a1, m1 = step1d(
        st1, ad1,
        jax.device_put(batch_cameras(cams), bs1),
        jax.device_put(gts, bs1),
        None, bg, jnp.int32(1), jnp.float32(1.0),
    )

    assert abs(float(m2.loss) - float(m1.loss)) < 1e-6
    assert abs(float(m2.psnr) - float(m1.psnr)) < 1e-4
    for name in ("xyz", "f_dc", "opacity", "scaling", "rotation",
                 "xyz_grad_accum", "denom", "max_radii2d"):
        np.testing.assert_allclose(
            np.asarray(getattr(s2, name)),
            np.asarray(getattr(s1, name)),
            atol=2e-6, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(a2.m["xyz"]), np.asarray(a1.m["xyz"]), atol=2e-6
    )
    # band pair sets partition each view's pairs: the per-(view,band) max
    # can't exceed the per-view max the 1-D step reports
    assert int(m2.total_pairs) <= int(m1.total_pairs)
    # the replicated output state is identical on every device
    shards = [np.asarray(x.data) for x in s2.xyz.addressable_shards]
    for x in shards[1:]:
        np.testing.assert_array_equal(shards[0], x)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
@pytest.mark.slow
def test_mapper_view_tile_mode_trains_and_densifies():
    """GaussianMapper(mesh=2-D, mesh_axis='view_tile') is a real training
    mode: batched banded steps, densify + growth on the replicated state."""
    from test_mapper import _mapper, make_frames

    mesh = make_view_tile_mesh(4, 2)
    frames = make_frames(n=4)
    m = _mapper(frames, mesh=mesh, mesh_axis="view_tile")
    m.settings = dataclasses.replace(
        m.settings,
        opt=dataclasses.replace(
            m.settings.opt,
            densification_interval=3,
            densify_from_iter=0,
            densify_until_iter=100,
            densify_grad_threshold=1e-8,  # force clones/splits
            opacity_reset_interval=0,
        ),
        new_keyframe_times_of_use=100,
    )
    for i, f in enumerate(frames):
        m.ingest_frame(i, f)
    n0 = int(m.state.count)
    for _ in range(6):
        out = m.train_for_one_iteration()
        assert out is not None and np.isfinite(out["loss"])
    assert m.iteration == 6
    assert int(m.state.count) > n0  # densify fired and grew the map
    assert np.isfinite(np.asarray(m.state.xyz)).all()


def test_view_tile_mesh_validation():
    with pytest.raises(ValueError, match="view_tile"):
        from jax.sharding import Mesh

        from gsdf_slam_tpu.engine import GaussianMapper

        GaussianMapper(
            mesh=Mesh(np.array(jax.devices()[:1]), ("dp",)),
            mesh_axis="view_tile",
        )
