"""Tile-sharded (band-parallel) rendering and training correctness.

A single view's tile grid is split into horizontal bands of tile rows
(ops.projection.band_view); the bands must reassemble the full frame
bit-near, and the tile-sharded train step on a virtual 8-device mesh must
match the single-device engine.train.train_step (same loss, same gradients
up to psum reassociation, same densification statistics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsdf_slam_tpu.config import OptimizationParams
from gsdf_slam_tpu.engine.train import render_state, train_step
from gsdf_slam_tpu.models import AdamState, create_from_pcd
from gsdf_slam_tpu.ops import CameraMatrices, RasterizeConfig
from gsdf_slam_tpu.parallel import make_tile_sharded_train_step
from gsdf_slam_tpu.parallel.sharding import replicate_to_mesh


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


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_band_renders_reassemble_full_frame(backend):
    """Bands of tile rows concatenated == the full-frame render, including a
    partial bottom tile row (H=40) and void bands beyond the grid."""
    state, _ = _scene()
    h, w = 40, 32  # grid 2x3 tile rows; band padding exercises the crop
    kw = dict(height=h, width=w, max_pairs=1024, chunk=128, backend=backend)
    if backend == "pallas":
        kw.update(pallas_chunk=128, pallas_group=8)
    cfg = RasterizeConfig(**kw)
    bg = jnp.full(3, 0.25)

    full = render_state(state, CAM, bg, cfg)
    tb = 1
    bands = [
        render_state(state, CAM, bg, cfg, tile_row_band=(jnp.int32(i), tb))
        for i in range(4)  # 3 real tile rows + 1 void band
    ]
    stacked = jnp.concatenate([b.image for b in bands], axis=0)[:h]
    np.testing.assert_allclose(
        np.asarray(stacked), np.asarray(full.image), atol=1e-6
    )
    # void band renders pure background
    assert float(jnp.abs(bands[3].image - bg).max()) < 1e-7
    # band pair counts partition the full pair set
    assert sum(int(b.total_pairs) for b in bands) == int(full.total_pairs)
    # radii stay full-image visibility on every band
    np.testing.assert_array_equal(
        np.asarray(bands[0].radii), np.asarray(full.radii)
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
@pytest.mark.slow
def test_tile_sharded_step_matches_single_device():
    from jax.sharding import Mesh

    state, adam = _scene()
    h, w = 40, 32
    cfg = RasterizeConfig(height=h, width=w, max_pairs=1024, chunk=128)
    opt = OptimizationParams()
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))
    bg = jnp.zeros(3)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    step, _ = make_tile_sharded_train_step(mesh, cfg, opt)
    st_r = replicate_to_mesh(mesh, state)
    ad_r = replicate_to_mesh(mesh, adam)
    s_out, a_out, m = step(
        st_r, ad_r, CAM, gt, None, bg, jnp.int32(1), jnp.float32(1.0)
    )

    s_want, a_want, m_want = train_step(
        state, adam, CAM, gt, None, bg, jnp.int32(1), jnp.float32(1.0),
        cfg, opt,
    )

    assert abs(float(m.loss) - float(m_want.loss)) < 1e-6
    assert abs(float(m.psnr) - float(m_want.psnr)) < 1e-4
    for name in ("xyz", "f_dc", "opacity", "scaling", "rotation"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_out, name)),
            np.asarray(getattr(s_want, name)),
            atol=2e-6, err_msg=name,
        )
    # densification statistics replicate the single-chip accumulation
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
    # the replicated output state is identical on every device
    xs = [np.asarray(x.data) for x in s_out.xyz.addressable_shards]
    for x in xs[1:]:
        np.testing.assert_array_equal(xs[0], x)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
@pytest.mark.slow
def test_mapper_tile_mesh_mode_tracks_single_device():
    """GaussianMapper(mesh=..., mesh_axis='tile') keeps the reference's
    1-view-per-iteration schedule (same sampler RNG => same keyframe
    sequence as the single-device mapper) while banding each render across
    the mesh; the trajectory through a densify surgery must track the
    single-device mapper within float reassociation drift."""
    import dataclasses

    from jax.sharding import Mesh

    from test_mapper import _mapper, make_frames

    def densify_settings(m):
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

    frames = make_frames(n=3)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    m_tile = _mapper(frames, mesh=mesh, mesh_axis="tile", seed=7)
    m_ref = _mapper(frames, seed=7)
    for m in (m_tile, m_ref):
        densify_settings(m)
        for i, f in enumerate(frames):
            m.ingest_frame(i, f)

    for _ in range(6):
        out_t = m_tile.train_for_one_iteration()
        out_r = m_ref.train_for_one_iteration()
        assert out_t is not None and out_r is not None
        assert m_tile.iteration == m_ref.iteration
        assert abs(out_t["loss"] - out_r["loss"]) < 1e-4, (
            out_t["loss"], out_r["loss"],
        )
    # densify fired (iters 3 and 6) and both grew identically
    assert int(m_tile.state.count) > 60 * len(frames) - 60  # grew
    assert int(m_tile.state.count) == int(m_ref.state.count)
    np.testing.assert_allclose(
        np.asarray(m_tile.state.xyz), np.asarray(m_ref.state.xyz), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(m_tile.state.opacity),
        np.asarray(m_ref.state.opacity),
        atol=5e-4,
    )
