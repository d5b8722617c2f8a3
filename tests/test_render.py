"""Rasterizer correctness: tiled pipeline vs dense golden, gradients vs FD.

The dense renderer implements the reference blend math by brute force; the
tiled path must match it bit-near (same splat order, same skip rules, same
early-termination parity). Gradient parity between the custom VJP and the
dense autodiff validates the hand-derived backward (backward.cu conventions).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsdf_slam_tpu.ops import (
    CameraMatrices,
    RasterizeConfig,
    render,
    render_dense_reference,
)

jax.config.update("jax_enable_x64", False)


def make_scene(p=64, seed=0, opacity_max=0.95, spread=2.0):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [
            rng.uniform(-spread, spread, p),
            rng.uniform(-spread, spread, p),
            rng.uniform(2.0, 6.0, p),
        ],
        axis=-1,
    ).astype(np.float32)
    # A few behind the camera / at the near-plane boundary to exercise culling.
    means[0, 2] = -1.0
    means[1, 2] = 0.1
    scales = np.exp(rng.uniform(-2.5, -0.5, (p, 3))).astype(np.float32)
    quats = rng.normal(size=(p, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.2, opacity_max, p).astype(np.float32)
    dc = rng.uniform(-1.0, 1.0, (p, 1, 3)).astype(np.float32)
    sh_rest = (0.1 * rng.normal(size=(p, 15, 3))).astype(np.float32)
    alive = np.ones(p, bool)
    alive[-3:] = False  # dead capacity slots must render as nothing
    fov = np.pi / 2
    cam = CameraMatrices.from_pose(
        q=np.array([1.0, 0, 0, 0]), t=np.zeros(3), fovx=fov, fovy=fov
    )
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    return tuple(
        jnp.asarray(v) for v in (means, scales, quats, opac, dc, sh_rest, alive)
    ) + (cam, jnp.asarray(bg))


def test_tiled_matches_dense():
    scene = make_scene(p=96, seed=1)
    cfg = RasterizeConfig(height=64, width=64, max_pairs=4096, chunk=128)
    out = jax.jit(render, static_argnums=(9,))(*scene, cfg)
    img_d, ft_d = render_dense_reference(*scene, cfg)
    assert out.image.shape == (64, 64, 3)
    assert int(out.total_pairs) > 0
    assert int(out.total_pairs) <= cfg.max_pairs, "test scene overflowed"
    np.testing.assert_allclose(out.image, img_d, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(out.final_t, ft_d, atol=2e-5, rtol=1e-4)


def test_non_square_image_and_odd_size():
    scene = make_scene(p=48, seed=2)
    cfg = RasterizeConfig(height=37, width=61, max_pairs=2048, chunk=64)
    out = jax.jit(render, static_argnums=(9,))(*scene, cfg)
    img_d, _ = render_dense_reference(*scene, cfg)
    np.testing.assert_allclose(out.image, img_d, atol=2e-5, rtol=1e-4)


def test_dead_slots_render_nothing():
    means, scales, quats, opac, dc, sh, alive, cam, bg = make_scene(p=32, seed=3)
    cfg = RasterizeConfig(height=32, width=32, max_pairs=1024, chunk=64)
    none_alive = jnp.zeros_like(alive)
    out = render(means, scales, quats, opac, dc, sh, none_alive, cam, bg, cfg)
    np.testing.assert_allclose(out.image, jnp.broadcast_to(bg, (32, 32, 3)), atol=1e-6)
    assert int(jnp.sum(out.radii)) == 0


def _loss_tiled(params, rest, cfg):
    means, scales, quats, opac, dc, sh = params
    alive, cam, bg = rest
    out = render(means, scales, quats, opac, dc, sh, alive, cam, bg, cfg)
    return jnp.sum(out.image**2) + 0.1 * jnp.sum(out.final_t)


def _loss_dense(params, rest, cfg):
    means, scales, quats, opac, dc, sh = params
    alive, cam, bg = rest
    img, ft = render_dense_reference(means, scales, quats, opac, dc, sh, alive, cam, bg, cfg)
    return jnp.sum(img**2) + 0.1 * jnp.sum(ft)


@pytest.mark.slow
def test_grad_matches_dense_autodiff():
    scene = make_scene(p=48, seed=4, opacity_max=0.9)
    params, rest = scene[:6], scene[6:]
    cfg = RasterizeConfig(height=48, width=48, max_pairs=4096, chunk=128)
    g_tiled = jax.jit(jax.grad(_loss_tiled), static_argnums=(2,))(params, rest, cfg)
    g_dense = jax.grad(_loss_dense)(params, rest, cfg)
    names = ["means", "scales", "quats", "opacity", "dc", "sh_rest"]
    for name, gt, gd in zip(names, g_tiled, g_dense):
        scale = np.maximum(np.abs(np.asarray(gd)).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gt) / scale, np.asarray(gd) / scale, atol=5e-4,
            err_msg=f"grad mismatch: {name}",
        )


def test_loss_against_closed_constant():
    """Regression: XLA-CPU miscompiled mean((image - closed_const)**2) when
    the tile->image transpose fused into the subtraction (image correct,
    reduced loss wrong). assemble_image carries an optimization_barrier."""
    scene = make_scene(p=24, seed=6)
    cfg = RasterizeConfig(height=48, width=48, max_pairs=1024, chunk=128)
    target = render(*scene, cfg).image  # closed over below

    def loss(dc):
        s = list(scene)
        s[4] = dc
        return jnp.mean((render(*s, cfg).image - target) ** 2)

    dc0 = jnp.zeros_like(scene[4])
    np.testing.assert_allclose(float(jax.jit(loss)(dc0)), float(loss(dc0)), rtol=1e-5)


# FD only over params that don't move the (non-differentiable, stop-gradient)
# tile binning: opacity and dc. means3d FD crosses rect/skip discontinuities
# that the analytic backward intentionally ignores (as the CUDA reference's
# backward does).
@pytest.mark.parametrize("argi", [3, 4])
def test_grad_finite_difference(argi):
    scene = make_scene(p=12, seed=5, opacity_max=0.8, spread=1.2)
    params, rest = list(scene[:6]), scene[6:]
    cfg = RasterizeConfig(height=32, width=32, max_pairs=1024, chunk=64)
    loss = jax.jit(lambda params: _loss_tiled(params, rest, cfg))
    g = jax.grad(loss)(params)[argi]
    rng = np.random.default_rng(0)
    base = np.asarray(params[argi])
    flat = base.reshape(-1)
    eps = 1e-3
    for idx in rng.choice(flat.size, size=6, replace=False):
        delta = np.zeros_like(flat)
        delta[idx] = eps
        pp = [
            jnp.asarray(base + delta.reshape(base.shape)) if i == argi else v
            for i, v in enumerate(params)
        ]
        pm = [
            jnp.asarray(base - delta.reshape(base.shape)) if i == argi else v
            for i, v in enumerate(params)
        ]
        fd = (float(loss(pp)) - float(loss(pm))) / (2 * eps)
        an = float(np.asarray(g).reshape(-1)[idx])
        assert abs(fd - an) < 2e-2 * max(1.0, abs(fd), abs(an)), (
            f"param {argi} idx {idx}: fd={fd} vs an={an}"
        )


def test_traced_sh_degree_ramp():
    """active_sh_degree (traced setShDegree) must equal a static-degree
    render: degree-0 masking == compiling with sh_degree=0."""
    scene = make_scene(p=32, seed=7)
    cfg3 = RasterizeConfig(height=32, width=32, max_pairs=1024, chunk=64)
    cfg0 = RasterizeConfig(height=32, width=32, sh_degree=0, max_pairs=1024, chunk=64)
    ramped = render(*scene, cfg3, active_sh_degree=jnp.int32(0))
    static0 = render(*scene, cfg0)
    np.testing.assert_allclose(ramped.image, static0.image, atol=1e-6)
    full = render(*scene, cfg3, active_sh_degree=jnp.int32(3))
    plain = render(*scene, cfg3)
    np.testing.assert_allclose(full.image, plain.image, atol=1e-6)


def test_forward_matches_f64_golden():
    """Committed double-precision golden: a from-scratch float64 NumPy
    transcription of the reference's forward equations (forward.cu:104-149
    cov2D, :154-193 cov3D, :198-312 preprocess, :403-453 blend rules;
    generator: tests/fixtures/make_forward_golden.py). The production f32
    renderer must match within float tolerance — since the golden derives
    from the reference's equations, the two cannot drift together."""
    from pathlib import Path

    import jax.numpy as jnp

    from gsdf_slam_tpu.ops import CameraMatrices, RasterizeConfig, render

    g = np.load(Path(__file__).parent / "fixtures" / "forward_golden.npz")
    cam = CameraMatrices(
        view=jnp.asarray(g["view"]),
        full_proj=jnp.asarray(g["full_proj"]),
        campos=jnp.asarray(g["campos"]),
        tanfovx=jnp.float32(g["tanfovx"]),
        tanfovy=jnp.float32(g["tanfovy"]),
    )
    cfg = RasterizeConfig(height=64, width=64, max_pairs=4096, chunk=256)
    out = render(
        g["xyz"], g["scales"], g["quats"], g["opac"], g["dc"], g["sh_rest"],
        np.ones(len(g["xyz"]), bool), cam, jnp.asarray(g["bg"]), cfg,
    )
    got = np.asarray(out.image, np.float64)
    want = g["image"]
    # f32 accumulation over ~48 splats vs f64: expect ~1e-5 agreement
    np.testing.assert_allclose(got, want, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(out.final_t, np.float64), g["final_t"], atol=3e-5
    )
