"""Pallas blend parity vs the XLA reference path.

On real TPU hardware the kernels compile natively through Mosaic; on CPU
they execute through Pallas interpret mode (same kernel code, same DMA
schedule) — so the DEFAULT suite exercises the production path too, and
the TPU run re-validates the compiled variant.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsdf_slam_tpu.ops import RasterizeConfig, render

from test_render import make_scene


@pytest.mark.parametrize("group", [1, 8])
def test_pallas_matches_xla_forward_and_grad(group):
    scene = make_scene(p=96, seed=1)
    cfg_x = RasterizeConfig(height=64, width=64, max_pairs=4096, chunk=128, backend="xla")
    cfg_p = dataclasses.replace(cfg_x, backend="pallas", pallas_group=group)
    ox = jax.jit(render, static_argnums=(9,))(*scene, cfg_x)
    op = jax.jit(render, static_argnums=(9,))(*scene, cfg_p)
    np.testing.assert_allclose(ox.image, op.image, atol=5e-6)
    np.testing.assert_allclose(ox.final_t, op.final_t, atol=5e-6)

    def loss(params, cfg):
        means, scales, quats, opac, dc, sh = params
        out = render(means, scales, quats, opac, dc, sh, *scene[6:], cfg)
        return jnp.sum(out.image**2) + 0.1 * jnp.sum(out.final_t)

    params = scene[:6]
    gx = jax.jit(jax.grad(loss), static_argnums=(1,))(params, cfg_x)
    gp = jax.jit(jax.grad(loss), static_argnums=(1,))(params, cfg_p)
    for a, b in zip(gx, gp):
        scale = max(float(jnp.abs(a).max()), 1e-4)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-5
        )
