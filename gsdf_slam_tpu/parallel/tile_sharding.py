"""Multi-chip training: tile-sharding ONE render across a device mesh.

The second parallelism axis (SURVEY.md §5.8: "data-parallelize pixels/tiles
of a render across chips"). Where `parallel/sharding.py` scales THROUGHPUT
(n views per batched step), this scales LATENCY: a single train iteration's
tile grid is split into horizontal bands of tile rows, one band per chip.
Every stage that dominates the single-chip step — pair expansion, sort,
realign, the blend kernels, the gradient fold — processes only ~1/n of the
pairs and tiles per chip; preprocess and Adam stay replicated (they are the
~3 ms tail of the profile, docs/PERF.md).

Mechanics (all XLA collectives over ICI inside one `shard_map`):
  1. replicate the Gaussian state; chip d renders tile rows
     [d*tb, (d+1)*tb) via `ops.projection.band_view` (translation to band
     coordinates; the blend math is translation-invariant),
  2. `all_gather` the band images into the full frame, compute the EXACT
     single-chip loss (same masking quirks, same SSIM) replicated,
  3. backward: each chip's VJP covers its band's pairs; `psum` of the
     parameter and means2D gradients reconstructs the full-frame gradient
     bit-near (band pairs partition the full pair set exactly — tiles
     partition by row),
  4. replicated Adam step, identical on every chip.

The reference has no equivalent: one CUDA device renders the whole frame
(rasterizer_impl.cu:456-500). `cfg.max_pairs` here is the PER-BAND pair
capacity; the returned metrics report the largest band's pair count so the
mapper's autosizing reacts to the binding constraint.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import OptimizationParams
from ..engine.train import render_state
from ..models.gaussian_model import GaussianState
from ..models.optimizer import AdamState, adam_step, group_lrs
from ..ops.losses import mapper_loss
from ..ops.rasterize import RasterizeConfig
from ..ops.transforms import CameraMatrices

try:  # JAX >= 0.7 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def make_tile_sharded_train_step(
    mesh: Mesh,
    cfg: RasterizeConfig,
    opt: OptimizationParams,
    axis: str = "dp",
    accumulate_stats: bool = True,
):
    """Build a jitted tile-sharded train step over `mesh` (1-D).

    Call signature of the returned function:
      step(state, adam, cam, gt_image, mask, bg, iteration,
           spatial_lr_scale, live=None, active_sh_degree=None)
    — ONE view per iteration, like engine.train.train_step, but the render
    is banded across the mesh. Returns (state, adam, StepMetrics); the
    metrics' total_pairs is the LARGEST band's pair count (vs the per-band
    cfg.max_pairs capacity).
    """
    from ..engine.train import LiveOptValues, StepMetrics  # noqa: F401
    from ..ops.losses import psnr as psnr_fn

    n_dev = mesh.devices.size
    gw, gh = cfg.grid
    tb = -(-gh // n_dev)  # tile rows per band (ceil); last bands may be void

    def per_device(state, adam, cam, gt, mask, bg, iteration, spatial, live, ash):
        d = jax.lax.axis_index(axis)
        ty0 = (d * tb).astype(jnp.int32)
        lambda_dssim = opt.lambda_dssim if live is None else live.lambda_dssim

        def loss_fn(params, m2d_offset):
            st = state.with_params(params)
            out = render_state(
                st, cam, bg, cfg, means2d_offset=m2d_offset,
                active_sh_degree=ash, tile_row_band=(ty0, tb),
            )
            # bands -> full frame; every chip evaluates the IDENTICAL
            # single-chip loss (pmean makes the all_gather transpose route
            # exactly one copy of dL/dimage back to each producing band)
            full = jax.lax.all_gather(out.image, axis, axis=0, tiled=True)
            img = full[: cfg.height]
            loss = mapper_loss(img, gt, mask, lambda_dssim)
            return jax.lax.pmean(loss, axis), (out, img)

        m2d0 = jnp.zeros((state.capacity, 2), jnp.float32)
        (loss, (out, img)), (g_params, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params(), m2d0)

        # Band pair sets partition the full pair set, so summing the
        # per-band gradients reconstructs the full-frame gradient — but
        # under shard_map(check_vma=False) psum/pmean transpose to psum,
        # so EVERY device's loss cotangent already reached each band at
        # full scale: the raw per-device grads carry an extra n_dev
        # factor. pmean (= psum / n_dev) yields the exact single-chip
        # gradient (asserted bit-near by test_tile_sharding.py).
        g_params = jax.lax.pmean(g_params, axis)
        g_m2d = jax.lax.pmean(g_m2d, axis)
        view_psnr = psnr_fn(img, gt)  # replicated
        if accumulate_stats:
            # radii are FULL-image visibility (band_view keeps them) and
            # g_m2d was psum'd to the full-frame means2D gradient, so the
            # single-chip stats accumulation applies verbatim.
            from ..models.gaussian_model import add_densification_stats

            state = add_densification_stats(
                state, g_m2d, out.radii, cfg.width, cfg.height
            )
        lrs = group_lrs(opt, 1.0, iteration, live=live)
        lrs["xyz"] = lrs["xyz"] * spatial
        new_params, adam = adam_step(state.params(), g_params, adam, lrs)
        state = state.with_params(new_params)
        pairs = jax.lax.pmax(out.total_pairs, axis)
        metrics = StepMetrics(
            loss=loss, psnr=view_psnr, count=state.count, total_pairs=pairs
        )
        return state, adam, metrics

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(
        state: GaussianState,
        adam: AdamState,
        cam: CameraMatrices,
        gt_image: jnp.ndarray,
        mask: jnp.ndarray | None,
        bg: jnp.ndarray,
        iteration: jnp.ndarray,
        spatial_lr_scale: jnp.ndarray,
        live=None,
        active_sh_degree: jnp.ndarray | None = None,
    ):
        if mask is None:
            mask = jnp.ones((1, 1), jnp.float32)
        return fn(
            state, adam, cam, gt_image, mask, bg, iteration,
            spatial_lr_scale, live, active_sh_degree,
        )

    return step, n_dev
