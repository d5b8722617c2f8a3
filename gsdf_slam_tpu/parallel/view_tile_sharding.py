"""Multi-chip training: 2-D mesh — view-parallel x tile-banded.

Composes the two 1-D production axes into the natural layout for a real
pod slice (e.g. v5e-8 as 2 views x 4 bands, or 4 x 2): the `dp` axis
batches keyframes exactly like `parallel/sharding.py` (throughput), and
within each view the render is split into tile-row bands across the
`tile` axis exactly like `parallel/tile_sharding.py` (latency). Gradients
reduce hierarchically: `pmean` over `tile` reconstructs each view's
full-frame gradient from its band partition, then `pmean` over `dp`
averages the views; densification statistics sum/max over `dp` only
(each tile group already holds full-image radii and the full-frame
means2D gradient). Adam stays replicated on every chip.

The reference is single-GPU (SURVEY.md §2.3 — no distributed backend);
this is the TPU-native design extension of §5.8, and every collective is
an XLA op (`pmean`/`psum`/`pmax`/`all_gather`) over ICI inside one
`shard_map`.

Exactness contract (pinned by tests/test_view_tile_sharding.py): a step
on an (nv, nb) mesh equals the 1-D view-parallel step on nv devices with
the same nv views — which itself equals the single-device mean-gradient
step (tests/test_sharding.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
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


def make_view_tile_mesh(n_views: int, n_bands: int, devices=None) -> Mesh:
    """An (n_views, n_bands) mesh with axes ("dp", "tile").

    Adjacent devices land in the same tile group, so the per-view
    all_gather/psum collectives ride neighbor ICI links."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    need = n_views * n_bands
    if devices.size < need:
        raise ValueError(
            f"need {need} devices for a {n_views}x{n_bands} mesh, "
            f"have {devices.size}"
        )
    return Mesh(devices[:need].reshape(n_views, n_bands), ("dp", "tile"))


def make_view_tile_sharded_train_step(
    mesh: Mesh,
    cfg: RasterizeConfig,
    opt: OptimizationParams,
    view_axis: str = "dp",
    tile_axis: str = "tile",
    accumulate_stats: bool = True,
):
    """Build a jitted view x tile train step over a 2-D `mesh`.

    Call signature of the returned function (same as the 1-D view step):
      step(state, adam, cams, gt_images, masks, bg, iteration,
           spatial_lr_scale, live=None, active_sh_degree=None)
    with `cams`/`gt_images`/`masks` carrying a leading batch dim ==
    mesh.shape[view_axis]. Returns (state, adam, StepMetrics); metrics'
    total_pairs is the LARGEST (view, band) pair count vs the PER-BAND
    `cfg.max_pairs` capacity, so the mapper's autosizing reacts to the
    binding constraint.
    """
    from ..engine.train import LiveOptValues, StepMetrics  # noqa: F401
    from ..ops.losses import psnr as psnr_fn

    n_views = int(mesh.shape[view_axis])
    n_bands = int(mesh.shape[tile_axis])
    gw, gh = cfg.grid
    tb = -(-gh // n_bands)  # tile rows per band (ceil); last bands may be void

    def per_device(
        state, adam, cam_b, gt_b, mask_b, bg, iteration, spatial, live, ash
    ):
        cam = jax.tree.map(lambda x: x[0], cam_b)  # local view batch of 1
        gt = gt_b[0]
        mask = mask_b[0]
        d = jax.lax.axis_index(tile_axis)
        ty0 = (d * tb).astype(jnp.int32)
        lambda_dssim = opt.lambda_dssim if live is None else live.lambda_dssim

        def loss_fn(params, m2d_offset):
            st = state.with_params(params)
            out = render_state(
                st, cam, bg, cfg, means2d_offset=m2d_offset,
                active_sh_degree=ash, tile_row_band=(ty0, tb),
            )
            # bands -> this view's full frame; every chip of the tile
            # group evaluates the identical per-view loss (see
            # parallel/tile_sharding.py for the transpose argument)
            full = jax.lax.all_gather(out.image, tile_axis, axis=0, tiled=True)
            img = full[: cfg.height]
            loss = mapper_loss(img, gt, mask, lambda_dssim)
            return jax.lax.pmean(loss, tile_axis), (out, img)

        m2d0 = jnp.zeros((state.capacity, 2), jnp.float32)
        (loss, (out, img)), (g_params, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params(), m2d0)

        # Hierarchical reduction. Inner (tile): band pair sets partition
        # each view's pair set, and under shard_map(check_vma=False) the
        # pmean'd loss cotangent reaches each band at full scale, so
        # pmean over tile reconstructs the view's exact full-frame
        # gradient (tile_sharding.py's correction, per view). Outer (dp):
        # mean over views == gradient of the mean loss (sharding.py).
        g_params = jax.lax.pmean(g_params, tile_axis)
        g_params = jax.lax.pmean(g_params, view_axis)
        g_m2d = jax.lax.pmean(g_m2d, tile_axis)  # per-view full-frame grad
        loss = jax.lax.pmean(loss, view_axis)
        view_psnr = jax.lax.pmean(psnr_fn(img, gt), view_axis)
        if accumulate_stats:
            # radii stay full-image visibility on every band
            # (ops.projection.band_view), and g_m2d is now the per-view
            # full-frame means2D gradient, so the per-view stats are
            # computed locally and reduced over views only — identical
            # to parallel/sharding.py's accumulation.
            visible = out.radii > 0
            g_scaled = g_m2d * jnp.array(
                [0.5 * cfg.width, 0.5 * cfg.height], jnp.float32
            )
            norm = jnp.where(visible, jnp.linalg.norm(g_scaled, axis=-1), 0.0)
            norm = jax.lax.psum(norm, view_axis)
            denom_add = jax.lax.psum(visible.astype(jnp.float32), view_axis)
            radii_max = jax.lax.pmax(out.radii, view_axis)
            state = state.replace(
                xyz_grad_accum=state.xyz_grad_accum + norm,
                denom=state.denom + denom_add,
                max_radii2d=jnp.maximum(
                    state.max_radii2d, radii_max.astype(jnp.float32)
                ),
            )
        lrs = group_lrs(opt, 1.0, iteration, live=live)
        lrs["xyz"] = lrs["xyz"] * spatial
        new_params, adam = adam_step(state.params(), g_params, adam, lrs)
        state = state.with_params(new_params)
        pairs = jax.lax.pmax(
            jax.lax.pmax(out.total_pairs, tile_axis), view_axis
        )
        metrics = StepMetrics(
            loss=loss, psnr=view_psnr, count=state.count, total_pairs=pairs
        )
        return state, adam, metrics

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P(), P(), P(view_axis), P(view_axis), P(view_axis),
            P(), P(), P(), P(), P(),
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(
        state: GaussianState,
        adam: AdamState,
        cams: CameraMatrices,
        gt_images: jnp.ndarray,
        masks: jnp.ndarray | None,
        bg: jnp.ndarray,
        iteration: jnp.ndarray,
        spatial_lr_scale: jnp.ndarray,
        live=None,
        active_sh_degree: jnp.ndarray | None = None,
    ):
        if masks is None:
            masks = jnp.ones((n_views, 1, 1), jnp.float32)
        return fn(
            state, adam, cams, gt_images, masks, bg, iteration,
            spatial_lr_scale, live, active_sh_degree,
        )

    return step, n_views
