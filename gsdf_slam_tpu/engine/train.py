"""The jitted training step: render -> loss -> backward -> Adam (+stats).

The TPU analog of GaussianMapper::trainForOneIteration
(gaussian_mapper.cpp:335-468) minus host-side policy: keyframe sampling,
densify scheduling and opacity-reset cadence stay in the mapper (engine/
mapper.py) exactly like the reference keeps them outside the CUDA kernels.
Everything inside `train_step` — including the densification-stat
accumulation that the reference does under NoGrad — is one compiled XLA
program; parameters never leave HBM.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..config import OptimizationParams
from ..models.gaussian_model import GaussianState, add_densification_stats
from ..models.optimizer import AdamState, adam_step, group_lrs
from ..ops.losses import mapper_loss, psnr
from ..ops.rasterize import RasterizeConfig, RenderOutput, render
from ..ops.transforms import CameraMatrices


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    psnr: jnp.ndarray
    count: jnp.ndarray
    total_pairs: jnp.ndarray


class LiveOptValues(NamedTuple):
    """Traced copies of the live-mutable hyperparameters.

    These are the values VariableParameters (viewer sliders) can change
    every frame (gaussian_mapper.cpp:962-982). They ride into `train_step`
    as traced scalars — never as part of the static `opt` key — so a slider
    drag can't trigger a recompile."""

    position_lr_init: jnp.ndarray
    feature_lr: jnp.ndarray
    opacity_lr: jnp.ndarray
    scaling_lr: jnp.ndarray
    rotation_lr: jnp.ndarray
    lambda_dssim: jnp.ndarray

    @staticmethod
    def from_opt(opt: OptimizationParams) -> "LiveOptValues":
        f = lambda v: jnp.float32(v)
        return LiveOptValues(
            position_lr_init=f(opt.position_lr_init),
            feature_lr=f(opt.feature_lr),
            opacity_lr=f(opt.opacity_lr),
            scaling_lr=f(opt.scaling_lr),
            rotation_lr=f(opt.rotation_lr),
            lambda_dssim=f(opt.lambda_dssim),
        )


def render_state(
    state: GaussianState,
    cam: CameraMatrices,
    bg: jnp.ndarray,
    cfg: RasterizeConfig,
    means2d_offset: jnp.ndarray | None = None,
    active_sh_degree: jnp.ndarray | None = None,
    binning_cache=None,
    export_binning_cache: bool = False,
    tile_row_band: tuple | None = None,
) -> RenderOutput:
    """GaussianRenderer::render (gaussian_renderer.cpp:23-141): activations +
    rasterizer call. separate_sh dc/rest path is the only one implemented —
    it is what the reference runs (separate_sh defaults true)."""
    return render(
        state.xyz,
        state.scaling_act(),
        state.rotation_act(),
        state.opacity_act()[:, 0],
        state.f_dc,
        state.f_rest,
        state.alive,
        cam,
        bg,
        cfg,
        means2d_offset=means2d_offset,
        active_sh_degree=active_sh_degree,
        binning_cache=binning_cache,
        export_binning_cache=export_binning_cache,
        tile_row_band=tile_row_band,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_depth_state(
    state: GaussianState,
    cam: CameraMatrices,
    cfg: RasterizeConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expected-depth render: alpha-blend per-Gaussian camera-space z via the
    override-color path (the reference's override_color_ input slot,
    gaussian_renderer.cpp:79-115).

    Returns (depth [H,W], coverage [H,W]); depth = sum(w_i z_i)/coverage is
    only meaningful where coverage = 1 - final_T is away from 0.
    """
    v = cam.view
    z = (
        v[2, 0] * state.xyz[:, 0]
        + v[2, 1] * state.xyz[:, 1]
        + v[2, 2] * state.xyz[:, 2]
        + v[2, 3]
    )
    out = render(
        state.xyz,
        state.scaling_act(),
        state.rotation_act(),
        state.opacity_act()[:, 0],
        state.f_dc,
        state.f_rest,
        state.alive,
        cam,
        jnp.zeros(3),
        cfg,
        colors_precomp=jnp.broadcast_to(z[:, None], (z.shape[0], 3)),
    )
    coverage = 1.0 - out.final_t
    depth = out.image[..., 0] / jnp.maximum(coverage, 1e-6)
    return depth, coverage


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "opt", "accumulate_stats", "export_binning_cache"),
)
def train_step(
    state: GaussianState,
    adam: AdamState,
    cam: CameraMatrices,
    gt_image: jnp.ndarray,
    mask: jnp.ndarray | None,
    bg: jnp.ndarray,
    iteration: jnp.ndarray,
    spatial_lr_scale: jnp.ndarray,
    cfg: RasterizeConfig,
    opt: OptimizationParams,
    accumulate_stats: bool = True,
    lr_overrides: dict[str, Any] | None = None,
    active_sh_degree: jnp.ndarray | None = None,
    live: LiveOptValues | None = None,
    binning_cache=None,
    export_binning_cache: bool = False,
):
    """One optimization iteration (trainForOneIteration :335-468).

    `iteration`, `spatial_lr_scale` and the `live` hyperparameter bundle are
    traced so neither the lr schedule nor viewer slider edits recompile;
    densify/opacity-reset cadence is host-side.

    Returns (state, adam, metrics); with `export_binning_cache=True` a
    fourth element — the BinningCache of this step's fresh binning — is
    appended, for reuse via `binning_cache=` on later steps of the same
    view (docs/PERF.md cross-step binning persistence).
    """
    lambda_dssim = opt.lambda_dssim if live is None else live.lambda_dssim

    def loss_fn(params, m2d_offset):
        st = state.with_params(params)
        out = render_state(
            st, cam, bg, cfg, means2d_offset=m2d_offset,
            active_sh_degree=active_sh_degree,
            binning_cache=binning_cache,
            export_binning_cache=export_binning_cache,
        )
        loss = mapper_loss(out.image, gt_image, mask, lambda_dssim)
        return loss, out

    m2d0 = jnp.zeros((state.capacity, 2), jnp.float32)
    (loss, out), (g_params, g_m2d) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params(), m2d0)

    if accumulate_stats:
        state = add_densification_stats(
            state, g_m2d, out.radii, cfg.width, cfg.height
        )

    lrs = group_lrs(opt, 1.0, iteration, live=live)
    lrs["xyz"] = lrs["xyz"] * spatial_lr_scale
    if lr_overrides:
        lrs.update({k: jnp.asarray(v, jnp.float32) for k, v in lr_overrides.items()})
    new_params, adam = adam_step(state.params(), g_params, adam, lrs)
    state = state.with_params(new_params)

    metrics = StepMetrics(
        loss=loss,
        psnr=psnr(out.image, gt_image),
        count=state.count,
        total_pairs=out.total_pairs,
    )
    if export_binning_cache:
        return state, adam, metrics, out.binning_cache
    return state, adam, metrics
