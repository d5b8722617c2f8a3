"""Multi-chip training: view-parallel mapping over a device mesh.

The reference is single-process single-GPU (SURVEY.md §2.3: no NCCL/MPI
anywhere); its only concurrency is host threads + intra-GPU parallelism. The
TPU-native scaling story is therefore a *design extension*, built the XLA
way rather than ported: replicate the Gaussian state across the mesh, give
every chip one keyframe view of a batch (the sliding-window sampler already
yields independent views), and `psum`/`pmean` the parameter gradients and
densification statistics over ICI before a replicated Adam step.

This turns the reference's 1-view-per-iteration schedule into an
n_devices-view batched schedule with identical per-view math — gradients are
averaged exactly as if the losses of the n views were averaged. All
collectives are XLA (`jax.lax.pmean`/`psum`/`pmax`) inside one `shard_map`;
nothing crosses DCN.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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


def make_sharded_train_step(
    mesh: Mesh,
    cfg: RasterizeConfig,
    opt: OptimizationParams,
    axis: str = "dp",
    accumulate_stats: bool = True,
):
    """Build a jitted view-parallel train step over `mesh` (1-D, axis `dp`).

    Call signature of the returned function:
      step(state, adam, cams, gt_images, masks, bg, iteration,
           spatial_lr_scale, live=None, active_sh_degree=None)
    where `cams`/`gt_images`/`masks` carry a leading batch dim == mesh size
    (`masks` may be a broadcastable all-ones [n, 1, 1] when unmasked, or
    None). Returns (state, adam, StepMetrics) like engine.train.train_step.
    """
    from ..engine.train import LiveOptValues, StepMetrics
    from ..ops.losses import psnr as psnr_fn

    n_dev = mesh.devices.size

    def per_device(
        state, adam, cam_b, gt_b, mask_b, bg, iteration, spatial, live, ash
    ):
        cam = jax.tree.map(lambda x: x[0], cam_b)  # local batch of 1
        gt = gt_b[0]
        mask = mask_b[0]
        lambda_dssim = opt.lambda_dssim if live is None else live.lambda_dssim

        def loss_fn(params, m2d_offset):
            st = state.with_params(params)
            out = render_state(
                st, cam, bg, cfg, means2d_offset=m2d_offset,
                active_sh_degree=ash,
            )
            return mapper_loss(out.image, gt, mask, lambda_dssim), out

        m2d0 = jnp.zeros((state.capacity, 2), jnp.float32)
        (loss, out), (g_params, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params(), m2d0)

        # Reduce over views: mean gradients (== grad of the mean loss),
        # summed densification stats, max screen radii.
        g_params = jax.lax.pmean(g_params, axis)
        loss = jax.lax.pmean(loss, axis)
        view_psnr = jax.lax.pmean(psnr_fn(out.image, gt), axis)
        if accumulate_stats:
            visible = out.radii > 0
            g_scaled = g_m2d * jnp.array(
                [0.5 * cfg.width, 0.5 * cfg.height], jnp.float32
            )
            norm = jnp.where(visible, jnp.linalg.norm(g_scaled, axis=-1), 0.0)
            norm = jax.lax.psum(norm, axis)
            denom_add = jax.lax.psum(visible.astype(jnp.float32), axis)
            radii_max = jax.lax.pmax(out.radii, axis)

            # Replicated update (identical on every chip).
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
        pairs = jax.lax.pmax(out.total_pairs, axis)
        metrics = StepMetrics(
            loss=loss, psnr=view_psnr, count=state.count, total_pairs=pairs
        )
        return state, adam, metrics

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(), P(), P(), P(), P()),
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
        live: "LiveOptValues | None" = None,
        active_sh_degree: jnp.ndarray | None = None,
    ):
        if masks is None:
            masks = jnp.ones((n_dev, 1, 1), jnp.float32)
        return fn(
            state, adam, cams, gt_images, masks, bg, iteration,
            spatial_lr_scale, live, active_sh_degree,
        )

    return step, n_dev


def replicate_to_mesh(mesh: Mesh, tree: Any) -> Any:
    """Place a pytree fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_cameras(cams: list[CameraMatrices]) -> CameraMatrices:
    """Stack per-view CameraMatrices into a leading batch dimension."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
