"""Differentiable Gaussian-splat rasterizer: the full TPU pipeline.

Equivalent surface to the reference's rasterizer stack
(CudaRasterizer::Rasterizer::forward/backward, rasterizer_impl.cu:366-623,
wrapped by GaussianRasterizerFunction, src/gaussian_rasterizer.cpp:28-208):

    preprocess (XLA, autodiff)  ->  binning (non-diff sort)  ->
    blend (custom-VJP scan)     ->  background composite + crop (autodiff)

Only the blend carries a hand-written VJP; everything around it is plain
traced JAX, so `jax.grad` of any loss of `render(...)` yields the same
gradient set the reference produces (means3D, scales, rotations, opacity,
dc, sh_rest, plus the screen-space means2d dummy used for densification).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import bin_gaussians
from .blend import ALPHA_MAX, ALPHA_MIN, T_EPS, assemble_image, blend_tiles
from .projection import TILE, preprocess, tile_grid
from .sh import eval_sh_color
from .transforms import CameraMatrices


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static rasterization settings (hashable; part of the jit cache key).

    Mirrors GaussianRasterizationSettings (include/gaussian_rasterizer.h) for
    the static members; per-view tensors travel in CameraMatrices.
    """

    height: int
    width: int
    sh_degree: int = 3
    max_pairs: int = 1 << 20
    chunk: int = 256
    scale_modifier: float = 1.0
    backend: str = "auto"  # "auto" | "xla" | "pallas"
    pallas_chunk: int = 128  # lanes; must be a multiple of 128
    pallas_group: int = 8  # tiles per aligned group (1 = per-tile kernels)
    # Exported binning caches are compacted to LIVE pairs only (pairs that
    # contribute to the image or any gradient within a T_EPS/margin slack;
    # ~36% of pairs are dead at converged density, benchmarks/term_probe.py).
    # The margin is the transmittance ratio the prune keeps in reserve for
    # parameter drift across the reuse cadence; 0 disables pruning.
    cache_prune_margin: float = 10.0
    # Pruned caches are emitted at factor*max_pairs static capacity so the
    # cached step's shape-bound stages (payload gather, fold sort) shrink
    # too; a cache whose live pairs don't fit flags compact_overflow and
    # the mapper re-bins. 0 keeps the full capacity.
    cache_prune_capacity_factor: float = 0.75

    def __post_init__(self):
        if self.max_pairs % self.chunk != 0:
            raise ValueError(
                f"max_pairs ({self.max_pairs}) must be divisible by chunk "
                f"({self.chunk})"
            )
        if self.pallas_chunk % 128 != 0:
            raise ValueError(
                f"pallas_chunk ({self.pallas_chunk}) must be a multiple of "
                "128 lanes"
            )

    @property
    def grid(self) -> tuple[int, int]:
        return tile_grid(self.width, self.height)

    def use_pallas(self) -> bool:
        if self.backend == "auto":
            import jax

            return jax.default_backend() == "tpu"
        return self.backend == "pallas"


class RenderOutput(NamedTuple):
    image: jnp.ndarray  # [H, W, 3]
    final_t: jnp.ndarray  # [H, W] transmittance left after blending
    radii: jnp.ndarray  # [P] int32 screen radii; 0 = culled (visibility filter)
    total_pairs: jnp.ndarray  # [] int32, > max_pairs means overflow
    # BinningCache snapshot when export_binning_cache was requested (None
    # otherwise) — see ops/pallas_blend_grouped.BinningCache.
    binning_cache: object = None


def render(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    dc: jnp.ndarray,
    sh_rest: jnp.ndarray,
    alive: jnp.ndarray,
    cam: CameraMatrices,
    bg: jnp.ndarray,
    cfg: RasterizeConfig,
    means2d_offset: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    active_sh_degree: jnp.ndarray | None = None,
    binning_cache=None,
    export_binning_cache: bool = False,
    tile_row_band: tuple | None = None,
) -> RenderOutput:
    """Render one view. All per-Gaussian inputs are capacity-padded [P, ...].

    Args mirror GaussianRasterizer::forward (gaussian_rasterizer.h:110-132)
    with activations already applied (exp/normalize/sigmoid are the model's
    job, as in gaussian_model.cpp:48-71). `means2d_offset` is the all-zeros
    screen-space dummy whose cotangent feeds densification stats.

    `binning_cache` (a BinningCache from a prior `export_binning_cache=True`
    render of the SAME camera/resolution/capacity) reuses the frozen pair
    permutation and skips the whole expand/sort/realign stage — the TPU-
    first cross-step persistence described in docs/PERF.md (the reference
    re-bins every iteration, rasterizer_impl.cu:456-500). Only valid on the
    grouped Pallas path.

    `tile_row_band=(tile_row0, num_tile_rows)` renders only a horizontal
    band of tile rows (band coordinates; output image is
    [num_tile_rows*16, W, 3]); `tile_row0` may be traced, `num_tile_rows`
    must be static. Radii stay FULL-image visibility. Used by the
    tile-sharded multi-chip step (parallel/tile_sharding.py).
    """
    # Accept host numpy inputs at the public boundary: gather-by-tracer on a
    # raw np.ndarray inside the blend scan would otherwise fail.
    means3d, scales, quats, opacities, dc, sh_rest, alive, bg = (
        jnp.asarray(v) for v in (means3d, scales, quats, opacities, dc, sh_rest, alive, bg)
    )
    pre = preprocess(
        means3d,
        scales,
        quats,
        opacities,
        dc,
        sh_rest,
        alive,
        cam,
        width=cfg.width,
        height=cfg.height,
        sh_degree=cfg.sh_degree,
        scale_modifier=cfg.scale_modifier,
        means2d_offset=means2d_offset,
        colors_precomp=colors_precomp,
        active_sh_degree=active_sh_degree,
    )
    return render_preprocessed(
        pre, opacities, bg, cfg,
        tile_row_band=tile_row_band,
        binning_cache=binning_cache,
        export_binning_cache=export_binning_cache,
    )


def render_preprocessed(
    pre,
    opacities: jnp.ndarray,
    bg: jnp.ndarray,
    cfg: RasterizeConfig,
    tile_row_band: tuple | None = None,
    binning_cache=None,
    export_binning_cache: bool = False,
) -> RenderOutput:
    """Binning + blend + composite on an already-preprocessed payload.

    The post-preprocess half of `render` (the reference fuses both inside
    CudaRasterizer::Rasterizer::forward, rasterizer_impl.cu:366-538; the
    split here is the boundary the param-sharded multi-chip step needs —
    preprocess runs on each chip's Gaussian shard, the compact Preprocessed
    payload is all_gathered, and this function renders from it;
    parallel/param_sharding.py). Differentiable w.r.t. `pre` and
    `opacities` exactly like `render`."""
    gw, gh = cfg.grid
    out_h = cfg.height
    if tile_row_band is not None:
        if binning_cache is not None or export_binning_cache:
            raise ValueError(
                "tile_row_band cannot be combined with binning_cache/"
                "export_binning_cache (the cache freezes full-frame tiles)"
            )
        from .projection import band_view

        ty0, gh = tile_row_band
        pre = band_view(pre, ty0, gh)
        out_h = gh * 16
    if cfg.use_pallas() and cfg.pallas_group > 1:
        from .pallas_blend_grouped import (
            blend_tiles_grouped_cached,
            blend_tiles_grouped_fused,
        )

        cache_out = None
        if binning_cache is not None:
            accum, log_t_eff, total_pairs = blend_tiles_grouped_cached(
                pre,
                opacities,
                binning_cache,
                grid_w=gw,
                grid_h=gh,
                chunk=cfg.pallas_chunk,
                group=cfg.pallas_group,
            )
        elif export_binning_cache:
            accum, log_t_eff, total_pairs, cache_out = blend_tiles_grouped_fused(
                pre,
                opacities,
                grid_w=gw,
                grid_h=gh,
                max_pairs=cfg.max_pairs,
                chunk=cfg.pallas_chunk,
                group=cfg.pallas_group,
                export_cache=True,
                prune_margin=cfg.cache_prune_margin or None,
                prune_factor=(
                    cfg.cache_prune_capacity_factor
                    if cfg.cache_prune_margin else 0.0
                ),
            )
        else:
            accum, log_t_eff, total_pairs = blend_tiles_grouped_fused(
                pre,
                opacities,
                grid_w=gw,
                grid_h=gh,
                max_pairs=cfg.max_pairs,
                chunk=cfg.pallas_chunk,
                group=cfg.pallas_group,
            )
        image, final_t = assemble_image(
            accum, log_t_eff, bg, grid_w=gw, grid_h=gh, width=cfg.width, height=out_h
        )
        return RenderOutput(
            image=image, final_t=final_t, radii=pre.radii,
            total_pairs=total_pairs, binning_cache=cache_out,
        )
    if binning_cache is not None or export_binning_cache:
        raise ValueError(
            "binning_cache/export_binning_cache require the grouped Pallas "
            "path (cfg.use_pallas() and pallas_group > 1)"
        )

    binned = bin_gaussians(
        jax.lax.stop_gradient(pre), jax.lax.stop_gradient(opacities),
        grid_w=gw, grid_h=gh, max_pairs=cfg.max_pairs,
    )
    if cfg.use_pallas():
        from .binning import align_pairs
        from .pallas_blend import blend_tiles_pallas

        aligned = align_pairs(
            binned, pre.means2d.shape[0], num_tiles=gw * gh,
            chunk=cfg.pallas_chunk,
        )
        accum, log_t_eff = blend_tiles_pallas(
            aligned.ranges,
            aligned.pair_gauss,
            pre.means2d,
            pre.conics,
            opacities,
            pre.colors,
            grid_w=gw,
            grid_h=gh,
            chunk=cfg.pallas_chunk,
        )
    else:
        accum, log_t_eff = blend_tiles(
            binned.pair_tile,
            binned.pair_gauss,
            pre.means2d,
            pre.conics,
            opacities,
            pre.colors,
            binned.total_pairs,
            grid_w=gw,
            grid_h=gh,
            chunk=cfg.chunk,
        )
    image, final_t = assemble_image(
        accum, log_t_eff, bg, grid_w=gw, grid_h=gh, width=cfg.width, height=out_h
    )
    return RenderOutput(
        image=image, final_t=final_t, radii=pre.radii, total_pairs=binned.total_pairs
    )


def mark_visible(means3d: jnp.ndarray, cam: CameraMatrices) -> jnp.ndarray:
    """Frustum visibility without rendering — GaussianRasterizer::
    markVisibleGaussians (gaussian_rasterizer.cpp:18-26, checkFrustum
    rasterizer_impl.cu): camera-space z > 0.2."""
    v = cam.view
    z = v[2, 0] * means3d[:, 0] + v[2, 1] * means3d[:, 1] + v[2, 2] * means3d[:, 2] + v[2, 3]
    return z > 0.2


def render_dense_reference(
    means3d,
    scales,
    quats,
    opacities,
    dc,
    sh_rest,
    alive,
    cam: CameraMatrices,
    bg,
    cfg: RasterizeConfig,
):
    """O(P * pixels) golden renderer for tests (no binning, no Pallas).

    Implements the identical math as the tiled path — including the tile-rect
    footprint, the alpha skip rules, and early-termination parity — by brute
    force over every (gaussian, pixel). Differentiable end-to-end via plain
    autodiff (note: its gradient *does* gate the 0.99 clamp, unlike the
    production VJP which follows backward.cu:621; keep test opacities small).
    """
    pre = preprocess(
        means3d, scales, quats, opacities, dc, sh_rest, alive, cam,
        width=cfg.width, height=cfg.height, sh_degree=cfg.sh_degree,
        scale_modifier=cfg.scale_modifier,
    )
    h, w = cfg.height, cfg.width
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(jnp.float32)
    tile_xy = (pix // TILE).astype(jnp.int32)  # [HW, 2]

    order = jnp.argsort(jnp.where(pre.tiles_touched > 0, pre.depths, jnp.inf))
    xy = pre.means2d[order]
    con = pre.conics[order]
    op = opacities[order]
    col = pre.colors[order]
    rmin = pre.rect_min[order]
    rmax = pre.rect_max[order]
    vis = (pre.tiles_touched > 0)[order]

    d = xy[:, None, :] - pix[None, :, :]  # [P, HW, 2]
    power = (
        -0.5 * (con[:, 0:1] * d[..., 0] ** 2 + con[:, 2:3] * d[..., 1] ** 2)
        - con[:, 1:2] * d[..., 0] * d[..., 1]
    )
    in_rect = (
        (tile_xy[None, :, 0] >= rmin[:, None, 0])
        & (tile_xy[None, :, 0] < rmax[:, None, 0])
        & (tile_xy[None, :, 1] >= rmin[:, None, 1])
        & (tile_xy[None, :, 1] < rmax[:, None, 1])
    )
    alpha = jnp.minimum(ALPHA_MAX, op[:, None] * jnp.exp(power))
    live = vis[:, None] & in_rect & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(live, alpha, 0.0)

    log1m = jnp.log1p(-alpha)
    incl = jnp.cumsum(log1m, axis=0)
    t_incl = jnp.exp(incl)
    t_excl = jnp.exp(incl - log1m)
    applied = t_incl >= T_EPS
    wgt = alpha * t_excl * applied
    color = jnp.einsum("pq,pc->qc", wgt, col, precision="highest")
    final_t = jnp.exp(jnp.sum(jnp.where(applied, log1m, 0.0), axis=0))
    out = color + final_t[:, None] * bg[None, :]
    return out.reshape(h, w, 3), final_t.reshape(h, w)
