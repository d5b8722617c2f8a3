"""Tile binning: duplicate-with-keys + sort, with static shapes.

TPU-native replacement for the reference's binning stage
(rasterizer_impl.cu:137-246, 456-500): cub InclusiveSum + duplicateWithKeys +
64-bit radix sort + identifyTileRanges. The CUDA version materializes exactly
``num_rendered`` key/value pairs; on TPU everything must be shape-static, so
we use a **capacity-padded pair list** of MAX_PAIRS slots. Invalid slots get
the sentinel tile id ``num_tiles`` and sort to the end (mirroring the
reference's 0xFFFFFFFF dummy keys, rasterizer_impl.cu:202-210).

Instead of one 64-bit [tile|depth] radix sort we exploit sort stability:
  1. depth-argsort the P Gaussians once (argsort is stable: depth ties keep
     original index order, same as a stable radix sort on float depth bits);
  2. emit pairs in Gaussian-depth order (slot -> owning Gaussian via a
     scatter + cummax instead of a binary search);
  3. one stable 32-bit key sort by tile id — within a tile, pairs stay in
     depth order. Sorting int32 instead of the 64-bit key halves sort
     bandwidth, the classic TPU win.

Per-tile opacity-aware culling replicates
max_contrib_power_rect_gaussian_float (rasterizer_impl.cu:66-118): a pair is
dropped when the Gaussian's peak opacity anywhere inside the 16x16 tile is
below 1/255 — exactly the pairs the blend kernel would skip anyway, so the
image is bit-identical with or without it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import TILE, Preprocessed


class Binned(NamedTuple):
    """Sorted pair list (capacity-padded)."""

    pair_tile: jnp.ndarray  # [MP] int32, sorted ascending; num_tiles = invalid
    pair_gauss: jnp.ndarray  # [MP] int32 index into the ORIGINAL gaussian arrays
    total_pairs: jnp.ndarray  # [] int32 — true pair count (may exceed MP: overflow)


def _tile_opacity_keep(
    xy: jnp.ndarray,  # [MP, 2] gaussian pixel means
    conic: jnp.ndarray,  # [MP, 3]
    opacity: jnp.ndarray,  # [MP]
    tx: jnp.ndarray,  # [MP] tile x
    ty: jnp.ndarray,  # [MP] tile y
) -> jnp.ndarray:
    """Keep mask: peak in-tile opacity >= 1/255 (rasterizer_impl.cu:66-118).

    Finds (approximately, but conservatively — identical to the reference's
    closed form) the minimum of the conic quadratic over the tile's pixel
    rect [tile*16, tile*16+15] and compares against log(opacity * 255).
    """
    patch = float(TILE - 1)
    rect_min_x = (tx * TILE).astype(jnp.float32)
    rect_min_y = (ty * TILE).astype(jnp.float32)
    rect_max_x = rect_min_x + patch
    rect_max_y = rect_min_y + patch

    mx, my = xy[:, 0], xy[:, 1]
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]

    x_min_diff = rect_min_x - mx
    x_left = (x_min_diff > 0.0).astype(jnp.float32)
    not_in_x = x_left + (mx > rect_max_x).astype(jnp.float32)
    y_min_diff = rect_min_y - my
    y_above = (y_min_diff > 0.0).astype(jnp.float32)
    not_in_y = y_above + (my > rect_max_y).astype(jnp.float32)

    px = x_left * rect_min_x + (1.0 - x_left) * rect_max_x
    py = y_above * rect_min_y + (1.0 - y_above) * rect_max_y
    # Deliberate fix over the reference: copysign(patch, 0.0) there walks the
    # probe point AWAY from a mean lying exactly on the rect boundary,
    # wrongly culling an up-to-full-opacity splat (measure-zero but real).
    # Strict comparisons keep the cull conservative in that case.
    dx = jnp.where(x_min_diff > 0.0, patch, -patch)
    dy = jnp.where(y_min_diff > 0.0, patch, -patch)
    diffx = mx - px
    diffy = my - py

    sat = lambda v: jnp.clip(v, 0.0, 1.0)
    txf = not_in_y * sat((dx * a * diffx + dx * b * diffy) / (patch * patch * a))
    tyf = not_in_x * sat((dy * b * diffx + dy * c * diffy) / (patch * patch * c))
    max_x = px + txf * dx
    max_y = py + tyf * dy

    ddx = mx - max_x
    ddy = my - max_y
    factor = 0.5 * (a * ddx * ddx + c * ddy * ddy) + b * ddx * ddy
    outside = (not_in_x + not_in_y) > 0.0
    factor = jnp.where(outside, factor, 0.0)
    return factor <= jnp.log(opacity * 255.0)


def bin_gaussians(pre: Preprocessed, opacities: jnp.ndarray, *, grid_w: int, grid_h: int, max_pairs: int) -> Binned:
    """Expand Gaussians into depth-ordered (tile, gaussian) pairs and sort by tile."""
    p = pre.depths.shape[0]
    num_tiles = grid_w * grid_h
    visible = pre.tiles_touched > 0

    # 1) Depth order (invalid last). jnp.argsort is stable.
    depth_key = jnp.where(visible, pre.depths, jnp.inf)
    order = jnp.argsort(depth_key)  # [P] original indices, near-to-far

    tiles_d = pre.tiles_touched[order]
    rect_min_d = pre.rect_min[order]
    rect_w_d = (pre.rect_max[:, 0] - pre.rect_min[:, 0])[order]

    # 2) Exclusive offsets; slot -> owning depth-rank via scatter + cummax.
    starts = jnp.cumsum(tiles_d) - tiles_d  # [P] exclusive
    total = jnp.sum(tiles_d)
    visible_d = tiles_d > 0
    scatter_pos = jnp.where(visible_d, starts, max_pairs)  # OOB rows dropped
    seg = jnp.zeros((max_pairs,), dtype=jnp.int32)
    seg = seg.at[scatter_pos].max(jnp.arange(1, p + 1, dtype=jnp.int32), mode="drop")
    rank = jax.lax.cummax(seg) - 1  # [MP] depth-rank of owning gaussian
    rank = jnp.maximum(rank, 0)

    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    pair_valid = slot < total

    local = slot - starts[rank]
    rw = jnp.maximum(rect_w_d[rank], 1)
    tx = rect_min_d[rank, 0] + local % rw
    ty = rect_min_d[rank, 1] + local // rw

    gauss = order[rank]  # original index
    keep = _tile_opacity_keep(
        pre.means2d[gauss], pre.conics[gauss], opacities[gauss], tx, ty
    )
    pair_valid = jnp.logical_and(pair_valid, keep)

    tile_id = jnp.where(pair_valid, ty * grid_w + tx, num_tiles).astype(jnp.int32)

    # 3) Stable sort by tile id only; depth order survives within each tile.
    sorted_tile, sorted_gauss = jax.lax.sort(
        (tile_id, gauss.astype(jnp.int32)), num_keys=1, is_stable=True
    )
    return Binned(pair_tile=sorted_tile, pair_gauss=sorted_gauss, total_pairs=total)
