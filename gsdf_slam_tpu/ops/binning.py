"""Tile binning: duplicate-with-keys + sort, with static shapes.

TPU-native replacement for the reference's binning stage
(rasterizer_impl.cu:137-246, 456-500): cub InclusiveSum + duplicateWithKeys +
64-bit radix sort + identifyTileRanges. The CUDA version materializes exactly
``num_rendered`` key/value pairs; on TPU everything must be shape-static, so
we use a **capacity-padded pair list** of MAX_PAIRS slots. Invalid slots get
the sentinel tile id ``num_tiles`` and sort to the end (mirroring the
reference's 0xFFFFFFFF dummy keys, rasterizer_impl.cu:202-210).

Pairs are expanded in buffer order (slot -> owning Gaussian via a scatter +
cummax instead of a binary search) and sorted once with a lexicographic
(tile, depth) two-key stable sort — float compare on positive depths orders
exactly like the reference's radix sort on raw float bits, and stability
breaks (tile, depth) ties by buffer order just like the reference's stable
radix pass over insertion order.

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
    mx: jnp.ndarray,  # [MP] gaussian pixel mean x
    my: jnp.ndarray,  # [MP] gaussian pixel mean y
    a: jnp.ndarray,  # [MP] conic a
    b: jnp.ndarray,  # [MP] conic b
    c: jnp.ndarray,  # [MP] conic c
    opacity: jnp.ndarray,  # [MP]
    tx: jnp.ndarray,  # [MP] tile x
    ty: jnp.ndarray,  # [MP] tile y
) -> jnp.ndarray:
    """Keep mask: peak in-tile opacity >= 1/255 (rasterizer_impl.cu:66-118).

    Finds (approximately, but conservatively — identical to the reference's
    closed form) the minimum of the conic quadratic over the tile's pixel
    rect [tile*16, tile*16+15] and compares against log(opacity * 255).
    Takes 1-D per-field arrays (field-major callers slice them for free;
    column slices of a row-major table are row-loop-bound on TPU).
    """
    patch = float(TILE - 1)
    rect_min_x = (tx * TILE).astype(jnp.float32)
    rect_min_y = (ty * TILE).astype(jnp.float32)
    rect_max_x = rect_min_x + patch
    rect_max_y = rect_min_y + patch

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
    """Expand Gaussians into depth-ordered (tile, gaussian) pairs and sort by tile.

    Perf note: all [MAX_PAIRS]-indexed lookups go through two PACKED tables
    (one int32, one f32, 8 columns each) so the expansion costs two wide
    row-gathers. Per-field scalar gathers at this size are ~100x slower on
    TPU (measured: 2M x 16f32 row gather 0.03 ms vs ~130 ms as columns).
    """
    p = pre.depths.shape[0]
    num_tiles = grid_w * grid_h

    # ONE packed per-Gaussian table, int columns bitcast into the f32 rows:
    # XLA TPU row-gathers are loop-bound per ROW (~11 ns/row measured via
    # profiler), so one [P,16] gather costs the same as a [P,4] gather —
    # merging the int and float tables halves the binning gather time.
    tiles_d = pre.tiles_touched
    starts = jnp.cumsum(tiles_d) - tiles_d  # [P] exclusive offsets
    as_f = lambda x: jax.lax.bitcast_convert_type(x.astype(jnp.int32), jnp.float32)
    table = jnp.concatenate(
        [
            as_f(pre.rect_min),  # 0: x, 1: y (int bits)
            as_f((pre.rect_max[:, 0] - pre.rect_min[:, 0])[:, None]),  # 2: w
            as_f(jnp.arange(p, dtype=jnp.int32)[:, None]),  # 3: orig index
            as_f(starts[:, None]),  # 4: start
            pre.means2d,  # 5, 6
            pre.conics,  # 7, 8, 9
            opacities[:, None],  # 10
            pre.depths[:, None],  # 11
            jnp.zeros((p, 4), jnp.float32),
        ],
        axis=1,
    )
    total = jnp.sum(tiles_d)
    visible_d = tiles_d > 0
    scatter_pos = jnp.where(visible_d, starts, max_pairs)  # OOB rows dropped
    seg = jnp.zeros((max_pairs,), dtype=jnp.int32)
    seg = seg.at[scatter_pos].max(jnp.arange(1, p + 1, dtype=jnp.int32), mode="drop")
    rank = jax.lax.cummax(seg) - 1  # [MP] depth-rank of owning gaussian
    rank = jnp.maximum(rank, 0)

    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    pair_valid = slot < total

    rows = table[rank]  # [MP, 16]: the binning stage's single wide gather
    as_i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    local = slot - as_i(rows[:, 4])  # slot - starts[rank]
    rw = jnp.maximum(as_i(rows[:, 2]), 1)
    tx = as_i(rows[:, 0]) + local % rw
    ty = as_i(rows[:, 1]) + local // rw

    gauss = as_i(rows[:, 3])  # original index
    keep = _tile_opacity_keep(
        rows[:, 5], rows[:, 6], rows[:, 7], rows[:, 8], rows[:, 9],
        rows[:, 10], tx, ty,
    )
    pair_valid = jnp.logical_and(pair_valid, keep)

    tile_id = jnp.where(pair_valid, ty * grid_w + tx, num_tiles).astype(jnp.int32)

    # One stable lexicographic (tile, depth) sort; ties keep buffer order,
    # matching the reference's stable radix over [tile|depth-bits] keys.
    sorted_tile, _, sorted_gauss = jax.lax.sort(
        (tile_id, rows[:, 11], gauss), num_keys=2, is_stable=True
    )
    return Binned(pair_tile=sorted_tile, pair_gauss=sorted_gauss, total_pairs=total)


class AlignedBinned(NamedTuple):
    """Chunk-aligned pair layout for the Pallas blend kernels."""

    ranges: jnp.ndarray  # [2, num_tiles] int32: (aligned starts; true counts)
    pair_gauss: jnp.ndarray  # [MPA] int32; sentinel (= P) on padding slots
    total_pairs: jnp.ndarray  # [] int32 true pair count (overflow indicator)


def align_pairs(
    binned: Binned, num_gaussians: int, *, num_tiles: int, chunk: int
) -> AlignedBinned:
    """Re-lay the sorted pair list so every tile starts on a CHUNK boundary.

    The Pallas kernels DMA fixed CHUNK-row slices per tile; alignment
    guarantees a slice never straddles two tiles, and lets the backward
    write whole chunks of per-pair gradients unmasked. Padding slots point
    at the zero-opacity sentinel row (index P of the packed table), so they
    blend as nothing and produce zero gradients.
    """
    pt = binned.pair_tile
    mp = pt.shape[0]
    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(pt, tiles, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(pt, tiles, side="right").astype(jnp.int32)
    counts = ends - starts
    aligned_sizes = (counts + chunk - 1) // chunk * chunk
    aligned_starts = (jnp.cumsum(aligned_sizes) - aligned_sizes).astype(jnp.int32)

    mpa = mp + num_tiles * chunk
    slot = jnp.arange(mp, dtype=jnp.int32)
    t = jnp.minimum(pt, num_tiles - 1)
    # Packed [T, 8] table -> one wide row-gather (see bin_gaussians note).
    ttable = jnp.concatenate(
        [
            starts[:, None],
            aligned_starts[:, None],
            jnp.zeros((num_tiles, 6), jnp.int32),
        ],
        axis=1,
    )
    trows = ttable[t]
    new_pos = jnp.where(pt < num_tiles, trows[:, 1] + (slot - trows[:, 0]), mpa)
    out_gauss = jnp.full((mpa,), num_gaussians, jnp.int32).at[new_pos].set(
        binned.pair_gauss, mode="drop"
    )
    ranges = jnp.stack([aligned_starts, counts], axis=0)  # [2, T] (SMEM layout)
    return AlignedBinned(
        ranges=ranges, pair_gauss=out_gauss, total_pairs=binned.total_pairs
    )
