"""Tile alpha-blending forward + analytic backward (XLA implementation).

TPU-native re-design of the reference's two hot kernels:
  * forward per-tile blend        — renderCUDA, forward.cu:317-477
  * per-Gaussian backward blend   — PerGaussianRenderCUDA, backward.cu:464-654

Design (no translation of the CUDA structure — a scan/cumsum reformulation):

The CUDA forward walks each tile's depth-sorted splat range sequentially per
pixel. Observe that with T_k = prod_{j<k}(1 - a_j) the blend is a *segmented
cumulative product* over the tile-sorted pair list — an associative scan. We
therefore process the global sorted pair list in fixed-size chunks under
`lax.scan`, carrying per-pixel log-transmittance grids; within a chunk the
segmented cumsum is two `jnp.cumsum`s and a gather. All chunk math is dense
[CHUNK, 256] vector work (VPU-shaped) plus row-gathers/scatter-adds.

Early-termination parity: the reference stops a pixel once
T*(1-alpha) < 1e-4 (forward.cu:437-442). Because raw transmittance is
monotonically non-increasing, "pair k was applied" is exactly
T_incl_raw(k) >= 1e-4 — a closed-form mask. We carry TWO log-T grids:
  logT_raw — full product, used only to evaluate the applied mask;
  logT_eff — product over applied pairs only; exp() of it is the
             reference's final_T (used for background compositing).

The backward is a hand-derived VJP in the reference's exact conventions
(backward.cu:598-640): the per-splat alpha gradient uses the suffix
accumulator -ar (here: a carried per-pixel `suffix_dot` = sum of later
w_m * (c_m . dL/dpixel) + cotangent of logT_eff), the 0.99 opacity clamp is
NOT gated in dalpha/dG (matching dL_dG = con_o.w * dL_dalpha), and skipped
splats (power > 0, alpha < 1/255, past last contributor) get zero gradient.
Instead of checkpointing T every 32 splats (the CUDA sampleBuffer,
rasterizer_impl.cu:318-326), we *reconstruct* logT_raw running the chunk scan
in reverse: the chunk's raw log(1-alpha) sum is recomputable from pair data
alone, so logT_start = logT_end - chunk_contribution. No atomics — gradients
reduce via scatter-add (XLA's deterministic sorted-scatter on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .projection import TILE

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
PIX_PER_TILE = TILE * TILE  # 256


def _pixel_offsets():
    j = np.arange(PIX_PER_TILE)
    return (
        jnp.asarray((j % TILE).astype(np.float32)),  # x within tile
        jnp.asarray((j // TILE).astype(np.float32)),  # y within tile
    )


def _chunk_geometry(t, g, means2d, conics, opacities, grid_w, num_tiles):
    """Per-(pair, pixel) alpha for one chunk. Returns (alpha, extras)."""
    dxl, dyl = _pixel_offsets()
    valid = t < num_tiles
    tc = jnp.minimum(t, num_tiles - 1)
    xy = means2d[g]  # [K, 2]
    con = conics[g]  # [K, 3]
    op = opacities[g]  # [K]
    tile_x = (tc % grid_w).astype(jnp.float32) * TILE
    tile_y = (tc // grid_w).astype(jnp.float32) * TILE
    dxv = xy[:, 0:1] - (tile_x[:, None] + dxl[None, :])  # [K, 256]
    dyv = xy[:, 1:2] - (tile_y[:, None] + dyl[None, :])
    power = (
        -0.5 * (con[:, 0:1] * dxv * dxv + con[:, 2:3] * dyv * dyv)
        - con[:, 1:2] * dxv * dyv
    )
    g_exp = jnp.exp(power)
    alpha_raw = jnp.minimum(ALPHA_MAX, op[:, None] * g_exp)
    live = valid[:, None] & (power <= 0.0) & (alpha_raw >= ALPHA_MIN)
    alpha = jnp.where(live, alpha_raw, 0.0)
    return alpha, (live, g_exp, dxv, dyv, con, op, tc)


def _segment_starts(t):
    """Index of the first pair of each tile-segment within a chunk [K]."""
    k = t.shape[0]
    idx = jnp.arange(k, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), t[1:] != t[:-1]])
    return jax.lax.cummax(jnp.where(is_start, idx, 0))


def _num_chunks(total_pairs, mp, chunk):
    """Chunks actually holding pairs (the rest are pure sentinel padding)."""
    total = jnp.clip(total_pairs, 0, mp)
    return (total + chunk - 1) // chunk


def _forward_scan(pair_tile, pair_gauss, means2d, conics, opacities, colors, total_pairs, grid_w, grid_h, chunk):
    num_tiles = grid_w * grid_h
    mp = pair_tile.shape[0]
    nc = _num_chunks(total_pairs, mp, chunk)

    def body(carry):
        i, log_t_raw, log_t_eff, accum = carry
        t = jax.lax.dynamic_slice(pair_tile, (i * chunk,), (chunk,))
        g = jax.lax.dynamic_slice(pair_gauss, (i * chunk,), (chunk,))
        alpha, (_, _, _, _, _, _, tc) = _chunk_geometry(
            t, g, means2d, conics, opacities, grid_w, num_tiles
        )
        log1m = jnp.log1p(-alpha)
        incl = jnp.cumsum(log1m, axis=0)
        excl = incl - log1m
        base = jnp.take(excl, _segment_starts(t), axis=0)
        carry_rows = log_t_raw[tc]  # [K, 256]
        t_excl = jnp.exp(carry_rows + (excl - base))
        t_incl = jnp.exp(carry_rows + (incl - base))
        applied = t_incl >= T_EPS
        w = alpha * t_excl * applied
        col = colors[g]  # [K, 3]
        accum = accum.at[tc].add(
            w[:, :, None] * col[:, None, :], indices_are_sorted=True
        )
        log_t_raw = log_t_raw.at[tc].add(log1m, indices_are_sorted=True)
        log_t_eff = log_t_eff.at[tc].add(
            jnp.where(applied, log1m, 0.0), indices_are_sorted=True
        )
        return (i + 1, log_t_raw, log_t_eff, accum)

    init = (
        jnp.int32(0),
        jnp.zeros((num_tiles, PIX_PER_TILE), jnp.float32),
        jnp.zeros((num_tiles, PIX_PER_TILE), jnp.float32),
        jnp.zeros((num_tiles, PIX_PER_TILE, 3), jnp.float32),
    )
    _, log_t_raw, log_t_eff, accum = jax.lax.while_loop(
        lambda c: c[0] < nc, body, init
    )
    return accum, log_t_eff, log_t_raw


def _backward_scan(
    pair_tile,
    pair_gauss,
    means2d,
    conics,
    opacities,
    colors,
    total_pairs,
    log_t_raw_final,
    ct_accum,
    ct_log_t_eff,
    grid_w,
    grid_h,
    chunk,
):
    num_tiles = grid_w * grid_h
    mp = pair_tile.shape[0]
    nc = _num_chunks(total_pairs, mp, chunk)
    p = means2d.shape[0]

    def body(carry):
        i, log_t_end, suffix_dot, g_means2d, g_conics, g_op, g_colors = carry
        t = jax.lax.dynamic_slice(pair_tile, (i * chunk,), (chunk,))
        g = jax.lax.dynamic_slice(pair_gauss, (i * chunk,), (chunk,))
        alpha, (live, g_exp, dxv, dyv, con, op, tc) = _chunk_geometry(
            t, g, means2d, conics, opacities, grid_w, num_tiles
        )
        log1m = jnp.log1p(-alpha)
        # Reconstruct this chunk's entry transmittance from its exit value.
        log_t_start = log_t_end.at[tc].add(-log1m, indices_are_sorted=True)

        incl = jnp.cumsum(log1m, axis=0)
        excl = incl - log1m
        starts = _segment_starts(t)
        base = jnp.take(excl, starts, axis=0)
        carry_rows = log_t_start[tc]
        t_excl = jnp.exp(carry_rows + (excl - base))
        t_incl = jnp.exp(carry_rows + (incl - base))
        applied = (t_incl >= T_EPS) & live
        w = jnp.where(applied, alpha * t_excl, 0.0)

        col = colors[g]  # [K, 3]
        ct_rows = ct_accum[tc]  # [K, 256, 3]
        dot_c = jnp.einsum("kc,kpc->kp", col, ct_rows, precision="highest")  # c_k . dL/dpixel
        wc = w * dot_c

        # Within-chunk exclusive suffix of wc per tile segment.
        cum_wc = jnp.cumsum(wc, axis=0)
        base_wc = jnp.take(cum_wc - wc, starts, axis=0)
        in_seg_incl = cum_wc - base_wc
        seg_total = jnp.zeros((num_tiles, PIX_PER_TILE), jnp.float32).at[tc].add(
            wc, indices_are_sorted=True
        )
        suffix = (seg_total[tc] - in_seg_incl) + suffix_dot[tc]

        inv_1m = 1.0 / (1.0 - alpha)
        dl_dalpha = jnp.where(
            applied, t_excl * dot_c - (suffix + ct_log_t_eff[tc]) * inv_1m, 0.0
        )
        # Reference convention: clamp at 0.99 NOT gated (backward.cu:621-640).
        dl_dg = op[:, None] * dl_dalpha
        gdx = g_exp * dxv
        gdy = g_exp * dyv
        a, b, c = con[:, 0:1], con[:, 1:2], con[:, 2:3]
        d_mean_x = jnp.sum(dl_dg * (-gdx * a - gdy * b), axis=1)
        d_mean_y = jnp.sum(dl_dg * (-gdy * c - gdx * b), axis=1)
        d_con_a = jnp.sum(dl_dg * (-0.5 * g_exp * dxv * dxv), axis=1)
        d_con_b = jnp.sum(dl_dg * (-g_exp * dxv * dyv), axis=1)
        d_con_c = jnp.sum(dl_dg * (-0.5 * g_exp * dyv * dyv), axis=1)
        d_op = jnp.sum(g_exp * dl_dalpha, axis=1)
        d_col = jnp.einsum("kp,kpc->kc", w, ct_rows, precision="highest")

        g_means2d = g_means2d.at[g].add(jnp.stack([d_mean_x, d_mean_y], axis=-1))
        g_conics = g_conics.at[g].add(jnp.stack([d_con_a, d_con_b, d_con_c], axis=-1))
        g_op = g_op.at[g].add(d_op)
        g_colors = g_colors.at[g].add(d_col)

        suffix_dot = suffix_dot.at[tc].add(wc, indices_are_sorted=True)
        return (i - 1, log_t_start, suffix_dot, g_means2d, g_conics, g_op, g_colors)

    init = (
        nc - 1,
        log_t_raw_final,
        ct_log_t_eff * 0.0,  # suffix over *later* chunks starts empty
        jnp.zeros((p, 2), jnp.float32),
        jnp.zeros((p, 3), jnp.float32),
        jnp.zeros((p,), jnp.float32),
        jnp.zeros((p, 3), jnp.float32),
    )
    carry = jax.lax.while_loop(lambda c: c[0] >= 0, body, init)
    _, _, _, g_means2d, g_conics, g_op, g_colors = carry
    return g_means2d, g_conics, g_op, g_colors


@functools.lru_cache(maxsize=32)
def _make_blend(grid_w: int, grid_h: int, chunk: int):
    @jax.custom_vjp
    def blend(pair_tile, pair_gauss, total_pairs, means2d, conics, opacities, colors):
        accum, log_t_eff, _ = _forward_scan(
            pair_tile, pair_gauss, means2d, conics, opacities, colors,
            total_pairs, grid_w, grid_h, chunk,
        )
        return accum, log_t_eff

    def fwd(pair_tile, pair_gauss, total_pairs, means2d, conics, opacities, colors):
        accum, log_t_eff, log_t_raw = _forward_scan(
            pair_tile, pair_gauss, means2d, conics, opacities, colors,
            total_pairs, grid_w, grid_h, chunk,
        )
        res = (
            pair_tile, pair_gauss, total_pairs, means2d, conics, opacities,
            colors, log_t_raw,
        )
        return (accum, log_t_eff), res

    def bwd(res, cts):
        (
            pair_tile, pair_gauss, total_pairs, means2d, conics, opacities,
            colors, log_t_raw,
        ) = res
        ct_accum, ct_log_t_eff = cts
        g_means2d, g_conics, g_op, g_colors = _backward_scan(
            pair_tile, pair_gauss, means2d, conics, opacities, colors,
            total_pairs, log_t_raw, ct_accum, ct_log_t_eff, grid_w, grid_h, chunk,
        )
        zero_i = np.zeros(pair_tile.shape, dtype=jax.dtypes.float0)
        zero_s = np.zeros((), dtype=jax.dtypes.float0)
        return (zero_i, zero_i, zero_s, g_means2d, g_conics, g_op, g_colors)

    blend.defvjp(fwd, bwd)
    return blend


def blend_tiles(
    pair_tile: jnp.ndarray,
    pair_gauss: jnp.ndarray,
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    total_pairs: jnp.ndarray | None = None,
    *,
    grid_w: int,
    grid_h: int,
    chunk: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Blend sorted pairs into per-tile images.

    `total_pairs` bounds the chunk loop to chunks that actually hold pairs
    (the pair list is valid-prefix + sentinel padding); omitted, every chunk
    of the capacity is processed.

    Returns:
      accum:     [num_tiles, 256, 3] pre-background color sums.
      log_t_eff: [num_tiles, 256] log final transmittance (exp = final_T of
                 forward.cu:458-463).
    """
    assert pair_tile.shape[0] % chunk == 0, "max_pairs must be divisible by chunk"
    if total_pairs is None:
        total_pairs = jnp.int32(pair_tile.shape[0])
    return _make_blend(grid_w, grid_h, chunk)(
        pair_tile, pair_gauss, jnp.asarray(total_pairs, jnp.int32),
        means2d, conics, opacities, colors,
    )


def assemble_image(
    accum: jnp.ndarray,
    log_t_eff: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    grid_w: int,
    grid_h: int,
    width: int,
    height: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Composite background and crop tile grid to the image (HWC).

    out = C + final_T * bg (forward.cu:458-463). Returns (image [H, W, 3],
    final_T [H, W]).
    """
    final_t = jnp.exp(log_t_eff)
    tiles = accum + final_t[:, :, None] * bg[None, None, :]
    img = tiles.reshape(grid_h, grid_w, TILE, TILE, 3).transpose(0, 2, 1, 3, 4)
    img = img.reshape(grid_h * TILE, grid_w * TILE, 3)[:height, :width]
    # Known XLA-CPU miscompilation: fusing this tile->image transpose into an
    # elementwise op against a *closed-over constant* misreads the constant's
    # layout (reduced loss over a correct image came out wrong; minimal repro
    # in tests/test_render.py::test_loss_against_closed_constant). The
    # barrier forces materialization of the image first. Cost on TPU is nil —
    # the image tensor materializes here anyway.
    img = jax.lax.optimization_barrier(img)
    ft = final_t.reshape(grid_h, grid_w, TILE, TILE).transpose(0, 2, 1, 3)
    ft = ft.reshape(grid_h * TILE, grid_w * TILE)[:height, :width]
    return img, ft
