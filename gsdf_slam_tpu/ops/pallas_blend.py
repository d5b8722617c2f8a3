"""Pallas TPU kernels for the tile alpha blend (forward + backward).

The production fast path replacing ops/blend.py's XLA chunk scan on TPU —
the direct counterpart of the reference's two hot kernels (renderCUDA,
forward.cu:317-477; PerGaussianRenderCUDA, backward.cu:464-654), reshaped
for the TPU memory/compute model:

  * pair data is pre-gathered into a packed **field-major** [16, MPA] f32
    array (one embedding-style XLA gather + transpose); a chunk DMA is a
    [16, CHUNK] slice — 16 sublanes x 128 lanes, exactly one tile-aligned
    VMEM block, so per-pair fields arrive as [1, CHUNK] lane vectors;
  * compute orientation is pixels-on-sublanes: every work array is
    [256 pixels, CHUNK pairs]. Per-pair scalars broadcast along sublanes,
    per-pixel carries are [256, 1] columns;
  * every tile's pair range is CHUNK-aligned in the pair list (binning pads
    with zero-opacity sentinel slots), so chunk DMAs never straddle tiles
    and the backward writes whole [16, CHUNK] gradient blocks unmasked;
  * the within-chunk cumulative log-transmittance is a [256,C]x[C,C]
    upper-triangular matmul on the MXU (cumsum-as-matmul), and the color
    accumulation is a [256,C]x[C,3] MXU contraction;
  * early termination per tile: the chunk loop stops once every pixel's raw
    transmittance is below 1e-4 — the vector analog of the reference's
    per-block done-vote (forward.cu:386-389);
  * the backward walks chunks in reverse, reconstructing transmittance from
    the forward's final log-T (no sampleBuffer checkpoints) and carrying
    the suffix dot-product accumulator; per-pair gradients stream to HBM
    and one XLA scatter-add folds them per Gaussian (TPUs have no atomics —
    backward.cu's atomicAdd becomes a segment add).

Numerics match ops/blend.py exactly (same skip rules, same early-term
closed form, same clamp conventions); ops/blend.py remains the golden
CPU/interpret reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend import ALPHA_MAX, ALPHA_MIN, PIX_PER_TILE, T_EPS
from .projection import TILE

LOG_T_EPS = float(np.log(T_EPS))
PACK = 16  # packed fields per pair (9 used; 16 keeps sublane alignment)
F_X, F_Y, F_A, F_B, F_C, F_OP, F_R, F_G, F_B2 = range(9)


def _pixel_xy(tile_idx, grid_w):
    """Global pixel coordinates of tile `tile_idx` as [256, 1] columns."""
    j = jax.lax.broadcasted_iota(jnp.int32, (PIX_PER_TILE, 1), 0)
    jx = (j % TILE).astype(jnp.float32)
    jy = (j // TILE).astype(jnp.float32)
    tx = (tile_idx % grid_w).astype(jnp.float32) * TILE
    ty = (tile_idx // grid_w).astype(jnp.float32) * TILE
    return tx + jx, ty + jy


def _chunk_alpha(buf, px, py):
    """Alpha etc. for one [16, CHUNK] field block vs 256 pixels.

    Returns [256, CHUNK] arrays (pixels on sublanes, pairs on lanes)."""
    x = buf[F_X : F_X + 1, :]  # [1, C]
    y = buf[F_Y : F_Y + 1, :]
    a = buf[F_A : F_A + 1, :]
    b = buf[F_B : F_B + 1, :]
    c = buf[F_C : F_C + 1, :]
    op = buf[F_OP : F_OP + 1, :]
    dx = x - px  # [256, C]
    dy = y - py
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    g_exp = jnp.exp(power)
    alpha_raw = jnp.minimum(ALPHA_MAX, op * g_exp)
    live = (power <= 0.0) & (alpha_raw >= ALPHA_MIN)
    alpha = jnp.where(live, alpha_raw, 0.0)
    return alpha, g_exp, dx, dy, (a, b, c, op)


def _triu(chunk):
    """U[j, k] = 1 iff j <= k; (x @ U)[:, k] = inclusive cumsum over pairs."""
    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (r <= c).astype(jnp.float32)


def _mm(a, b, dims):
    # HIGHEST (bf16x6 passes, full f32): default MXU precision rounds
    # operands to bf16 (~0.4% transmittance error); HIGH (bf16x3) was
    # measured at the same speed here, so keep the exact form.
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# --------------------------------------------------------------------- fwd
def _fwd_kernel(ranges_ref, pairs_hbm, accum_ref, teff_ref, traw_ref,
                buf_ref, sem, *, grid_w, chunk):
    t = pl.program_id(0)
    # ranges is [2, num_tiles]: SMEM pads the trailing dim to 128 lanes, so
    # tiles must be the trailing dim or the prefetch blows the SMEM budget.
    start = ranges_ref[0, t]
    n = ranges_ref[1, t]
    n_chunks = pl.cdiv(n, chunk)
    px, py = _pixel_xy(t, grid_w)
    triu = _triu(chunk)

    def cond(carry):
        c_idx, log_raw, _, _ = carry
        return jnp.logical_and(c_idx < n_chunks, jnp.max(log_raw) >= LOG_T_EPS)

    def body(carry):
        c_idx, log_raw, log_eff, acc = carry
        off = pl.multiple_of(start + c_idx * chunk, chunk)
        dma = pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(off, chunk)], buf_ref, sem
        )
        dma.start()
        dma.wait()
        buf = buf_ref[:]
        alpha, _, _, _, _ = _chunk_alpha(buf, px, py)
        log1m = jnp.log1p(-alpha)  # [256, C]
        incl = _mm(log1m, triu, (((1,), (0,)),)[0])  # [256, C] cumsum
        t_incl = jnp.exp(log_raw + incl)
        applied = (t_incl >= T_EPS).astype(jnp.float32)
        t_excl = jnp.exp(log_raw + (incl - log1m))
        w = alpha * t_excl * applied  # [256, C]
        col_t = buf[F_R : F_R + 3, :]  # [3, C]
        acc = acc + _mm(w, col_t, (((1,), (1,)),)[0])  # [256, 3]
        log_raw = log_raw + jnp.sum(log1m, axis=1, keepdims=True)
        log_eff = log_eff + jnp.sum(log1m * applied, axis=1, keepdims=True)
        return c_idx + 1, log_raw, log_eff, acc

    init = (
        jnp.int32(0),
        jnp.zeros((PIX_PER_TILE, 1), jnp.float32),
        jnp.zeros((PIX_PER_TILE, 1), jnp.float32),
        jnp.zeros((PIX_PER_TILE, 3), jnp.float32),
    )
    _, log_raw, log_eff, acc = jax.lax.while_loop(cond, body, init)
    accum_ref[0] = acc
    teff_ref[0] = log_eff
    traw_ref[0] = log_raw


def _run_fwd(ranges, pairs, num_tiles, grid_w, chunk):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, PIX_PER_TILE, 3), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, PIX_PER_TILE, 1), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, PIX_PER_TILE, 1), lambda i, r: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((PACK, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    accum, teff, traw = pl.pallas_call(
        functools.partial(_fwd_kernel, grid_w=grid_w, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, PIX_PER_TILE, 3), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIX_PER_TILE, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIX_PER_TILE, 1), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(ranges, pairs)
    return accum, teff[:, :, 0], traw[:, :, 0]


# --------------------------------------------------------------------- bwd
def _bwd_kernel(ranges_ref, pairs_hbm, traw_ref, ct_acc_ref, ct_teff_ref,
                grads_hbm, done_ref, buf_ref, gbuf_ref, in_sem, out_sem,
                *, grid_w, chunk):
    t = pl.program_id(0)
    # ranges is [2, num_tiles]: SMEM pads the trailing dim to 128 lanes, so
    # tiles must be the trailing dim or the prefetch blows the SMEM budget.
    start = ranges_ref[0, t]
    n = ranges_ref[1, t]
    n_chunks = pl.cdiv(n, chunk)
    px, py = _pixel_xy(t, grid_w)
    triu = _triu(chunk)
    ct_pix = ct_acc_ref[0]  # [256, 3]
    ct_eff = ct_teff_ref[0]  # [256, 1]

    def body(i, carry):
        c_idx = n_chunks - 1 - i
        log_end, suffix = carry
        off = pl.multiple_of(start + c_idx * chunk, chunk)
        dma = pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(off, chunk)], buf_ref, in_sem
        )
        dma.start()
        dma.wait()
        buf = buf_ref[:]
        alpha, g_exp, dx, dy, (a, b, c, op) = _chunk_alpha(buf, px, py)
        log1m = jnp.log1p(-alpha)
        log_start = log_end - jnp.sum(log1m, axis=1, keepdims=True)
        incl = _mm(log1m, triu, (((1,), (0,)),)[0])
        t_incl = jnp.exp(log_start + incl)
        applied = jnp.where((t_incl >= T_EPS) & (alpha > 0.0), 1.0, 0.0)
        t_excl = jnp.exp(log_start + (incl - log1m))
        w = alpha * t_excl * applied  # [256, C]

        col_t = buf[F_R : F_R + 3, :]  # [3, C]
        dot_c = _mm(ct_pix, col_t, (((1,), (0,)),)[0])  # [256, C]
        wc = w * dot_c
        incl_wc = _mm(wc, triu, (((1,), (0,)),)[0])
        total_wc = jnp.sum(wc, axis=1, keepdims=True)
        sfx = (total_wc - incl_wc) + suffix  # [256, C]

        inv1m = 1.0 / (1.0 - alpha)
        dl_dalpha = applied * (t_excl * dot_c - (sfx + ct_eff) * inv1m)
        dl_dg = op * dl_dalpha
        gdx = g_exp * dx
        gdy = g_exp * dy
        d_mx = jnp.sum(dl_dg * (-gdx * a - gdy * b), axis=0, keepdims=True)
        d_my = jnp.sum(dl_dg * (-gdy * c - gdx * b), axis=0, keepdims=True)
        d_a = jnp.sum(dl_dg * (-0.5 * g_exp * dx * dx), axis=0, keepdims=True)
        d_b = jnp.sum(dl_dg * (-g_exp * dx * dy), axis=0, keepdims=True)
        d_c = jnp.sum(dl_dg * (-0.5 * g_exp * dy * dy), axis=0, keepdims=True)
        d_op = jnp.sum(g_exp * dl_dalpha, axis=0, keepdims=True)
        d_col = _mm(ct_pix, w, (((0,), (0,)),)[0])  # [3, C]
        zeros7 = jnp.zeros((PACK - 9, chunk), jnp.float32)
        gbuf_ref[:] = jnp.concatenate(
            [d_mx, d_my, d_a, d_b, d_c, d_op, d_col, zeros7], axis=0
        )
        out = pltpu.make_async_copy(
            gbuf_ref, grads_hbm.at[:, pl.ds(off, chunk)], out_sem
        )
        out.start()
        out.wait()
        return log_start, suffix + total_wc

    init = (traw_ref[0], ct_eff * 0.0)
    jax.lax.fori_loop(0, n_chunks, body, init)
    done_ref[0] = jnp.ones((1, 1), jnp.int32)


def _run_bwd(ranges, pairs, traw, ct_accum, ct_teff, mpa, num_tiles, grid_w, chunk):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, PIX_PER_TILE, 1), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, PIX_PER_TILE, 3), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, PIX_PER_TILE, 1), lambda i, r: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, 1), lambda i, r: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((PACK, chunk), jnp.float32),
            pltpu.VMEM((PACK, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    grads, _ = pl.pallas_call(
        functools.partial(_bwd_kernel, grid_w=grid_w, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((PACK, mpa), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() != "tpu",
    )(ranges, pairs, traw, ct_accum, ct_teff)
    return grads


# ----------------------------------------------------------------- wrapper
def pack_pairs(pair_gauss_aligned, means2d, conics, opacities, colors):
    """Gather per-pair packed fields [16, MPA]; sentinel index P -> zeros."""
    p = means2d.shape[0]
    table = jnp.concatenate(
        [
            means2d,
            conics,
            opacities[:, None],
            colors,
            jnp.zeros((p, PACK - 9), jnp.float32),
        ],
        axis=1,
    )
    table = jnp.concatenate([table, jnp.zeros((1, PACK), jnp.float32)], axis=0)
    return table[pair_gauss_aligned].T  # [16, MPA]


@functools.lru_cache(maxsize=32)
def _make_pallas_blend(grid_w: int, grid_h: int, chunk: int, mpa: int):
    num_tiles = grid_w * grid_h

    @jax.custom_vjp
    def blend(ranges, pair_gauss_aligned, means2d, conics, opacities, colors):
        pairs = pack_pairs(pair_gauss_aligned, means2d, conics, opacities, colors)
        accum, teff, _ = _run_fwd(ranges, pairs, num_tiles, grid_w, chunk)
        return accum, teff

    def fwd(ranges, pair_gauss_aligned, means2d, conics, opacities, colors):
        pairs = pack_pairs(pair_gauss_aligned, means2d, conics, opacities, colors)
        accum, teff, traw = _run_fwd(ranges, pairs, num_tiles, grid_w, chunk)
        return (accum, teff), (ranges, pair_gauss_aligned, pairs, traw, means2d.shape[0])

    def bwd(res, cts):
        ranges, pair_gauss_aligned, pairs, traw, p = res
        ct_accum, ct_teff = cts
        pair_grads = _run_bwd(
            ranges, pairs, traw[:, :, None], ct_accum, ct_teff[:, :, None],
            mpa, num_tiles, grid_w, chunk,
        )
        # Fold per-pair grads into per-Gaussian grads (sentinel row dropped).
        acc = jnp.zeros((p + 1, PACK), jnp.float32).at[pair_gauss_aligned].add(
            pair_grads.T
        )[:p]
        g_means2d = acc[:, 0:2]
        g_conics = acc[:, 2:5]
        g_op = acc[:, 5]
        g_colors = acc[:, 6:9]
        zi = np.zeros(ranges.shape, dtype=jax.dtypes.float0)
        zg = np.zeros(pair_gauss_aligned.shape, dtype=jax.dtypes.float0)
        return (zi, zg, g_means2d, g_conics, g_op, g_colors)

    blend.defvjp(fwd, bwd)
    return blend


def blend_tiles_pallas(
    ranges: jnp.ndarray,  # [2, num_tiles] int32 (aligned starts; counts)
    pair_gauss_aligned: jnp.ndarray,  # [MPA] int32, sentinel = P
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    *,
    grid_w: int,
    grid_h: int,
    chunk: int = 128,
):
    """Pallas tile blend. Same contract as ops.blend.blend_tiles but over the
    CHUNK-aligned pair layout produced by binning.align_pairs."""
    assert chunk % 128 == 0, "pallas chunk must be a multiple of 128 lanes"
    return _make_pallas_blend(grid_w, grid_h, chunk, pair_gauss_aligned.shape[0])(
        ranges, pair_gauss_aligned, means2d, conics, opacities, colors
    )
