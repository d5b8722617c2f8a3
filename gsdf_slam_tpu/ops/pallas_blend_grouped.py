"""Grouped-tile Pallas blend kernels (the production TPU fast path).

Generalizes ops/pallas_blend.py from one tile per chunk to G adjacent tiles
sharing chunk alignment. Why: with 16x16 tiles, room-scale scenes average
well under CHUNK(=128) pairs per tile, so per-tile alignment made ~40% of
all packed pair rows padding — and every row-loop-bound XLA gather/scatter
plus every kernel chunk pays per row. Group alignment cuts padding to
~CHUNK/2 per GROUP of G tiles.

The kernel keeps G tiles' carries resident as [256, G] panels and turns all
per-tile segmentation into small MXU contractions against the one-hot
`onehot[G, C]` of each pair's tile-within-group slot:

  eq[C,C]      = onehot^T onehot          (same-tile pair mask)
  U_seg        = triu * eq                (segmented cumsum operator)
  carry_cols   = carry[256,G] @ onehot    (per-pair transmittance carry)
  per-tile sum = x[256,C] @ onehot^T      (scatter-free accumulation)

Pixel coordinates are tile-LOCAL on the sublane axis (identical 16x16 grid
for every tile); per-pair means are shifted into local coordinates on the
lane axis, so pairs of different tiles coexist in one [256, C] panel.

Numerics are identical to ops/blend.py / ops/pallas_blend.py (asserted by
the parity tests); blend order within a tile is unchanged.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blend import ALPHA_MAX, ALPHA_MIN, PIX_PER_TILE, T_EPS
from .pallas_blend import PACK, _mm, _triu
from .projection import TILE

LOG_T_EPS = float(np.log(T_EPS))
F_SLOT = 9  # packed field carrying tile-within-group


def _local_xy():
    j = jax.lax.broadcasted_iota(jnp.int32, (PIX_PER_TILE, 1), 0)
    return (j % TILE).astype(jnp.float32), (j // TILE).astype(jnp.float32)


def _chunk_geom(buf, g_idx, grid_w, group, pos0, n):
    """Per-(pair, local-pixel) alpha for one [16, CHUNK] block.

    `pos0 + lane < n` masks group-tail padding: with the fused binning
    (ops/pallas_binning.py) padding lanes hold NEIGHBOR pairs' real payload
    rather than a zero sentinel row, so they must be dead by position. The
    payload is always valid finite data (conics are PD, so power <= 0 and
    no inf/NaN can leak through the masked lanes' zero weights)."""
    jx, jy = _local_xy()
    chunk = buf.shape[1]
    in_count = (jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + pos0) < n
    slot = buf[F_SLOT : F_SLOT + 1, :].astype(jnp.int32)  # [1, C]
    tile = g_idx * group + slot
    tox = (tile % grid_w).astype(jnp.float32) * TILE
    toy = (tile // grid_w).astype(jnp.float32) * TILE
    x = buf[0:1, :] - tox  # tile-local mean
    y = buf[1:2, :] - toy
    a = buf[2:3, :]
    b = buf[3:4, :]
    c = buf[4:5, :]
    op = buf[5:6, :]
    dx = x - jx  # [256, C]
    dy = y - jy
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    g_exp = jnp.exp(power)
    alpha_raw = jnp.minimum(ALPHA_MAX, op * g_exp)
    live = (power <= 0.0) & (alpha_raw >= ALPHA_MIN) & in_count
    alpha = jnp.where(live, alpha_raw, 0.0)
    return alpha, g_exp, dx, dy, (a, b, c, op), slot


def _onehot(slot, group, chunk):
    gi = jax.lax.broadcasted_iota(jnp.int32, (group, chunk), 0)
    return (gi == slot).astype(jnp.float32)  # [G, C]


# ---------------------------------------------------------------------- fwd
def _fwd_kernel(ranges_ref, pairs_hbm, *rest, grid_w, chunk, group,
                keep_margin=None):
    """Grouped fwd blend. With ``keep_margin`` (the export variant) the
    kernel additionally streams a per-pair LIVENESS row to HBM: a pair is
    kept iff some pixel has alpha > 0 while the exclusive transmittance is
    still >= T_EPS/keep_margin — i.e. the pair contributes to the image or
    to any surviving pair's gradient, with a x-margin slack so the pruned
    cache stays valid as parameters drift across the reuse cadence. Dead
    pairs are EXACTLY zero-contribution at export parameters: removing
    them changes neither the image nor any surviving gradient (see
    build_pruned_cache)."""
    if keep_margin is None:
        (accum_ref, teff_ref, traw_ref, ndone_ref, buf_ref, sem) = rest
        keep_hbm = kbuf_ref = ksem = None
        log_exit = LOG_T_EPS
    else:
        (_zeros_keep, accum_ref, teff_ref, traw_ref, ndone_ref, keep_hbm,
         buf_ref, kbuf_ref, sem, ksem) = rest
        # relaxed exit so the margin band is fully observed before the
        # group-level termination stops writing keep rows
        log_exit = LOG_T_EPS - float(np.log(keep_margin))
    g_idx = pl.program_id(0)
    start = ranges_ref[0, g_idx]
    n = ranges_ref[1, g_idx]
    n_chunks = pl.cdiv(n, chunk)
    triu = _triu(chunk)

    # Double-buffered DMA (buf_ref is [2, PACK, chunk], sem is a (2,) array):
    # chunk c+1 streams in while chunk c computes, hiding the per-chunk copy
    # latency (~2500 sequential 8 KB copies per step otherwise).
    def _dma(c_idx, slot):
        off = pl.multiple_of(start + c_idx * chunk, chunk)
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(off, chunk)], buf_ref.at[slot], sem.at[slot]
        )

    def _keep_dma(c_idx, slot):
        off = pl.multiple_of(start + c_idx * chunk, chunk)
        return pltpu.make_async_copy(
            kbuf_ref.at[slot], keep_hbm.at[:, pl.ds(off, chunk)],
            ksem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _prologue():
        _dma(0, 0).start()

    def cond(carry):
        c_idx, log_raw, _, _ = carry
        return jnp.logical_and(c_idx < n_chunks, jnp.max(log_raw) >= log_exit)

    def body(carry):
        c_idx, log_raw, log_eff, acc = carry  # [256,G], [256,G], [256,G,3]
        slot_i = jax.lax.rem(c_idx, 2)

        @pl.when(c_idx + 1 < n_chunks)
        def _prefetch():
            _dma(c_idx + 1, 1 - slot_i).start()

        _dma(c_idx, slot_i).wait()
        buf = buf_ref[slot_i]
        alpha, _, _, _, _, slot = _chunk_geom(
            buf, g_idx, grid_w, group, c_idx * chunk, n
        )
        oh = _onehot(slot, group, chunk)  # [G, C]
        eq = _mm(oh, oh, (((0,), (0,)),)[0])  # [C, C]
        useg = triu * eq
        log1m = jnp.log1p(-alpha)
        incl = _mm(log1m, useg, (((1,), (0,)),)[0])  # [256, C]
        carry_cols = _mm(log_raw, oh, (((1,), (0,)),)[0])  # [256, C]
        # one exp panel, not two: the T >= T_EPS termination test is a
        # monotone compare, so it runs in log domain with no exp
        t_excl = jnp.exp(carry_cols + (incl - log1m))
        applied = (carry_cols + incl >= LOG_T_EPS).astype(jnp.float32)
        w = alpha * t_excl * applied
        col = buf[6:9, :]  # [3, C]
        adds = [
            _mm(w * col[ch : ch + 1, :], oh, (((1,), (1,)),)[0])[:, :, None]
            for ch in range(3)
        ]
        acc = acc + jnp.concatenate(adds, axis=2)  # [256, G, 3]
        log_raw = log_raw + _mm(log1m, oh, (((1,), (1,)),)[0])
        log_eff = log_eff + _mm(log1m * applied, oh, (((1,), (1,)),)[0])

        if keep_margin is not None:
            excl_log = carry_cols + (incl - log1m)
            live = (alpha > 0.0) & (excl_log >= log_exit)
            keep_row = jnp.max(live.astype(jnp.float32), axis=0,
                               keepdims=True)  # [1, C]
            # the write two iterations back reused this kbuf slot
            @pl.when(c_idx >= 2)
            def _drain_keep():
                _keep_dma(c_idx - 2, slot_i).wait()

            kbuf_ref[slot_i] = jnp.broadcast_to(keep_row, (8, chunk))
            _keep_dma(c_idx, slot_i).start()
        return c_idx + 1, log_raw, log_eff, acc

    init = (
        jnp.int32(0),
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group, 3), jnp.float32),
    )
    c_done, log_raw, log_eff, acc = jax.lax.while_loop(cond, body, init)

    # Early termination leaves the prefetch for chunk c_done in flight
    # (started while computing c_done-1) — drain it before the kernel ends.
    @pl.when(c_done < n_chunks)
    def _drain():
        _dma(c_done, jax.lax.rem(c_done, 2)).wait()

    if keep_margin is not None:
        # drain the last two keep writes before the kernel ends
        @pl.when(c_done > 1)
        def _drain_k2():
            _keep_dma(c_done - 2, jax.lax.rem(c_done - 2, 2)).wait()

        @pl.when(c_done > 0)
        def _drain_k1():
            _keep_dma(c_done - 1, jax.lax.rem(c_done - 1, 2)).wait()

    accum_ref[0] = acc
    teff_ref[0] = log_eff
    traw_ref[0] = log_raw
    ndone_ref[0] = jnp.full((1, 1), c_done, jnp.int32)


def _run_fwd(ranges, pairs, ng, grid_w, chunk, group, keep_margin=None):
    """Production fwd launch. With ``keep_margin`` also returns the
    per-pair keep row [8, MPA] (row 0 is the mask; rows are identical —
    sublane-tiled DMA) for build_pruned_cache."""
    out_specs = [
        pl.BlockSpec((1, PIX_PER_TILE, group, 3), lambda i, r: (i, 0, 0, 0)),
        pl.BlockSpec((1, PIX_PER_TILE, group), lambda i, r: (i, 0, 0)),
        pl.BlockSpec((1, PIX_PER_TILE, group), lambda i, r: (i, 0, 0)),
        pl.BlockSpec((1, 1, 1), lambda i, r: (i, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((ng, PIX_PER_TILE, group, 3), jnp.float32),
        jax.ShapeDtypeStruct((ng, PIX_PER_TILE, group), jnp.float32),
        jax.ShapeDtypeStruct((ng, PIX_PER_TILE, group), jnp.float32),
        jax.ShapeDtypeStruct((ng, 1, 1), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((2, PACK, chunk), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    mpa = pairs.shape[1]
    inputs = (ranges, pairs)
    kwargs = {}
    if keep_margin is not None:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct((8, mpa), jnp.float32))
        scratch += [
            pltpu.VMEM((2, 8, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        # scratch order must match the kernel's ref order: bufs then sems
        scratch = [scratch[0], scratch[2], scratch[1], scratch[3]]
        inputs = (ranges, pairs, jnp.zeros((8, mpa), jnp.float32))
        # early-terminated / never-visited regions must read keep = 0
        kwargs = dict(
            input_output_aliases={2: 4},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, grid_w=grid_w, chunk=chunk,
                          group=group, keep_margin=keep_margin),
        grid_spec=grid_spec,
        out_shape=out_shape,
        # interpret mode keeps the production kernels testable off-TPU
        interpret=jax.default_backend() != "tpu",
        **kwargs,
    )(*inputs)


# ---------------------------------------------------------------------- bwd
def _bwd_kernel(ranges_ref, pairs_hbm, traw_ref, ct_acc_ref, ct_teff_ref,
                zeros_hbm, grads_hbm, done_ref, buf_ref, gbuf_ref, in_sem,
                out_sem, *, grid_w, chunk, group):
    g_idx = pl.program_id(0)
    start = ranges_ref[0, g_idx]
    n = ranges_ref[1, g_idx]
    # row 2 carries the forward's early-termination chunk count: pairs in
    # later chunks were never applied, so their gradients are zero — the
    # grads buffer is zero-initialized through input/output aliasing.
    n_chunks = ranges_ref[2, g_idx]
    triu = _triu(chunk)
    ct_acc = ct_acc_ref[0]  # [256, G, 3]
    ct_eff = ct_teff_ref[0]  # [256, G]

    # Double-buffered in/out DMA streams (buf_ref/gbuf_ref are [2,...],
    # sems are (2,)): reads prefetch one chunk ahead, writes drain one
    # behind — neither latency sits on the critical path.
    def _off(i):
        return pl.multiple_of(start + (n_chunks - 1 - i) * chunk, chunk)

    def _in_dma(i, slot):
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(_off(i), chunk)], buf_ref.at[slot], in_sem.at[slot]
        )

    def _out_dma(i, slot):
        return pltpu.make_async_copy(
            gbuf_ref.at[slot], grads_hbm.at[:, pl.ds(_off(i), chunk)], out_sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _prologue():
        _in_dma(0, 0).start()

    def body(i, carry):
        c_idx = n_chunks - 1 - i
        slot_i = jax.lax.rem(i, 2)
        log_end, suffix = carry  # [256, G] each
        off = _off(i)

        @pl.when(i + 1 < n_chunks)
        def _prefetch():
            _in_dma(i + 1, 1 - slot_i).start()

        _in_dma(i, slot_i).wait()
        buf = buf_ref[slot_i]
        alpha, g_exp, dx, dy, (a, b, c, op), slot = _chunk_geom(
            buf, g_idx, grid_w, group, c_idx * chunk, n
        )
        oh = _onehot(slot, group, chunk)
        eq = _mm(oh, oh, (((0,), (0,)),)[0])
        useg = triu * eq
        log1m = jnp.log1p(-alpha)
        log_start = log_end - _mm(log1m, oh, (((1,), (1,)),)[0])
        incl = _mm(log1m, useg, (((1,), (0,)),)[0])
        carry_cols = _mm(log_start, oh, (((1,), (0,)),)[0])
        t_excl = jnp.exp(carry_cols + (incl - log1m))
        applied = jnp.where(
            (carry_cols + incl >= LOG_T_EPS) & (alpha > 0.0), 1.0, 0.0
        )
        w = alpha * t_excl * applied

        col = buf[6:9, :]  # [3, C]
        # per-pair pixel cotangent of ITS tile, per channel
        ct_cols = [
            _mm(ct_acc[:, :, ch], oh, (((1,), (0,)),)[0]) for ch in range(3)
        ]  # 3 x [256, C]
        dot_c = (
            col[0:1, :] * ct_cols[0]
            + col[1:2, :] * ct_cols[1]
            + col[2:3, :] * ct_cols[2]
        )
        wc = w * dot_c
        per_tile_wc = _mm(wc, oh, (((1,), (1,)),)[0])  # [256, G]
        seg_total_cols = _mm(per_tile_wc, oh, (((1,), (0,)),)[0])  # [256, C]
        incl_wc = _mm(wc, useg, (((1,), (0,)),)[0])
        sfx = (seg_total_cols - incl_wc) + _mm(suffix, oh, (((1,), (0,)),)[0])

        inv1m = 1.0 / (1.0 - alpha)
        ct_eff_cols = _mm(ct_eff, oh, (((1,), (0,)),)[0])
        dl_dalpha = applied * (t_excl * dot_c - (sfx + ct_eff_cols) * inv1m)
        dl_dg = op * dl_dalpha
        gdx = g_exp * dx
        gdy = g_exp * dy
        d_mx = jnp.sum(dl_dg * (-gdx * a - gdy * b), axis=0, keepdims=True)
        d_my = jnp.sum(dl_dg * (-gdy * c - gdx * b), axis=0, keepdims=True)
        d_a = jnp.sum(dl_dg * (-0.5 * g_exp * dx * dx), axis=0, keepdims=True)
        d_b = jnp.sum(dl_dg * (-g_exp * dx * dy), axis=0, keepdims=True)
        d_c = jnp.sum(dl_dg * (-0.5 * g_exp * dy * dy), axis=0, keepdims=True)
        d_op = jnp.sum(g_exp * dl_dalpha, axis=0, keepdims=True)
        d_col = jnp.concatenate(
            [jnp.sum(w * ct_cols[ch], axis=0, keepdims=True) for ch in range(3)],
            axis=0,
        )  # [3, C]
        zeros7 = jnp.zeros((PACK - 9, chunk), jnp.float32)

        # the write two iterations back reused this gbuf slot — drain it
        @pl.when(i >= 2)
        def _drain_prev():
            _out_dma(i - 2, slot_i).wait()

        gbuf_ref[slot_i] = jnp.concatenate(
            [d_mx, d_my, d_a, d_b, d_c, d_op, d_col, zeros7], axis=0
        )
        _out_dma(i, slot_i).start()
        return log_start, suffix + per_tile_wc

    init = (traw_ref[0], ct_eff * 0.0)
    jax.lax.fori_loop(0, n_chunks, body, init)

    @pl.when(n_chunks > 1)
    def _drain_m2():
        _out_dma(n_chunks - 2, jax.lax.rem(n_chunks - 2, 2)).wait()

    @pl.when(n_chunks > 0)
    def _drain_m1():
        _out_dma(n_chunks - 1, jax.lax.rem(n_chunks - 1, 2)).wait()

    done_ref[0] = jnp.ones((1, 1), jnp.int32)


def _run_bwd(ranges, pairs, traw, ct_accum, ct_teff, mpa, ng, grid_w, chunk, group):
    zeros_grads = jnp.zeros((PACK, mpa), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, PIX_PER_TILE, group), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, PIX_PER_TILE, group, 3), lambda i, r: (i, 0, 0, 0)),
            pl.BlockSpec((1, PIX_PER_TILE, group), lambda i, r: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, 1), lambda i, r: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, PACK, chunk), jnp.float32),
            pltpu.VMEM((2, PACK, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    grads, _ = pl.pallas_call(
        functools.partial(_bwd_kernel, grid_w=grid_w, chunk=chunk, group=group),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((PACK, mpa), jnp.float32),
            jax.ShapeDtypeStruct((ng, 1, 1), jnp.int32),
        ],
        # input 5 (zeros, after the scalar-prefetch operand) -> output 0:
        # unvisited chunk regions must read as zero gradients
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() != "tpu",
    )(ranges, pairs, traw, ct_accum, ct_teff, zeros_grads)
    return grads


# ----------------------------------------------------------- binning cache
class BinningCache(NamedTuple):
    """Frozen binning permutation for cross-step reuse.

    TPU-first design point with no reference counterpart: the reference
    re-bins every iteration (rasterizer_impl.cu:456-500) because CUDA
    binning is cheap next to its kernels; on TPU the expand/sort/realign
    machinery is ~40% of the train step (docs/PERF.md), while between
    consecutive re-renders of the same keyframe the pair MEMBERSHIP barely
    moves (sub-pixel mean drift, <1% scale drift per optimizer step). A
    cache freezes the pair->gaussian map and group layout; every cached
    step still gathers FRESH per-gaussian payload (means/conics/opacity/
    colors), so values are exact — only which-splat-hits-which-tile and
    the within-tile depth order are stale, bounded by the mapper's
    `rebin_interval` (engine/mapper.py). Quality impact is measured in
    benchmarks/quality.py --rebin.
    """

    ranges: jnp.ndarray  # [2, ng] int32: chunk-aligned group starts; counts
    gid: jnp.ndarray  # [MPA] int32 pair -> gaussian row, clipped to [0, P]
    slot: jnp.ndarray  # [MPA] f32 tile-within-group of each pair
    total_pairs: jnp.ndarray  # [] int32 pair count at build time
    kept_bounds: jnp.ndarray  # [P] int32 prefix kept-pair counts (fold-v4)
    # [] int32: 1 if a COMPACTED pruned cache could not fit its live pairs
    # into the reduced static capacity (counts are clamped to stay in
    # bounds; the render is then missing pairs). The mapper discards such
    # caches and re-bins — see build_pruned_cache(out_len=...).
    compact_overflow: jnp.ndarray = np.zeros((), np.int32)


def compact_cache_len(max_pairs: int, ng: int, chunk: int,
                      factor: float) -> int:
    """Static pair capacity of a COMPACTED pruned cache: factor * max_pairs
    plus per-group alignment slack, chunk-rounded. Shared by the cache
    builder and the mapper's AOT-prewarm skeleton (shapes must agree or
    prewarmed executables miss the persistent cache)."""
    body = int(max_pairs * factor) + ng * chunk
    return -(-body // chunk) * chunk


def build_pruned_cache(ranges, gid, slot, kept_bounds, keep, total_pairs,
                       *, chunk, p, out_len=None):
    """Compact a just-exported binning to its LIVE pairs only.

    ``keep`` is the export fwd kernel's per-pair liveness row: a pair is
    live iff some pixel has alpha > 0 with exclusive transmittance still
    >= T_EPS/margin. At export parameters pruning is EXACT — a dead pair
    adds zero to every accumulated color (w = alpha*T*applied = 0 at all
    its alpha>0 pixels, which are all past the termination frontier) and
    zero to every surviving pair's gradient (at any still-applied pixel
    the dead pair's alpha is 0, so it never altered that pixel's carry).
    Across the reuse cadence the margin absorbs parameter drift; the
    staleness class is the same as the frozen permutation itself
    (docs/PERF.md cross-step persistence; QUALITY_PRUNE.json measures it).

    At converged density ~36% of pairs are dead (benchmarks/term_probe.py)
    — the CUDA reference skips that work in-kernel via its per-pixel
    early-out (forward.cu:403-453); chunked TPU streams can't skip at
    sub-chunk granularity (measured: only 6.7% of chunks are fully dead),
    so the cadence's cached steps prune the stream itself instead.

    Cost (export steps only): two [MPA] lane cumsums, a 2-row [MPA]
    scatter, and one 2-operand sort — no wide-payload traffic; the cached
    path re-gathers payload fresh per step by gid anyway.

    ``out_len`` emits the cache at a SMALLER static pair capacity
    (compact_cache_len), shrinking every shape-bound stage of the cached
    step (the wide payload gather and the gradient fold's sort scale with
    the array LENGTH, not the live count). If the live pairs don't fit,
    group counts are clamped in-bounds and ``compact_overflow`` is set —
    the mapper discards such a cache and re-bins.
    """
    mpa = gid.shape[0]
    ng = ranges.shape[1]
    if out_len is not None:
        assert out_len % chunk == 0 and out_len >= chunk
    gstarts, gcounts = ranges[0], ranges[1]
    keep_row = keep[0] if keep.ndim == 2 else keep
    keep_i = (keep_row > 0.0).astype(jnp.int32)

    csum = jnp.cumsum(keep_i)  # inclusive prefix of kept lanes
    csum0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), csum])
    kept_per_group = csum0[gstarts + gcounts] - csum0[gstarts]
    new_sizes = (kept_per_group + chunk - 1) // chunk * chunk
    new_gstarts = (jnp.cumsum(new_sizes) - new_sizes).astype(jnp.int32)
    out = mpa if out_len is None else out_len
    overflow = jnp.int32(0)
    if out_len is not None:
        required = new_gstarts[-1] + new_sizes[-1]
        overflow = (required > out).astype(jnp.int32)
        # clamp so every group's aligned DMA region stays in bounds; the
        # overflow flag invalidates the cache host-side
        new_gstarts = jnp.minimum(new_gstarts, out - chunk)
        kept_per_group = jnp.minimum(
            kept_per_group, jnp.maximum(out - new_gstarts, 0)
        )

    # per-lane destination offset: off[lane] = new_gstart[g] - csum0[gstart[g]]
    # for the lane's group g, materialized by scattering per-group deltas at
    # group starts and cumsumming (no [MPA]-row gather from a [NG] table)
    offs = new_gstarts - csum0[gstarts]
    deltas = offs - jnp.concatenate([jnp.zeros((1,), jnp.int32), offs[:-1]])
    lane_off = jnp.cumsum(
        jnp.zeros((mpa,), jnp.int32).at[gstarts].add(deltas)
    )
    new_pos = jnp.where(keep_i == 1, lane_off + csum0[:mpa], out)

    new_gid = jnp.full((out,), p, jnp.int32).at[new_pos].set(gid, mode="drop")
    new_slot = jnp.zeros((out,), jnp.float32).at[new_pos].set(slot, mode="drop")
    new_ranges = jnp.stack([new_gstarts, kept_per_group], axis=0)

    # pruned kept_bounds: in gid-sorted order the ORIGINAL kept_bounds are
    # exactly the per-gaussian segment boundaries, so a sort of (gid, keep)
    # + prefix + gather at those boundaries counts each gaussian's
    # surviving pairs (the fold's analytic-boundary trick, reused)
    bnd = jnp.zeros((mpa + 1,), jnp.int32)
    bnd = bnd.at[gstarts + gcounts].add(1)
    bnd = bnd.at[gstarts].add(-1)
    lvl = jnp.cumsum(bnd[:mpa])
    masked = jnp.where(lvl == -1, jnp.clip(gid, 0, p - 1), jnp.int32(0x7FFFFF00))
    _, sorted_keep = jax.lax.sort(
        (masked, keep_i.astype(jnp.float32)), num_keys=1, is_stable=False
    )
    ck0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), jnp.cumsum(sorted_keep)]
    )
    new_kept_bounds = ck0[jnp.clip(kept_bounds, 0, mpa)].astype(jnp.int32)

    # total_pairs keeps its PRE-CULL meaning (overflow indicator vs
    # max_pairs, matching the fresh path); the pruned live count is the
    # sum of new_ranges[1]
    return BinningCache(
        ranges=new_ranges,
        gid=new_gid,
        slot=new_slot,
        total_pairs=total_pairs,
        kept_bounds=new_kept_bounds,
        compact_overflow=overflow,
    )


# Static crossover between the two fold strategies (rows = MPA). The XLA
# scatter-add costs ~16 ns/row at 230k rows growing to ~55 ns/row at 1.2M
# (superlinear); the sorted fold costs a near-constant ~6-10 ms dominated
# by the [P]-row kept_bounds gather + the 10-operand sort. Measured 2026-08
# on TPU v5e (benchmarks/microbench.py fold / fold_v4; bench.py KITTI +
# legacy_200k vs the 400k/800k converged points): scatter wins below ~0.4M
# rows, sorted wins 6.5x at 1.2M. The choice is static per jit signature.
#
# The default is a v5e-measured constant — on a DIFFERENT TPU generation
# re-derive it with `python benchmarks/fold_crossover.py` (measures both
# paths over an MPA grid and prints the crossover) and pin the result via
# the GSDF_FOLD_CROSSOVER env var, which overrides the default at import.
_SORTED_FOLD_MIN_ROWS = int(os.environ.get("GSDF_FOLD_CROSSOVER", 393216))


def _fold_pair_grads(pair_grads, gid, ranges3, kept_bounds, p,
                     min_rows=_SORTED_FOLD_MIN_ROWS):
    """Fold per-pair gradients [16, MPA] back to per-gaussian rows [P, 9].

    The reference folds with atomicAdd into per-gaussian buffers
    (backward.cu:546+) — order-nondeterministic on CUDA. The direct XLA
    analog, `zeros[P,16].at[gid].add(grads)`, is a row-loop scatter that
    costs ~65 ms at 1.2M pairs on v5e (docs/PERF.md r4) and scales with
    pair CAPACITY. This fold instead:

      1. builds lane validity from the group ranges (two [NG]-row scatters
         + one int cumsum — padding lanes carry garbage gid bits that must
         not shift segment boundaries),
      2. masks padding gids BIG and sorts (gid, g0..g8) — gid-contiguous,
      3. prefix-sums the sorted gradients and reads each gaussian's
         segment sum at the EXACT boundary positions the forward computed
         in expansion order (SortedPairs.kept_bounds) — no searchsorted,
         no scatter.

    10 ms at 1.2M pairs (benchmarks/microbench.py fold_v4). Precision:
    segment sums come out of an f32 prefix, so |err| <= ~2*eps*|prefix|
    (measured 3e-4 absolute on unit-scale grads at 1.2M pairs) — the same
    class as the reference's own run-to-run atomicAdd ordering jitter.
    Valid lanes whose gradients the kernels zeroed (early-terminated or
    behind the termination frontier) contribute exact zeros to their
    segment, so only PADDING lanes need masking.
    """
    mpa = pair_grads.shape[1]
    if mpa < min_rows:
        # small maps: the plain scatter-add is cheaper than this fold's
        # fixed costs (and XLA dead-code-eliminates the forward's unused
        # kept_bounds gather on this path)
        gidc = jnp.clip(gid, 0, p)
        acc = (
            jnp.zeros((p + 1, PACK), jnp.float32).at[gidc].add(pair_grads.T)
        )
        return acc[:p, :9]
    gstarts, gcounts = ranges3[0], ranges3[1]
    bnd = jnp.zeros((mpa + 1,), jnp.int32)
    bnd = bnd.at[gstarts + gcounts].add(1)
    bnd = bnd.at[gstarts].add(-1)
    lvl = jnp.cumsum(bnd[:mpa])
    masked = jnp.where(
        lvl == -1, jnp.clip(gid, 0, p - 1), jnp.int32(0x7FFFFF00)
    )
    rows = jax.lax.sort(
        (masked,) + tuple(pair_grads[i] for i in range(9)),
        num_keys=1,
        is_stable=False,
    )
    g = jnp.stack(rows[1:], axis=1)  # [MPA, 9] gid-contiguous
    cs = jnp.concatenate(
        [jnp.zeros((1, 9), jnp.float32), jnp.cumsum(g, axis=0)], axis=0
    )
    at = cs[jnp.clip(kept_bounds, 0, mpa)]  # [P, 9]
    return jnp.diff(at, axis=0, prepend=jnp.zeros((1, 9), jnp.float32))


@functools.lru_cache(maxsize=32)
def _make_cached_blend(
    grid_w: int, grid_h: int, chunk: int, group: int, mpa: int, p: int
):
    """Blend through a frozen BinningCache: ONE wide payload gather replaces
    the whole expand/cull/sort/realign pipeline. Gradients fold back to
    gaussian space by the cached gid — the same scatter-add the fresh path
    uses (backward.cu:546+ atomicAdd analog)."""
    num_tiles = grid_w * grid_h
    ng = (num_tiles + group - 1) // group

    def _to_tiles(accum, teff):
        acc = accum.transpose(0, 2, 1, 3).reshape(ng * group, PIX_PER_TILE, 3)
        te = teff.transpose(0, 2, 1).reshape(ng * group, PIX_PER_TILE)
        return acc[:num_tiles], te[:num_tiles]

    def _pack(gid, slot_f, valid, means2d, conics, opacities, colors):
        # Sanitize rows of gaussians not valid THIS step (frustum-culled or
        # opacity-decayed since the cache was built): their fresh payload can
        # be non-finite (behind-camera projection), and even a masked lane
        # turns NaN in the backward products. Zero opacity makes them blend
        # as nothing and gradient-free, exactly like the fresh path (where
        # they would have produced no pairs at all).
        ok = valid[:, None]
        tab = jnp.concatenate(
            [
                jnp.where(ok, means2d, 0.0),
                jnp.where(ok, conics, jnp.array([1.0, 0.0, 1.0])),
                jnp.where(valid, opacities, 0.0)[:, None],
                jnp.where(ok, colors, 0.0),
            ],
            axis=1,
        )  # [P, 9]
        tab = jnp.concatenate([tab, jnp.zeros((1, 9), jnp.float32)], axis=0)
        rows = tab[gid]  # [MPA, 9]: THE cached-step gather
        cols = jax.lax.optimization_barrier(rows.T)  # field-major [9, MPA]
        return jnp.concatenate(
            [cols, slot_f[None, :], jnp.zeros((PACK - 10, mpa), jnp.float32)],
            axis=0,
        )

    def _pipeline(ranges, gid, slot_f, valid, means2d, conics, opacities, colors):
        pairs = _pack(gid, slot_f, valid, means2d, conics, opacities, colors)
        accum, teff, traw, ndone = _run_fwd(ranges, pairs, ng, grid_w, chunk, group)
        return pairs, accum, teff, traw, ndone

    @jax.custom_vjp
    def blend(ranges, gid, slot_f, total, kept_bounds, valid, means2d, conics, opacities, colors):
        _, accum, teff, _, _ = _pipeline(
            ranges, gid, slot_f, valid, means2d, conics, opacities, colors
        )
        acc, te = _to_tiles(accum, teff)
        return acc, te, total

    def fwd(ranges, gid, slot_f, total, kept_bounds, valid, means2d, conics, opacities, colors):
        pairs, accum, teff, traw, ndone = _pipeline(
            ranges, gid, slot_f, valid, means2d, conics, opacities, colors
        )
        acc, te = _to_tiles(accum, teff)
        ranges3 = jnp.concatenate([ranges, ndone[:, 0, 0][None, :]], axis=0)
        return (acc, te, total), (ranges3, pairs, traw, gid, kept_bounds, valid)

    def bwd(res, cts):
        ranges3, pairs, traw, gid, kept_bounds, valid = res
        ct_accum_t, ct_teff_t, _ = cts
        pad = ng * group - num_tiles
        ct_acc = jnp.pad(ct_accum_t, ((0, pad), (0, 0), (0, 0)))
        ct_acc = ct_acc.reshape(ng, group, PIX_PER_TILE, 3).transpose(0, 2, 1, 3)
        ct_te = jnp.pad(ct_teff_t, ((0, pad), (0, 0)))
        ct_te = ct_te.reshape(ng, group, PIX_PER_TILE).transpose(0, 2, 1)
        pair_grads = _run_bwd(
            ranges3, pairs, traw, ct_acc, ct_te, mpa, ng, grid_w, chunk, group
        )
        acc = _fold_pair_grads(pair_grads, gid, ranges3, kept_bounds, p)
        # invalid-this-step rows got zero pair grads by construction; the
        # mask mirrors the fwd sanitization `where` VJP exactly.
        okm = valid[:, None]
        zi = np.zeros(gid.shape, dtype=jax.dtypes.float0)
        zk = np.zeros(kept_bounds.shape, dtype=jax.dtypes.float0)
        zb = np.zeros(valid.shape, dtype=jax.dtypes.float0)
        zt = np.zeros((), dtype=jax.dtypes.float0)
        return (
            jnp.zeros((2, ng), jnp.float32),
            zi,
            jnp.zeros((mpa,), jnp.float32),
            zt,
            zk,
            zb,
            jnp.where(okm, acc[:, 0:2], 0.0),
            jnp.where(okm, acc[:, 2:5], 0.0),
            jnp.where(valid, acc[:, 5], 0.0),
            jnp.where(okm, acc[:, 6:9], 0.0),
        )

    blend.defvjp(fwd, bwd)
    return blend


def blend_tiles_grouped_cached(
    pre,  # Preprocessed (fresh payload; rects unused)
    opacities: jnp.ndarray,
    cache: BinningCache,
    *,
    grid_w: int,
    grid_h: int,
    chunk: int = 128,
    group: int = 8,
):
    """Cached production path: identical outputs to the fresh path up to the
    cache's staleness (pair membership + depth order frozen at build)."""
    assert chunk % 128 == 0
    p = pre.means2d.shape[0]
    fn = _make_cached_blend(grid_w, grid_h, chunk, group, int(cache.gid.shape[0]), p)
    valid = pre.tiles_touched > 0
    return fn(
        cache.ranges,
        cache.gid,
        cache.slot,
        cache.total_pairs,
        cache.kept_bounds,
        jax.lax.stop_gradient(valid),
        pre.means2d,
        pre.conics,
        opacities,
        pre.colors,
    )


# ------------------------------------------------------------------ wrapper
@functools.lru_cache(maxsize=32)
def _make_fused_blend(
    grid_w: int, grid_h: int, chunk: int, group: int, max_pairs: int,
    export: bool = False, prune_margin: float | None = None,
    prune_factor: float = 0.0,
):
    """Fused grouped blend: binning + sort + realign + kernels + fold.

    The whole pair pipeline (ops/pallas_binning.sort_expand_pack) lives
    INSIDE the custom_vjp forward: the backward never differentiates
    through the sort/realign permutation — it folds the kernel's per-pair
    gradients straight back to Gaussian space by the pair's gid (carried
    through sort and realign as bitcast bits), exactly like the reference's
    atomicAdd into per-Gaussian buffers (backward.cu:546+).

    With ``export`` the blend additionally returns a BinningCache snapshot
    of the permutation it just built, for cross-step reuse — pruned to the
    live pairs when ``prune_margin`` is set (build_pruned_cache)."""
    from .pallas_binning import sort_expand_pack

    num_tiles = grid_w * grid_h
    ng = (num_tiles + group - 1) // group
    keep_margin = prune_margin if (export and prune_margin) else None

    def _to_tiles(accum, teff):
        # [NG, 256, G, ...] -> [NG*G, 256, ...] cropped to num_tiles
        acc = accum.transpose(0, 2, 1, 3).reshape(ng * group, PIX_PER_TILE, 3)
        te = teff.transpose(0, 2, 1).reshape(ng * group, PIX_PER_TILE)
        return acc[:num_tiles], te[:num_tiles]

    def _pipeline(depths, rect_min, rect_max, tiles_d, means2d, conics, opacities, colors):
        sp = sort_expand_pack(
            depths, rect_min, rect_max, tiles_d, means2d, conics, opacities, colors,
            grid_w=grid_w, grid_h=grid_h, max_pairs=max_pairs,
            chunk=chunk, group=group,
        )
        outs = _run_fwd(sp.ranges, sp.pairs, ng, grid_w, chunk, group,
                        keep_margin=keep_margin)
        accum, teff, traw, ndone = outs[:4]
        keep = outs[4] if keep_margin is not None else None
        return sp, accum, teff, traw, ndone, keep

    def _cache_of(sp, p, keep):
        gid = jnp.clip(jax.lax.bitcast_convert_type(sp.pairs[10], jnp.int32), 0, p)
        if keep is None:
            return BinningCache(
                ranges=sp.ranges, gid=gid, slot=sp.pairs[F_SLOT],
                total_pairs=sp.total_pairs, kept_bounds=sp.kept_bounds,
            )
        out_len = (
            compact_cache_len(max_pairs, ng, chunk, prune_factor)
            if prune_factor else None
        )
        return build_pruned_cache(
            sp.ranges, gid, sp.pairs[F_SLOT], sp.kept_bounds, keep,
            sp.total_pairs, chunk=chunk, p=p, out_len=out_len,
        )

    @jax.custom_vjp
    def blend(depths, rect_min, rect_max, tiles_d, means2d, conics, opacities, colors):
        sp, accum, teff, _, _, keep = _pipeline(
            depths, rect_min, rect_max, tiles_d, means2d, conics, opacities, colors
        )
        acc, te = _to_tiles(accum, teff)
        if export:
            return acc, te, sp.total_pairs, _cache_of(sp, depths.shape[0], keep)
        return acc, te, sp.total_pairs

    def fwd(depths, rect_min, rect_max, tiles_d, means2d, conics, opacities, colors):
        sp, accum, teff, traw, ndone, keep = _pipeline(
            depths, rect_min, rect_max, tiles_d, means2d, conics, opacities, colors
        )
        acc, te = _to_tiles(accum, teff)
        ranges3 = jnp.concatenate([sp.ranges, ndone[:, 0, 0][None, :]], axis=0)
        shapes = (depths.shape, rect_min.shape, tiles_d.shape)
        out = (acc, te, sp.total_pairs)
        if export:
            out = out + (_cache_of(sp, depths.shape[0], keep),)
        return out, (ranges3, sp.pairs, traw, sp.kept_bounds, depths.shape[0], shapes)

    def bwd(res, cts):
        ranges, pairs, traw, kept_bounds, p, shapes = res
        ct_accum_t, ct_teff_t = cts[0], cts[1]  # remaining cts symbolic-zero
        pad = ng * group - num_tiles
        ct_acc = jnp.pad(ct_accum_t, ((0, pad), (0, 0), (0, 0)))
        ct_acc = ct_acc.reshape(ng, group, PIX_PER_TILE, 3).transpose(0, 2, 1, 3)
        ct_te = jnp.pad(ct_teff_t, ((0, pad), (0, 0)))
        ct_te = ct_te.reshape(ng, group, PIX_PER_TILE).transpose(0, 2, 1)
        pair_grads = _run_bwd(
            ranges, pairs, traw, ct_acc, ct_te, pairs.shape[1], ng, grid_w, chunk, group
        )
        # gid rode along as bitcast bits in row 10 (garbage on padding
        # lanes — _fold_pair_grads masks those out by group ranges)
        gid = jax.lax.bitcast_convert_type(pairs[10], jnp.int32)
        acc = _fold_pair_grads(pair_grads, gid, ranges, kept_bounds, p)
        zd = jnp.zeros(shapes[0], jnp.float32)  # depth is f32 (non-diff key)
        zr = np.zeros(shapes[1], dtype=jax.dtypes.float0)
        zt = np.zeros(shapes[2], dtype=jax.dtypes.float0)
        return (zd, zr, zr, zt, acc[:, 0:2], acc[:, 2:5], acc[:, 5], acc[:, 6:9])

    blend.defvjp(fwd, bwd)
    return blend


def blend_tiles_grouped_fused(
    pre,  # Preprocessed (rects/depths/tiles used as non-diff binning keys)
    opacities: jnp.ndarray,
    *,
    grid_w: int,
    grid_h: int,
    max_pairs: int,
    chunk: int = 128,
    group: int = 8,
    export_cache: bool = False,
    prune_margin: float | None = None,
    prune_factor: float = 0.0,
):
    """Grouped production path: returns (accum [T,256,3], log_teff [T,256],
    total_pairs[, BinningCache]). Gradients flow to means2d/conics/
    opacities/colors. ``prune_margin`` (with export_cache) prunes the
    exported cache to live pairs only, and ``prune_factor`` additionally
    emits it at a reduced static capacity — see build_pruned_cache."""
    assert chunk % 128 == 0
    assert group in (1, 8, 16, 32), "group must be 1 or a multiple of 8 (block tiling)"
    fn = _make_fused_blend(grid_w, grid_h, chunk, group, max_pairs,
                           export_cache, prune_margin, prune_factor)
    return fn(
        jax.lax.stop_gradient(pre.depths),
        jax.lax.stop_gradient(pre.rect_min),
        jax.lax.stop_gradient(pre.rect_max),
        jax.lax.stop_gradient(pre.tiles_touched),
        pre.means2d,
        pre.conics,
        opacities,
        pre.colors,
    )
