"""Isolated timings of the grouped Pallas blend kernels on real TPU.

Splits the measured ~3.3 us/chunk (docs/PERF.md) into its components by
running the PRODUCTION kernels and stripped-down variants on the exact
bench-scene binning output:

  fwd / bwd          production kernels (ops/pallas_blend_grouped.py)
  fwd_floor          DMA + while_loop only (body reduced to one panel add)
  fwd_nomxu          full alpha math + exps, matmul results replaced by
                     cheap broadcasts (isolates MXU-issue share)
  fwd_novpu          matmuls kept, transcendentals replaced by arithmetic
                     (isolates the exp/log1p share)

Usage: python benchmarks/kernel_probe.py [name ...]

Methodology matches benchmarks/microbench.py: REPS chained reps inside one
jit, the kernel outputs folded back into the pair table at 1e-30 scale (no
value change in f32, full data dependence), wall closed by a host fetch.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench
from gsdf_slam_tpu.ops import CameraMatrices, RasterizeConfig
from gsdf_slam_tpu.ops.blend import PIX_PER_TILE
from gsdf_slam_tpu.ops.pallas_blend import PACK, _mm, _triu
from gsdf_slam_tpu.ops import pallas_blend_grouped as pbg
from gsdf_slam_tpu.ops.pallas_blend_grouped import (
    LOG_T_EPS,
    _chunk_geom,
    _onehot,
    _run_bwd,
    _run_fwd,
)
from gsdf_slam_tpu.ops.pallas_binning import sort_expand_pack
from gsdf_slam_tpu.ops.projection import preprocess, tile_grid

import os

REPS = int(os.environ.get("KPROBE_REPS", "20"))


def build_inputs():
    import os

    # GSDF_PROBE_N=400000 probes the converged-density scale point
    # (bench.py headline scene) instead of the legacy 200k scene
    n = int(os.environ.get("GSDF_PROBE_N", 0))
    if n:
        state, _ = bench.build_scene(n=n, converged=True)
        bench.MAX_PAIRS = bench.autosize_pairs(state)
    else:
        state, _ = bench.build_scene()
    fovx = 2 * np.arctan(bench.WIDTH / (2 * 600.0))
    fovy = 2 * np.arctan(bench.HEIGHT / (2 * 600.0))
    cam = CameraMatrices.from_pose(
        np.array([1.0, 0, 0, 0]), np.zeros(3), fovx, fovy
    )
    pre = preprocess(
        state.xyz,
        state.scaling_act(),
        state.rotation_act(),
        state.opacity_act()[:, 0],
        state.f_dc,
        state.f_rest,
        state.alive,
        cam,
        width=bench.WIDTH,
        height=bench.HEIGHT,
        sh_degree=3,
    )
    gw, gh = tile_grid(bench.WIDTH, bench.HEIGHT)
    opac = state.opacity_act()[:, 0]
    sp = sort_expand_pack(
        jax.lax.stop_gradient(pre.depths),
        jax.lax.stop_gradient(pre.rect_min),
        jax.lax.stop_gradient(pre.rect_max),
        jax.lax.stop_gradient(pre.tiles_touched),
        pre.means2d,
        pre.conics,
        opac,
        pre.colors,
        grid_w=gw,
        grid_h=gh,
        max_pairs=bench.MAX_PAIRS,
        chunk=128,
        group=8,
    )
    num_tiles = gw * gh
    ng = (num_tiles + 8 - 1) // 8
    print(
        f"scene: {int(sp.total_pairs)} pairs, grid {gw}x{gh} ({ng} groups), "
        f"pairs table {sp.pairs.shape}"
    )
    return sp.ranges, sp.pairs, ng, gw


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:34s} {dt:8.3f} ms/op")
    return dt


def chain_fwd(run, ranges, pairs, ng, gw, chunk=128, group=8):
    def step(i, p):
        accum, teff, traw, ndone = run(ranges, p, ng, gw, chunk, group)
        eps = (jnp.sum(accum) + jnp.sum(teff) + jnp.sum(traw)) * 1e-30
        return p + eps

    def full(p):
        p = jax.lax.fori_loop(0, REPS, step, p)
        return jnp.sum(p[0, :1])

    return full


def chain_bwd(run, ranges3, pairs, traw, ct_acc, ct_te, mpa, ng, gw,
              chunk=128, group=8):
    def step(i, p):
        grads = run(ranges3, p, traw, ct_acc, ct_te, mpa, ng, gw, chunk, group)
        return p + jnp.sum(grads) * 1e-30

    def full(p):
        p = jax.lax.fori_loop(0, REPS, step, p)
        return jnp.sum(p[0, :1])

    return full


# ------------------------------------------------- restructured candidates
def _prefix_strict(group):
    """P[r, c] = 1 iff r < c; (tot @ P)[:, g] = exclusive prefix over tiles."""
    r = jax.lax.broadcasted_iota(jnp.int32, (group, group), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (group, group), 1)
    return (r < c).astype(jnp.float32)


def _fwd_kernel_opt(ranges_ref, pairs_hbm, accum_ref, teff_ref, traw_ref,
                    ndone_ref, buf_ref, sem, *, grid_w, chunk, group):
    """Sorted-slot restructure: pairs within a chunk are ordered by tile
    slot (binning sorts by (tile, depth); chunks are windows of a group's
    sorted list), so the segmented inclusive cumsum equals the PLAIN
    cumsum minus the per-tile exclusive prefix of this chunk's totals:

      incl_j = cumsum_j - excl[tile_j]
      s_j    = carry[tile_j] + incl_j = cumsum_j + (carry - excl)[tile_j]

    which removes the [C,C] eq/useg construction and folds the carry map
    into one small [256,G]@[G,C] matmul; the five per-tile reductions
    stack into one [4*256,C]@[C,G] issue (the log_raw reduction doubles
    as the R1 totals)."""
    g_idx = pl.program_id(0)
    start = ranges_ref[0, g_idx]
    n = ranges_ref[1, g_idx]
    n_chunks = pl.cdiv(n, chunk)
    triu = _triu(chunk)
    pstrict = _prefix_strict(group)

    def _dma(c_idx, slot):
        off = pl.multiple_of(start + c_idx * chunk, chunk)
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(off, chunk)], buf_ref.at[slot], sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _prologue():
        _dma(0, 0).start()

    def cond(carry):
        c_idx, log_raw, _, _ = carry
        return jnp.logical_and(c_idx < n_chunks, jnp.max(log_raw) >= LOG_T_EPS)

    def body(carry):
        c_idx, log_raw, log_eff, acc = carry
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
        log1m = jnp.log1p(-alpha)
        tile_tot = _mm(log1m, oh, (((1,), (1,)),)[0])  # [256, G]
        excl = _mm(tile_tot, pstrict, (((1,), (0,)),)[0])  # [256, G]
        cums = _mm(log1m, triu, (((1,), (0,)),)[0])  # [256, C]
        adj = _mm(log_raw - excl, oh, (((1,), (0,)),)[0])  # [256, C]
        s = cums + adj  # == carry_cols + incl of the production kernel
        t_excl = jnp.exp(s - log1m)
        applied = (s >= LOG_T_EPS).astype(jnp.float32)
        w = alpha * t_excl * applied
        col = buf[6:9, :]
        x = jnp.concatenate(
            [w * col[0:1, :], w * col[1:2, :], w * col[2:3, :],
             log1m * applied],
            axis=0,
        )  # [4*256, C]
        r2 = _mm(x, oh, (((1,), (1,)),)[0])  # [4*256, G]
        pp = PIX_PER_TILE
        c0, c1, c2 = r2[0:pp], r2[pp:2 * pp], r2[2 * pp:3 * pp]
        acc = acc + jnp.concatenate(
            [c0[:, :, None], c1[:, :, None], c2[:, :, None]], axis=2
        )
        log_eff = log_eff + r2[3 * pp:4 * pp]
        log_raw = log_raw + tile_tot
        return c_idx + 1, log_raw, log_eff, acc

    init = (
        jnp.int32(0),
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group, 3), jnp.float32),
    )
    c_done, log_raw, log_eff, acc = jax.lax.while_loop(cond, body, init)

    @pl.when(c_done < n_chunks)
    def _drain():
        _dma(c_done, jax.lax.rem(c_done, 2)).wait()

    accum_ref[0] = acc
    teff_ref[0] = log_eff
    traw_ref[0] = log_raw
    ndone_ref[0] = jnp.full((1, 1), c_done, jnp.int32)


def _fwd_kernel_unroll2(ranges_ref, pairs_hbm, accum_ref, teff_ref, traw_ref,
                        ndone_ref, buf_ref, sem, *, grid_w, chunk, group):
    """Production math, two chunks per loop iteration, 4-slot DMA ring.

    Halves the loop-control + termination-cond scalar syncs and exposes two
    chunks' carry-independent work (geom, log1p, eq/useg, incl cumsum) to
    Mosaic's scheduler in one body; termination granularity coarsens to 2
    chunks (same math: skipped work is exactly the production early-out)."""
    g_idx = pl.program_id(0)
    start = ranges_ref[0, g_idx]
    n = ranges_ref[1, g_idx]
    n_chunks = pl.cdiv(n, chunk)
    mpa = pairs_hbm.shape[1]
    triu = _triu(chunk)

    def _dma(c_idx, slot):
        # clamp keeps the tail guard-free: an out-of-range chunk reads the
        # last in-bounds window and its lanes are dead by position masking
        off = pl.multiple_of(
            jnp.minimum(start + c_idx * chunk, mpa - chunk), chunk
        )
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(off, chunk)], buf_ref.at[slot], sem.at[slot]
        )

    for k in range(4):
        @pl.when(k < n_chunks)
        def _pro():
            _dma(k, k).start()

    def _apply(buf, c_idx, log_raw, log_eff, acc):
        alpha, _, _, _, _, slot = _chunk_geom(
            buf, g_idx, grid_w, group, c_idx * chunk, n
        )
        oh = _onehot(slot, group, chunk)
        eq = _mm(oh, oh, (((0,), (0,)),)[0])
        useg = triu * eq
        log1m = jnp.log1p(-alpha)
        incl = _mm(log1m, useg, (((1,), (0,)),)[0])
        carry_cols = _mm(log_raw, oh, (((1,), (0,)),)[0])
        t_excl = jnp.exp(carry_cols + (incl - log1m))
        applied = (carry_cols + incl >= LOG_T_EPS).astype(jnp.float32)
        w = alpha * t_excl * applied
        col = buf[6:9, :]
        adds = [
            _mm(w * col[ch:ch + 1, :], oh, (((1,), (1,)),)[0])[:, :, None]
            for ch in range(3)
        ]
        acc = acc + jnp.concatenate(adds, axis=2)
        log_raw = log_raw + _mm(log1m, oh, (((1,), (1,)),)[0])
        log_eff = log_eff + _mm(log1m * applied, oh, (((1,), (1,)),)[0])
        return log_raw, log_eff, acc

    def cond(carry):
        c_idx, log_raw, _, _ = carry
        return jnp.logical_and(c_idx < n_chunks, jnp.max(log_raw) >= LOG_T_EPS)

    def body(carry):
        c0, log_raw, log_eff, acc = carry
        c1 = c0 + 1
        s0 = jax.lax.rem(c0, 4)
        s1 = jax.lax.rem(c1, 4)

        _dma(c0, s0).wait()
        log_raw, log_eff, acc = _apply(buf_ref[s0], c0, log_raw, log_eff, acc)

        # slot s0 is free only now — refill it with chunk c0+4
        @pl.when(c0 + 4 < n_chunks)
        def _pf0():
            _dma(c0 + 4, s0).start()

        @pl.when(c1 < n_chunks)
        def _w1():
            _dma(c1, s1).wait()

        log_raw, log_eff, acc = _apply(buf_ref[s1], c1, log_raw, log_eff, acc)

        @pl.when(c1 + 4 < n_chunks)
        def _pf1():
            _dma(c1 + 4, s1).start()

        return c0 + 2, log_raw, log_eff, acc

    init = (
        jnp.int32(0),
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group, 3), jnp.float32),
    )
    c_done, log_raw, log_eff, acc = jax.lax.while_loop(cond, body, init)

    # in-flight but unconsumed: chunks [c_done, min(c_done+4, n_chunks))
    for k in range(4):
        @pl.when(c_done + k < jnp.minimum(c_done + 4, n_chunks))
        def _drain():
            _dma(c_done + k, jax.lax.rem(c_done + k, 4)).wait()

    accum_ref[0] = acc
    teff_ref[0] = log_eff
    traw_ref[0] = log_raw
    ndone_ref[0] = jnp.full((1, 1), jnp.minimum(c_done, n_chunks), jnp.int32)


def _fwd_kernel_noterm(ranges_ref, pairs_hbm, accum_ref, teff_ref, traw_ref,
                       ndone_ref, buf_ref, sem, *, grid_w, chunk, group):
    """Production math, fori_loop, no early-termination cond (isolates the
    per-chunk scalar-sync cost of `max(log_raw) >= eps`)."""
    g_idx = pl.program_id(0)
    start = ranges_ref[0, g_idx]
    n = ranges_ref[1, g_idx]
    n_chunks = pl.cdiv(n, chunk)
    triu = _triu(chunk)

    def _dma(c_idx, slot):
        off = pl.multiple_of(start + c_idx * chunk, chunk)
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(off, chunk)], buf_ref.at[slot], sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _prologue():
        _dma(0, 0).start()

    def body(c_idx, carry):
        log_raw, log_eff, acc = carry
        slot_i = jax.lax.rem(c_idx, 2)

        @pl.when(c_idx + 1 < n_chunks)
        def _prefetch():
            _dma(c_idx + 1, 1 - slot_i).start()

        _dma(c_idx, slot_i).wait()
        buf = buf_ref[slot_i]
        alpha, _, _, _, _, slot = _chunk_geom(
            buf, g_idx, grid_w, group, c_idx * chunk, n
        )
        oh = _onehot(slot, group, chunk)
        eq = _mm(oh, oh, (((0,), (0,)),)[0])
        useg = triu * eq
        log1m = jnp.log1p(-alpha)
        incl = _mm(log1m, useg, (((1,), (0,)),)[0])
        carry_cols = _mm(log_raw, oh, (((1,), (0,)),)[0])
        t_excl = jnp.exp(carry_cols + (incl - log1m))
        applied = (carry_cols + incl >= LOG_T_EPS).astype(jnp.float32)
        w = alpha * t_excl * applied
        col = buf[6:9, :]
        adds = [
            _mm(w * col[ch:ch + 1, :], oh, (((1,), (1,)),)[0])[:, :, None]
            for ch in range(3)
        ]
        acc = acc + jnp.concatenate(adds, axis=2)
        log_raw = log_raw + _mm(log1m, oh, (((1,), (1,)),)[0])
        log_eff = log_eff + _mm(log1m * applied, oh, (((1,), (1,)),)[0])
        return log_raw, log_eff, acc

    init = (
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group, 3), jnp.float32),
    )
    log_raw, log_eff, acc = jax.lax.fori_loop(0, n_chunks, body, init)
    accum_ref[0] = acc
    teff_ref[0] = log_eff
    traw_ref[0] = log_raw
    ndone_ref[0] = jnp.full((1, 1), n_chunks, jnp.int32)


def _bwd_kernel_opt(ranges_ref, pairs_hbm, traw_ref, ct_acc_ref, ct_teff_ref,
                    zeros_hbm, grads_hbm, done_ref, buf_ref, gbuf_ref, in_sem,
                    out_sem, *, grid_w, chunk, group):
    """Backward with the same sorted-slot restructure: suffix-in-segment
    becomes  sfx_j = (tot_wc + excl_wc + suffix)[tile_j] - cumsum_wc_j,
    and the four fixed per-group maps (3 ct channels + ct_eff) fuse with
    the per-chunk carry map into one [5*256+256, G]@[G, C] issue."""
    g_idx = pl.program_id(0)
    start = ranges_ref[0, g_idx]
    n = ranges_ref[1, g_idx]
    n_chunks = ranges_ref[2, g_idx]
    triu = _triu(chunk)
    pstrict = _prefix_strict(group)
    ct_acc = ct_acc_ref[0]  # [256, G, 3]
    ct_eff = ct_teff_ref[0]  # [256, G]
    pp = PIX_PER_TILE
    ctstack = jnp.concatenate(
        [ct_acc[:, :, 0], ct_acc[:, :, 1], ct_acc[:, :, 2], ct_eff], axis=0
    )  # [4*256, G], fixed per group

    def _off(i):
        return pl.multiple_of(start + (n_chunks - 1 - i) * chunk, chunk)

    def _in_dma(i, slot):
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(_off(i), chunk)], buf_ref.at[slot],
            in_sem.at[slot]
        )

    def _out_dma(i, slot):
        return pltpu.make_async_copy(
            gbuf_ref.at[slot], grads_hbm.at[:, pl.ds(_off(i), chunk)],
            out_sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _prologue():
        _in_dma(0, 0).start()

    def body(i, carry):
        c_idx = n_chunks - 1 - i
        slot_i = jax.lax.rem(i, 2)
        log_end, suffix = carry
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
        log1m = jnp.log1p(-alpha)
        tile_tot_l = _mm(log1m, oh, (((1,), (1,)),)[0])  # [256, G]
        log_start = log_end - tile_tot_l
        excl_l = _mm(tile_tot_l, pstrict, (((1,), (0,)),)[0])
        cums_l = _mm(log1m, triu, (((1,), (0,)),)[0])
        maps = _mm(
            jnp.concatenate([ctstack, log_start - excl_l], axis=0),
            oh, (((1,), (0,)),)[0],
        )  # [5*256, C]
        dot_c = (
            buf[6:7, :] * maps[0:pp]
            + buf[7:8, :] * maps[pp:2 * pp]
            + buf[8:9, :] * maps[2 * pp:3 * pp]
        )
        ct_eff_cols = maps[3 * pp:4 * pp]
        s = cums_l + maps[4 * pp:5 * pp]
        t_excl = jnp.exp(s - log1m)
        applied = jnp.where((s >= LOG_T_EPS) & (alpha > 0.0), 1.0, 0.0)
        w = alpha * t_excl * applied
        wc = w * dot_c
        tile_tot_wc = _mm(wc, oh, (((1,), (1,)),)[0])  # [256, G]
        excl_wc = _mm(tile_tot_wc, pstrict, (((1,), (0,)),)[0])
        cums_wc = _mm(wc, triu, (((1,), (0,)),)[0])
        sfx = _mm(
            tile_tot_wc + excl_wc + suffix, oh, (((1,), (0,)),)[0]
        ) - cums_wc

        inv1m = 1.0 / (1.0 - alpha)
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
            [
                jnp.sum(w * maps[ch * pp:(ch + 1) * pp], axis=0, keepdims=True)
                for ch in range(3)
            ],
            axis=0,
        )
        zeros7 = jnp.zeros((PACK - 9, chunk), jnp.float32)

        @pl.when(i >= 2)
        def _drain_prev():
            _out_dma(i - 2, slot_i).wait()

        gbuf_ref[slot_i] = jnp.concatenate(
            [d_mx, d_my, d_a, d_b, d_c, d_op, d_col, zeros7], axis=0
        )
        _out_dma(i, slot_i).start()
        return log_start, suffix + tile_tot_wc

    init = (traw_ref[0], ct_eff * 0.0)
    jax.lax.fori_loop(0, n_chunks, body, init)

    @pl.when(n_chunks > 1)
    def _drain_m2():
        _out_dma(n_chunks - 2, jax.lax.rem(n_chunks - 2, 2)).wait()

    @pl.when(n_chunks > 0)
    def _drain_m1():
        _out_dma(n_chunks - 1, jax.lax.rem(n_chunks - 1, 2)).wait()

    done_ref[0] = jnp.ones((1, 1), jnp.int32)


def run_bwd_variant(kernel, ranges, pairs, traw, ct_accum, ct_teff, mpa, ng,
                    grid_w, chunk, group):
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
        functools.partial(kernel, grid_w=grid_w, chunk=chunk, group=group),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((PACK, mpa), jnp.float32),
            jax.ShapeDtypeStruct((ng, 1, 1), jnp.int32),
        ],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() != "tpu",
    )(ranges, pairs, traw, ct_accum, ct_teff, zeros_grads)
    return grads


# ------------------------------------------------------- stripped variants
def _fwd_kernel_floor(ranges_ref, pairs_hbm, accum_ref, teff_ref, traw_ref,
                      ndone_ref, buf_ref, sem, *, grid_w, chunk, group):
    """DMA + loop scaffolding only: one panel add per chunk."""
    g_idx = pl.program_id(0)
    start = ranges_ref[0, g_idx]
    n = ranges_ref[1, g_idx]
    n_chunks = pl.cdiv(n, chunk)

    def _dma(c_idx, slot):
        off = pl.multiple_of(start + c_idx * chunk, chunk)
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(off, chunk)], buf_ref.at[slot], sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _prologue():
        _dma(0, 0).start()

    def body(c_idx, carry):
        log_raw, log_eff, acc = carry
        slot_i = jax.lax.rem(c_idx, 2)

        @pl.when(c_idx + 1 < n_chunks)
        def _prefetch():
            _dma(c_idx + 1, 1 - slot_i).start()

        _dma(c_idx, slot_i).wait()
        buf = buf_ref[slot_i]
        log_raw = log_raw + jnp.sum(buf[0:1, :]) * 1e-30
        return log_raw, log_eff, acc

    init = (
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group, 3), jnp.float32),
    )
    log_raw, log_eff, acc = jax.lax.fori_loop(0, n_chunks, body, init)
    accum_ref[0] = acc
    teff_ref[0] = log_raw
    traw_ref[0] = log_eff
    ndone_ref[0] = jnp.full((1, 1), n_chunks, jnp.int32)


def _fwd_kernel_variant(body_mode):
    """Production fwd kernel with selected stages stripped."""

    def kern(ranges_ref, pairs_hbm, accum_ref, teff_ref, traw_ref,
             ndone_ref, buf_ref, sem, *, grid_w, chunk, group):
        g_idx = pl.program_id(0)
        start = ranges_ref[0, g_idx]
        n = ranges_ref[1, g_idx]
        n_chunks = pl.cdiv(n, chunk)
        triu = _triu(chunk)

        def _dma(c_idx, slot):
            off = pl.multiple_of(start + c_idx * chunk, chunk)
            return pltpu.make_async_copy(
                pairs_hbm.at[:, pl.ds(off, chunk)], buf_ref.at[slot], sem.at[slot]
            )

        @pl.when(n_chunks > 0)
        def _prologue():
            _dma(0, 0).start()

        def cond(carry):
            c_idx, log_raw, _, _ = carry
            return jnp.logical_and(
                c_idx < n_chunks, jnp.max(log_raw) >= LOG_T_EPS
            )

        def body(carry):
            c_idx, log_raw, log_eff, acc = carry
            slot_i = jax.lax.rem(c_idx, 2)

            @pl.when(c_idx + 1 < n_chunks)
            def _prefetch():
                _dma(c_idx + 1, 1 - slot_i).start()

            _dma(c_idx, slot_i).wait()
            buf = buf_ref[slot_i]
            alpha, _, _, _, _, slot = _chunk_geom(
                buf, g_idx, grid_w, group, c_idx * chunk, n
            )
            if body_mode == "novpu":
                # transcendental-free stand-ins with the same panel shapes
                log1m = -alpha
            else:
                log1m = jnp.log1p(-alpha)
            if body_mode == "nomxu":
                incl = log1m * 0.5
                carry_cols = log1m * 0.25
            else:
                oh = _onehot(slot, group, chunk)
                eq = _mm(oh, oh, (((0,), (0,)),)[0])
                useg = triu * eq
                incl = _mm(log1m, useg, (((1,), (0,)),)[0])
                carry_cols = _mm(log_raw, oh, (((1,), (0,)),)[0])
            if body_mode == "novpu":
                t_excl = carry_cols + (incl - log1m)
            else:
                t_excl = jnp.exp(carry_cols + (incl - log1m))
            applied = (carry_cols + incl >= LOG_T_EPS).astype(jnp.float32)
            w = alpha * t_excl * applied
            col = buf[6:9, :]
            if body_mode == "nomxu":
                acc = acc + (jnp.sum(w * col[0:1, :], axis=1, keepdims=True)
                             )[:, :, None] * jnp.ones((1, group, 3))
                log_raw = log_raw + jnp.sum(log1m, axis=1, keepdims=True)
                log_eff = log_eff + jnp.sum(log1m * applied, axis=1,
                                            keepdims=True)
            else:
                adds = [
                    _mm(w * col[ch:ch + 1, :], oh, (((1,), (1,)),)[0])[:, :, None]
                    for ch in range(3)
                ]
                acc = acc + jnp.concatenate(adds, axis=2)
                log_raw = log_raw + _mm(log1m, oh, (((1,), (1,)),)[0])
                log_eff = log_eff + _mm(log1m * applied, oh, (((1,), (1,)),)[0])
            return c_idx + 1, log_raw, log_eff, acc

        init = (
            jnp.int32(0),
            jnp.zeros((PIX_PER_TILE, group), jnp.float32),
            jnp.zeros((PIX_PER_TILE, group), jnp.float32),
            jnp.zeros((PIX_PER_TILE, group, 3), jnp.float32),
        )
        c_done, log_raw, log_eff, acc = jax.lax.while_loop(cond, body, init)

        @pl.when(c_done < n_chunks)
        def _drain():
            _dma(c_done, jax.lax.rem(c_done, 2)).wait()

        accum_ref[0] = acc
        teff_ref[0] = log_eff
        traw_ref[0] = log_raw
        ndone_ref[0] = jnp.full((1, 1), c_done, jnp.int32)

    return kern


def run_fwd_variant(kernel, ranges, pairs, ng, grid_w, chunk, group, nbuf=2):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, PIX_PER_TILE, group, 3), lambda i, r: (i, 0, 0, 0)),
            pl.BlockSpec((1, PIX_PER_TILE, group), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, PIX_PER_TILE, group), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i, r: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((nbuf, PACK, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(kernel, grid_w=grid_w, chunk=chunk, group=group),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ng, PIX_PER_TILE, group, 3), jnp.float32),
            jax.ShapeDtypeStruct((ng, PIX_PER_TILE, group), jnp.float32),
            jax.ShapeDtypeStruct((ng, PIX_PER_TILE, group), jnp.float32),
            jax.ShapeDtypeStruct((ng, 1, 1), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(ranges, pairs)




def _fwd_kernel_roll(ranges_ref, pairs_hbm, accum_ref, teff_ref, traw_ref,
                     ndone_ref, buf_ref, sem, *, grid_w, chunk, group):
    """Roll-prefix restructure (r4): the 400k-scale probe shows the kernels
    MXU-dominated (fwd_nomxu 6.7 ms == floor 6.9 vs production 26.0) — the
    [256,C]@[C,C] segmented-cumsum matmul at HIGHEST (6 passes) is the cost.
    This variant deletes BOTH [C,C] operators:

      - plain inclusive cumsum over lanes via log2(C) masked pltpu.rolls
        (VPU, no MXU);
      - segmentation via the sorted-slot identity (pairs within a chunk are
        tile-sorted): incl_seg = cums - excl[tile], excl = strict prefix of
        per-tile totals (one [G,G] matmul);
      - the four per-tile reductions stay stacked as one [4*256,C]@[C,G].
    """
    g_idx = pl.program_id(0)
    start = ranges_ref[0, g_idx]
    n = ranges_ref[1, g_idx]
    n_chunks = pl.cdiv(n, chunk)
    pstrict = _prefix_strict(group)

    def _dma(c_idx, slot):
        off = pl.multiple_of(start + c_idx * chunk, chunk)
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(off, chunk)], buf_ref.at[slot], sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _prologue():
        _dma(0, 0).start()

    def cond(carry):
        c_idx, log_raw, _, _ = carry
        return jnp.logical_and(c_idx < n_chunks, jnp.max(log_raw) >= LOG_T_EPS)

    lane = jax.lax.broadcasted_iota(jnp.int32, (PIX_PER_TILE, chunk), 1)

    def body(carry):
        c_idx, log_raw, log_eff, acc = carry
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
        log1m = jnp.log1p(-alpha)  # [256, C]
        cums = log1m
        sh = 1
        while sh < chunk:
            cums = cums + jnp.where(
                lane >= sh, pltpu.roll(cums, sh, 1), 0.0
            )
            sh *= 2
        tile_tot = _mm(log1m, oh, (((1,), (1,)),)[0])  # [256, G]
        excl = _mm(tile_tot, pstrict, (((1,), (0,)),)[0])  # [256, G]
        adj = _mm(log_raw - excl, oh, (((1,), (0,)),)[0])  # [256, C]
        s = cums + adj  # == carry_cols + incl of the production kernel
        t_excl = jnp.exp(s - log1m)
        applied = (s >= LOG_T_EPS).astype(jnp.float32)
        w = alpha * t_excl * applied
        col = buf[6:9, :]
        x = jnp.concatenate(
            [w * col[0:1, :], w * col[1:2, :], w * col[2:3, :],
             log1m * applied],
            axis=0,
        )  # [4*256, C]
        r2 = _mm(x, oh, (((1,), (1,)),)[0])  # [4*256, G]
        pp = PIX_PER_TILE
        c0, c1, c2 = r2[0:pp], r2[pp:2 * pp], r2[2 * pp:3 * pp]
        acc = acc + jnp.concatenate(
            [c0[:, :, None], c1[:, :, None], c2[:, :, None]], axis=2
        )
        log_eff = log_eff + r2[3 * pp:4 * pp]
        log_raw = log_raw + tile_tot
        return c_idx + 1, log_raw, log_eff, acc

    init = (
        jnp.int32(0),
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group, 3), jnp.float32),
    )
    c_done, log_raw, log_eff, acc = jax.lax.while_loop(cond, body, init)

    @pl.when(c_done < n_chunks)
    def _drain():
        _dma(c_done, jax.lax.rem(c_done, 2)).wait()

    accum_ref[0] = acc
    teff_ref[0] = log_eff
    traw_ref[0] = log_raw
    ndone_ref[0] = jnp.full((1, 1), c_done, jnp.int32)


def _fwd_kernel_pair2(ranges_ref, pairs_hbm, accum_ref, teff_ref, traw_ref,
                      ndone_ref, buf_ref, sem, *, grid_w, chunk, group):
    """Cross-group interleave (r4 VERDICT item 3): each grid cell advances
    TWO independent tile-groups in lock step, with two disjoint carry sets
    and two DMA streams in ONE loop body. The production kernel's per-chunk
    dependency chain (log_raw -> termination test -> next chunk) is
    fundamental to front-to-back blending (the unroll2 negative, PERF.md);
    a second INDEPENDENT chain gives Mosaic's scheduler real parallel work
    to fill those stalls with.

    Lock-step semantics: the loop runs to max(n_chunks_A, n_chunks_B) or
    until both groups hit the termination test; a finished group's carry
    updates are masked out with selects (NOT pl.when — separate scf.if
    regions would serialize the chains again and defeat the interleave).
    Per-group early-termination EXITS are therefore coarser than
    production (a terminated group still burns lanes until its partner
    finishes); the measurement answers whether interleaving wins more
    than that imbalance loses."""
    h = pl.program_id(0)
    gA = 2 * h
    gB = 2 * h + 1
    startA = ranges_ref[0, gA]
    nA = ranges_ref[1, gA]
    startB = ranges_ref[0, gB]
    nB = ranges_ref[1, gB]
    ncA = pl.cdiv(nA, chunk)
    ncB = pl.cdiv(nB, chunk)
    nc = jnp.maximum(ncA, ncB)
    triu = _triu(chunk)

    def _dma(s, st, nchunks, c_idx, slot):
        # clamp the stream's chunk index into its own range: a finished
        # stream re-reads its last chunk (harmless bandwidth, masked math)
        c = jnp.clip(c_idx, 0, jnp.maximum(nchunks - 1, 0))
        off = pl.multiple_of(st + c * chunk, chunk)
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(off, chunk)], buf_ref.at[s, slot],
            sem.at[s, slot]
        )

    @pl.when(nc > 0)
    def _prologue():
        _dma(0, startA, ncA, 0, 0).start()
        _dma(1, startB, ncB, 0, 0).start()

    def cond(carry):
        c_idx, lrA, _, _, lrB, _, _ = carry
        liveA = jnp.logical_and(c_idx < ncA, jnp.max(lrA) >= LOG_T_EPS)
        liveB = jnp.logical_and(c_idx < ncB, jnp.max(lrB) >= LOG_T_EPS)
        return jnp.logical_or(liveA, liveB)

    def _half(buf, g_idx, c_idx, n, log_raw, log_eff, acc):
        alpha, _, _, _, _, slot = _chunk_geom(
            buf, g_idx, grid_w, group, c_idx * chunk, n
        )
        oh = _onehot(slot, group, chunk)
        eq = _mm(oh, oh, (((0,), (0,)),)[0])
        useg = triu * eq
        log1m = jnp.log1p(-alpha)
        incl = _mm(log1m, useg, (((1,), (0,)),)[0])
        carry_cols = _mm(log_raw, oh, (((1,), (0,)),)[0])
        t_excl = jnp.exp(carry_cols + (incl - log1m))
        applied = (carry_cols + incl >= LOG_T_EPS).astype(jnp.float32)
        w = alpha * t_excl * applied
        col = buf[6:9, :]
        adds = [
            _mm(w * col[ch:ch + 1, :], oh, (((1,), (1,)),)[0])[:, :, None]
            for ch in range(3)
        ]
        return (
            log_raw + _mm(log1m, oh, (((1,), (1,)),)[0]),
            log_eff + _mm(log1m * applied, oh, (((1,), (1,)),)[0]),
            acc + jnp.concatenate(adds, axis=2),
        )

    def body(carry):
        c_idx, lrA, leA, accA, lrB, leB, accB = carry
        slot_i = jax.lax.rem(c_idx, 2)

        @pl.when(c_idx + 1 < nc)
        def _prefetch():
            _dma(0, startA, ncA, c_idx + 1, 1 - slot_i).start()
            _dma(1, startB, ncB, c_idx + 1, 1 - slot_i).start()

        _dma(0, startA, ncA, c_idx, slot_i).wait()
        _dma(1, startB, ncB, c_idx, slot_i).wait()
        liveA = jnp.logical_and(c_idx < ncA, jnp.max(lrA) >= LOG_T_EPS)
        liveB = jnp.logical_and(c_idx < ncB, jnp.max(lrB) >= LOG_T_EPS)
        nlrA, nleA, naccA = _half(
            buf_ref[0, slot_i], gA, c_idx, nA, lrA, leA, accA
        )
        nlrB, nleB, naccB = _half(
            buf_ref[1, slot_i], gB, c_idx, nB, lrB, leB, accB
        )
        sel = lambda live, new, old: jnp.where(live, new, old)
        return (
            c_idx + 1,
            sel(liveA, nlrA, lrA), sel(liveA, nleA, leA),
            sel(liveA, naccA, accA),
            sel(liveB, nlrB, lrB), sel(liveB, nleB, leB),
            sel(liveB, naccB, accB),
        )

    z2 = jnp.zeros((PIX_PER_TILE, group), jnp.float32)
    z3 = jnp.zeros((PIX_PER_TILE, group, 3), jnp.float32)
    init = (jnp.int32(0), z2, z2, z3, z2, z2, z3)
    c_done, lrA, leA, accA, lrB, leB, accB = jax.lax.while_loop(
        cond, body, init
    )

    @pl.when(c_done < nc)
    def _drain():
        s = jax.lax.rem(c_done, 2)
        _dma(0, startA, ncA, c_done, s).wait()
        _dma(1, startB, ncB, c_done, s).wait()

    accum_ref[0] = accA
    accum_ref[1] = accB
    teff_ref[0] = leA
    teff_ref[1] = leB
    traw_ref[0] = lrA
    traw_ref[1] = lrB
    ndone_ref[0] = jnp.full((1, 1), c_done, jnp.int32)
    ndone_ref[1] = jnp.full((1, 1), c_done, jnp.int32)


def run_fwd_pair2(ranges, pairs, ng, grid_w, chunk, group):
    assert ng % 2 == 0, "pair2 probe assumes an even group count"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng // 2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((2, PIX_PER_TILE, group, 3), lambda i, r: (i, 0, 0, 0)),
            pl.BlockSpec((2, PIX_PER_TILE, group), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((2, PIX_PER_TILE, group), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((2, 1, 1), lambda i, r: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, PACK, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_pair2, grid_w=grid_w, chunk=chunk, group=group
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ng, PIX_PER_TILE, group, 3), jnp.float32),
            jax.ShapeDtypeStruct((ng, PIX_PER_TILE, group), jnp.float32),
            jax.ShapeDtypeStruct((ng, PIX_PER_TILE, group), jnp.float32),
            jax.ShapeDtypeStruct((ng, 1, 1), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(ranges, pairs)





def main(names):
    ranges, pairs, ng, gw = build_inputs()
    mpa = pairs.shape[1]
    want = lambda n: not names or n in names

    results = {}
    if want("null"):
        def chain_null(p):
            def step(i, p):
                return p + jnp.sum(p[0, :1]) * 1e-30
            p = jax.lax.fori_loop(0, REPS, step, p)
            return jnp.sum(p[0, :1])

        results["null"] = timed("null (chain+fetch overhead)", chain_null, pairs)
    if want("fwd"):
        results["fwd"] = timed(
            "fwd (production)", chain_fwd(_run_fwd, ranges, pairs, ng, gw), pairs
        )
    if want("fwd_pair2"):
        # parity first: outputs must match production bit-near (identical
        # math per group; only loop scheduling differs)
        a0, t0_, r0, _ = jax.jit(lambda r, p: _run_fwd(r, p, ng, gw, 128, 8))(ranges, pairs)
        a1, t1_, r1, _ = jax.jit(lambda r, p: run_fwd_pair2(r, p, ng, gw, 128, 8))(ranges, pairs)
        d = max(float(jnp.max(jnp.abs(a0 - a1))), float(jnp.max(jnp.abs(t0_ - t1_))))
        print(f"  pair2 parity: max|d| = {d:.3e}")
        results["fwd_pair2"] = timed(
            "fwd_pair2 (2-group interleave)",
            chain_fwd(run_fwd_pair2, ranges, pairs, ng, gw), pairs,
        )
    if want("fwd_floor"):
        results["fwd_floor"] = timed(
            "fwd_floor (DMA+loop only)",
            chain_fwd(
                functools.partial(run_fwd_variant, _fwd_kernel_floor),
                ranges, pairs, ng, gw,
            ),
            pairs,
        )
    if want("fwd_nomxu"):
        results["fwd_nomxu"] = timed(
            "fwd_nomxu (no matmuls)",
            chain_fwd(
                functools.partial(run_fwd_variant, _fwd_kernel_variant("nomxu")),
                ranges, pairs, ng, gw,
            ),
            pairs,
        )
    if want("fwd_novpu"):
        results["fwd_novpu"] = timed(
            "fwd_novpu (no transcendentals)",
            chain_fwd(
                functools.partial(run_fwd_variant, _fwd_kernel_variant("novpu")),
                ranges, pairs, ng, gw,
            ),
            pairs,
        )
    if want("fwd_opt"):
        run_opt = functools.partial(run_fwd_variant, _fwd_kernel_opt)
        # parity vs production first
        ref = jax.jit(
            functools.partial(_run_fwd, ng=ng, grid_w=gw, chunk=128, group=8)
        )(ranges, pairs)
        got = jax.jit(
            functools.partial(run_opt, ng=ng, grid_w=gw, chunk=128, group=8)
        )(ranges, pairs)
        for nm, r, g in zip(("accum", "teff", "traw", "ndone"), ref, got):
            d = float(jnp.max(jnp.abs(r.astype(jnp.float32) - g.astype(jnp.float32))))
            print(f"  fwd_opt parity {nm}: max|d| = {d:.3e}")
        results["fwd_opt"] = timed(
            "fwd_opt (sorted-slot restructure)",
            chain_fwd(run_opt, ranges, pairs, ng, gw),
            pairs,
        )
    if want("fwd_mixed"):
        # Halved MXU passes: every production matmul has a 0/1 one-hot/triu
        # operand that is EXACT in one bf16 term; only the f32 data operand
        # needs the 3-way bf16 split (8+8+8 mantissa bits covers f32's 24).
        # Mosaic rejects per-operand dot precision
        # (`NotImplementedError: Per-operand dot precision unsupported`,
        # lowering.py:2245), so the split is done by hand: 3 DEFAULT-precision
        # bf16 passes with f32 accumulation vs HIGHEST's 6.

        orig = pbg._mm

        def _mm_mixed(a, b, dims):
            bh = b.astype(jnp.bfloat16)
            a_hi = a.astype(jnp.bfloat16)
            r1 = a - a_hi.astype(jnp.float32)
            a_mid = r1.astype(jnp.bfloat16)
            a_lo = (r1 - a_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (dims, ((), ()))
            out = None
            for ap in (a_lo, a_mid, a_hi):  # small terms first
                t = jax.lax.dot_general(
                    ap, bh, dn, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                out = t if out is None else out + t
            return out

        try:
            pbg._mm = _mm_mixed
            ref = jax.jit(
                functools.partial(_run_fwd, ng=ng, grid_w=gw, chunk=128, group=8)
            )(ranges, pairs)
            pbg._mm = orig
            base = jax.jit(
                functools.partial(_run_fwd, ng=ng, grid_w=gw, chunk=128, group=8)
            )(ranges, pairs)
            for nm, r, g in zip(("accum", "teff", "traw", "ndone"), base, ref):
                d = float(jnp.max(jnp.abs(r.astype(jnp.float32) - g.astype(jnp.float32))))
                print(f"  fwd_mixed parity {nm}: max|d| = {d:.3e}")
            pbg._mm = _mm_mixed
            results["fwd_mixed"] = timed(
                "fwd_mixed (per-operand precision 3x/1x)",
                chain_fwd(_run_fwd, ranges, pairs, ng, gw), pairs,
            )
            accum, teff, traw, ndone = jax.jit(
                functools.partial(_run_fwd, ng=ng, grid_w=gw, chunk=128, group=8)
            )(ranges, pairs)
            ranges3 = jnp.concatenate([ranges, ndone[:, 0, 0][None, :]], axis=0)
            rng = np.random.default_rng(0)
            ct_acc = jnp.asarray(
                rng.standard_normal(accum.shape).astype(np.float32)
            )
            ct_te = jnp.asarray(rng.standard_normal(teff.shape).astype(np.float32))
            results["bwd_mixed"] = timed(
                "bwd_mixed (per-operand precision 3x/1x)",
                chain_bwd(_run_bwd, ranges3, pairs, traw, ct_acc, ct_te, mpa, ng, gw),
                pairs,
            )
        finally:
            pbg._mm = orig
    if want("fwd_high"):
        # Uniform Precision.HIGH (native bf16x3, 3 MXU passes vs HIGHEST's
        # 6). An earlier 200k-scale measurement found HIGH == HIGHEST speed
        # (pallas_blend._mm docstring), but that predates the 400k probe
        # showing the kernels MXU-dominated — re-measure at scale. Exactness:
        # the 0/1 one-hot/triu operand is exact in ONE bf16 term, so the
        # 3-term split of the data operand reproduces the f32 product
        # exactly up to accumulation order.
        def _mm_high(a, b, dims):
            return jax.lax.dot_general(
                a, b, (dims, ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGH,
            )

        orig = pbg._mm
        try:
            pbg._mm = _mm_high
            ref = jax.jit(
                functools.partial(_run_fwd, ng=ng, grid_w=gw, chunk=128, group=8)
            )(ranges, pairs)
            pbg._mm = orig
            base = jax.jit(
                functools.partial(_run_fwd, ng=ng, grid_w=gw, chunk=128, group=8)
            )(ranges, pairs)
            for nm, r, g in zip(("accum", "teff", "traw", "ndone"), base, ref):
                d = float(jnp.max(jnp.abs(r.astype(jnp.float32) - g.astype(jnp.float32))))
                print(f"  fwd_high parity {nm}: max|d| = {d:.3e}")
            pbg._mm = _mm_high
            results["fwd_high"] = timed(
                "fwd_high (Precision.HIGH bf16x3)",
                chain_fwd(_run_fwd, ranges, pairs, ng, gw), pairs,
            )
            accum, teff, traw, ndone = jax.jit(
                functools.partial(_run_fwd, ng=ng, grid_w=gw, chunk=128, group=8)
            )(ranges, pairs)
            ranges3 = jnp.concatenate([ranges, ndone[:, 0, 0][None, :]], axis=0)
            rng = np.random.default_rng(0)
            ct_acc = jnp.asarray(
                rng.standard_normal(accum.shape).astype(np.float32)
            )
            ct_te = jnp.asarray(rng.standard_normal(teff.shape).astype(np.float32))
            results["bwd_high"] = timed(
                "bwd_high (Precision.HIGH bf16x3)",
                chain_bwd(_run_bwd, ranges3, pairs, traw, ct_acc, ct_te, mpa, ng, gw),
                pairs,
            )
        finally:
            pbg._mm = orig
    if want("fwd_roll"):
        run_roll = functools.partial(run_fwd_variant, _fwd_kernel_roll)
        ref = jax.jit(
            functools.partial(_run_fwd, ng=ng, grid_w=gw, chunk=128, group=8)
        )(ranges, pairs)
        got = jax.jit(
            functools.partial(run_roll, ng=ng, grid_w=gw, chunk=128, group=8)
        )(ranges, pairs)
        for nm, r, g in zip(("accum", "teff", "traw", "ndone"), ref, got):
            d = float(jnp.max(jnp.abs(r.astype(jnp.float32) - g.astype(jnp.float32))))
            print(f"  fwd_roll parity {nm}: max|d| = {d:.3e}")
        results["fwd_roll"] = timed(
            "fwd_roll (roll-prefix, no [C,C] matmuls)",
            chain_fwd(run_roll, ranges, pairs, ng, gw),
            pairs,
        )
    if want("fwd_unroll2"):
        run_u2 = functools.partial(run_fwd_variant, _fwd_kernel_unroll2)

        def run_u2b(ranges, pairs, ng, grid_w, chunk, group):
            return run_u2(ranges, pairs, ng, grid_w, chunk, group, nbuf=4)

        ref = jax.jit(
            functools.partial(_run_fwd, ng=ng, grid_w=gw, chunk=128, group=8)
        )(ranges, pairs)
        got = jax.jit(
            functools.partial(run_u2b, ng=ng, grid_w=gw, chunk=128, group=8)
        )(ranges, pairs)
        for nm, r, g in zip(("accum", "teff", "traw"), ref, got):
            d = float(jnp.max(jnp.abs(r - g)))
            print(f"  fwd_unroll2 parity {nm}: max|d| = {d:.3e}")
        results["fwd_unroll2"] = timed(
            "fwd_unroll2 (2 chunks/iter)",
            chain_fwd(run_u2b, ranges, pairs, ng, gw),
            pairs,
        )
    if want("fwd_noterm"):
        results["fwd_noterm"] = timed(
            "fwd_noterm (fori, no cond)",
            chain_fwd(
                functools.partial(run_fwd_variant, _fwd_kernel_noterm),
                ranges, pairs, ng, gw,
            ),
            pairs,
        )
    if want("bwd") or want("bwd_opt"):
        # realistic residuals for the backward
        accum, teff, traw, ndone = jax.jit(
            functools.partial(_run_fwd, ng=ng, grid_w=gw, chunk=128, group=8)
        )(ranges, pairs)
        ranges3 = jnp.concatenate([ranges, ndone[:, 0, 0][None, :]], axis=0)
        rng = np.random.default_rng(0)
        ct_acc = jnp.asarray(
            rng.standard_normal(accum.shape).astype(np.float32)
        )
        ct_te = jnp.asarray(rng.standard_normal(teff.shape).astype(np.float32))
        if want("bwd"):
            results["bwd"] = timed(
                "bwd (production)",
                chain_bwd(_run_bwd, ranges3, pairs, traw, ct_acc, ct_te, mpa, ng, gw),
                pairs,
            )
        if want("bwd_opt"):
            run_bopt = functools.partial(run_bwd_variant, _bwd_kernel_opt)
            ref = jax.jit(
                functools.partial(_run_bwd, mpa=mpa, ng=ng, grid_w=gw, chunk=128, group=8)
            )(ranges3, pairs, traw, ct_acc, ct_te)
            got = jax.jit(
                functools.partial(run_bopt, mpa=mpa, ng=ng, grid_w=gw, chunk=128, group=8)
            )(ranges3, pairs, traw, ct_acc, ct_te)
            d = jnp.max(jnp.abs(ref - got), axis=1)
            rel = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-30))
            print(f"  bwd_opt parity: max|d| per field = "
                  f"{[f'{float(x):.2e}' for x in d[:9]]}, rel {rel:.3e}")
            results["bwd_opt"] = timed(
                "bwd_opt (sorted-slot restructure)",
                chain_bwd(run_bopt, ranges3, pairs, traw, ct_acc, ct_te, mpa, ng, gw),
                pairs,
            )
    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main(sys.argv[1:])
