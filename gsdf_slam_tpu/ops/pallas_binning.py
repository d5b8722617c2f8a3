"""Fused TPU binning: one gather, payload-through-sort, DMA realignment.

Replaces the round-1 three-pass layout (expand -> sort ids -> scatter ids ->
re-gather payload by pair id) for the grouped Pallas blend path. The CUDA
reference sorts only (key, gaussian-id) pairs and lets its kernels random-
access per-Gaussian data from L2 (rasterizer_impl.cu:474-500, forward.cu:
384-400); TPUs have no fast random access, so every per-pair table trip is
a row-loop-bound XLA gather/scatter (~12 ns/row). This module keeps exactly
ONE wide gather:

  1. pack ALL per-Gaussian fields (binning rect/start + blend payload) into
     one [P, 16] table; expand to buffer-ordered pair rows with a single
     row-gather by the monotone rank;
  2. sort ONCE with the blend payload as extra sort operands — measured on
     v5e, a 12-operand 2-key sort costs barely more than the 3-operand one
     and deletes the post-sort payload re-gather entirely;
  3. re-lay the sorted rows into the group-aligned layout the kernels DMA
     ([16, MPA], every group starting on a chunk boundary) with a Pallas
     HBM->HBM roll-copy kernel: contiguous DMA at memory bandwidth instead
     of a row-loop scatter (the wide-scatter alternative measures 7x worse
     than even the narrow one).

Group-tail padding slots now hold NEIGHBOR pairs' data rather than a zero
sentinel row, so the blend kernels mask by the true per-group pair count
(pallas_blend_grouped.py applies `pos < count`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import _tile_opacity_keep

# table / sorted-row field indices (int fields travel as bitcast f32)
TB_RMX, TB_RMY, TB_RW, TB_GID, TB_START = range(5)
TB_MX, TB_MY, TB_CA, TB_CB, TB_CC, TB_OP, TB_DEPTH, TB_R, TB_G, TB_B = range(5, 15)

PACK = 16  # rows of the packed pair array (matches pallas_blend.PACK)


class SortedPairs(NamedTuple):
    """Group-aligned packed pairs ready for the grouped blend kernels."""

    ranges: jnp.ndarray  # [2, ng] int32: chunk-aligned group starts; counts
    pairs: jnp.ndarray  # [16, MPA] f32: rows 0-8 blend fields, 9 slot, 10 gid bits
    total_pairs: jnp.ndarray  # [] int32 true pair count (overflow indicator)
    # [P] int32 EXCLUSIVE prefix of kept (post-cull) pair counts by gid:
    # kept_bounds[g] = number of kept pairs with gid <= g. Exact int math;
    # the backward's sorted gradient fold reads its segment boundaries here
    # instead of a searchsorted (docs/PERF.md r4 fold-v4).
    kept_bounds: jnp.ndarray


def _as_f(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x.astype(jnp.int32), jnp.float32)


def _as_i(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


# chunks moved per realign DMA window: the kernel is DMA-LATENCY-bound
# (one 8 KB in + one 8 KB out per chunk is ~0.2 ms of bandwidth but ~5 ms
# of serialized latency at 400k scale), so move W chunks per window and
# double-buffer the in/out streams. A window may overhang its group's
# aligned region by up to (W-1)*chunk lanes — harmless: groups execute in
# grid order on one core, so the NEXT group rewrites every byte of its own
# region afterwards, and only the LAST group needs tail slack in mpa.
REALIGN_W = 4


def mpa_for(max_pairs: int, ng: int, chunk: int) -> int:
    """Padded length of the [16, MPA] pair array sort_expand_pack emits.

    max_pairs data lanes + per-group chunk-alignment slack (ng * chunk) +
    the last group's realign-window read overhang ((W-1) * chunk). The
    SINGLE source of truth — the mapper's abstract BinningCache skeleton
    (engine/mapper.py) must produce exactly this shape or its AOT-prewarmed
    executables never hit the cache."""
    return max_pairs + ng * chunk + (REALIGN_W - 1) * chunk


def _realign_kernel(tbl_ref, src_hbm, dst_hbm, buf_ref, obuf_ref, sem_in, sem_out,
                    *, chunk):
    """Copy each group's contiguous sorted run to its chunk-aligned start.

    Source offsets are arbitrary, and TPU DMA lane slices must be 128-
    aligned — so each window reads a [16, W*chunk+128] block from the
    aligned floor and rotates the misalignment away (pltpu.roll is a
    bitwise lane shuffle, safe for the bitcast int rows). In/out DMA
    streams are double-buffered across windows: window w+1 streams in and
    window w-1 drains out while window w rotates."""
    g = pl.program_id(0)
    gfs = tbl_ref[0, g]  # first sorted slot of the group (arbitrary)
    dst0 = tbl_ref[1, g]  # chunk-aligned destination start
    nch = tbl_ref[2, g]  # ceil(count / chunk) chunks to move
    nwin = (nch + REALIGN_W - 1) // REALIGN_W
    wlanes = REALIGN_W * chunk
    base = gfs // 128 * 128
    shift = gfs - base

    def _in_dma(w, slot):
        src = pl.multiple_of(base + w * wlanes, 128)
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(src, wlanes + 128)], buf_ref.at[slot],
            sem_in.at[slot],
        )

    def _out_dma(w, slot):
        dst = pl.multiple_of(dst0 + w * wlanes, chunk)
        return pltpu.make_async_copy(
            obuf_ref.at[slot], dst_hbm.at[:, pl.ds(dst, wlanes)],
            sem_out.at[slot],
        )

    @pl.when(nwin > 0)
    def _prologue():
        _in_dma(0, 0).start()

    def body(w, _):
        slot = jax.lax.rem(w, 2)

        @pl.when(w + 1 < nwin)
        def _prefetch():
            _in_dma(w + 1, 1 - slot).start()

        _in_dma(w, slot).wait()

        # the write two windows back reused this obuf slot — drain it
        @pl.when(w >= 2)
        def _drain_prev():
            _out_dma(w - 2, slot).wait()

        obuf_ref[slot] = pltpu.roll(buf_ref[slot], -shift, 1)[:, :wlanes]
        _out_dma(w, slot).start()
        return 0

    jax.lax.fori_loop(0, nwin, body, 0, unroll=False)

    @pl.when(nwin > 1)
    def _drain_m2():
        _out_dma(nwin - 2, jax.lax.rem(nwin - 2, 2)).wait()

    @pl.when(nwin > 0)
    def _drain_m1():
        _out_dma(nwin - 1, jax.lax.rem(nwin - 1, 2)).wait()


@functools.lru_cache(maxsize=32)
def _make_realign(ng: int, src_lanes: int, mpa: int, chunk: int):
    # interpret mode keeps the fused path testable off-TPU (CPU suite /
    # multichip dryrun); Mosaic compiles it natively on the chip.
    interpret = jax.default_backend() != "tpu"
    wlanes = REALIGN_W * chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, PACK, wlanes + 128), jnp.float32),
            pltpu.VMEM((2, PACK, wlanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_realign_kernel, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((PACK, mpa), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


def sort_expand_pack(
    depths: jnp.ndarray,
    rect_min: jnp.ndarray,
    rect_max: jnp.ndarray,
    tiles_touched: jnp.ndarray,
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    *,
    grid_w: int,
    grid_h: int,
    max_pairs: int,
    chunk: int,
    group: int,
) -> SortedPairs:
    """Expand, cull, sort (payload-carrying), and group-align in one pass.

    Binning semantics are identical to ops/binning.bin_gaussians (same
    expansion order, same per-tile opacity cull, same stable (tile, depth)
    order); only the data movement differs.
    """
    p = depths.shape[0]
    num_tiles = grid_w * grid_h
    ng = (num_tiles + group - 1) // group
    mp = max_pairs

    tiles_d = tiles_touched
    starts = jnp.cumsum(tiles_d) - tiles_d
    table = jnp.concatenate(
        [
            _as_f(rect_min),  # 0, 1
            _as_f((rect_max[:, 0] - rect_min[:, 0])[:, None]),  # 2
            _as_f(jnp.arange(p, dtype=jnp.int32)[:, None]),  # 3 gid
            _as_f(starts[:, None]),  # 4
            means2d,  # 5, 6
            conics,  # 7, 8, 9
            opacities[:, None],  # 10
            depths[:, None],  # 11
            colors,  # 12, 13, 14
            jnp.zeros((p, 1), jnp.float32),  # 15
        ],
        axis=1,
    )
    total = jnp.sum(tiles_d)
    scatter_pos = jnp.where(tiles_d > 0, starts, mp)
    seg = jnp.zeros((mp,), jnp.int32)
    seg = seg.at[scatter_pos].max(jnp.arange(1, p + 1, dtype=jnp.int32), mode="drop")
    rank = jnp.maximum(jax.lax.cummax(seg) - 1, 0)

    rows = table[rank]  # THE one wide gather of the whole pipeline
    # One transpose to field-major [16, MP]: every later per-field read is
    # then a contiguous row slice. Column slices of the row-major [MP, 16]
    # each cost a full row loop (~14 ns/row, docs/PERF.md), and there are
    # ~12 of them below. The barrier stops XLA from fusing the transpose
    # back into the consumers (which would re-materialize the row loops).
    cols = jax.lax.optimization_barrier(rows.T)  # [16, MP]
    slot = jnp.arange(mp, dtype=jnp.int32)
    local = slot - _as_i(cols[TB_START])
    rw = jnp.maximum(_as_i(cols[TB_RW]), 1)
    tx = _as_i(cols[TB_RMX]) + local % rw
    ty = _as_i(cols[TB_RMY]) + local // rw
    keep = _tile_opacity_keep(
        cols[TB_MX], cols[TB_MY],
        cols[TB_CA], cols[TB_CB], cols[TB_CC],
        cols[TB_OP], tx, ty,
    )
    pair_valid = (slot < total) & keep
    tile_id = jnp.where(pair_valid, ty * grid_w + tx, num_tiles).astype(jnp.int32)

    # Per-gaussian kept-pair boundaries, computed where they are FREE: in
    # expansion order the pairs of gaussian g occupy slots
    # [starts[g], starts[g] + tiles_touched[g]), so the cumulative count of
    # kept pairs with gid <= g is one int-cumsum + one [P]-row gather —
    # exact, no scatter, no search. The backward fold sorts pair gradients
    # by gid and reads segment sums at exactly these positions.
    kint = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(pair_valid.astype(jnp.int32))]
    )
    kept_bounds = kint[jnp.clip(jnp.cumsum(tiles_d), 0, mp)]

    sorted_ops = jax.lax.sort(
        (
            tile_id,
            cols[TB_DEPTH],
            cols[TB_MX],
            cols[TB_MY],
            cols[TB_CA],
            cols[TB_CB],
            cols[TB_CC],
            cols[TB_OP],
            cols[TB_R],
            cols[TB_G],
            cols[TB_B],
            _as_i(cols[TB_GID]),
        ),
        num_keys=2,
        is_stable=True,
    )
    st = sorted_ops[0]

    bounds = jnp.searchsorted(
        st, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_starts = bounds[:num_tiles]
    tile_counts = bounds[1:] - bounds[:num_tiles]
    padded = jnp.zeros((ng * group,), jnp.int32).at[:num_tiles].set(tile_counts)
    gcounts = padded.reshape(ng, group).sum(axis=1)
    gsizes = (gcounts + chunk - 1) // chunk * chunk
    gstarts = (jnp.cumsum(gsizes) - gsizes).astype(jnp.int32)
    first_tile = jnp.minimum(jnp.arange(ng, dtype=jnp.int32) * group, num_tiles - 1)
    g_first_slot = tile_starts[first_tile]

    slot_f = (jnp.minimum(st, num_tiles - 1) % group).astype(jnp.float32)
    gid_f = _as_f(sorted_ops[11])
    z = jnp.zeros((mp,), jnp.float32)
    packed = jnp.stack(
        list(sorted_ops[2:11]) + [slot_f, gid_f, z, z, z, z, z], axis=0
    )  # [16, MP]
    # window slack for the last group's read overhang (W-chunk windows)
    src_lanes = mp + REALIGN_W * chunk + 256
    packed = jnp.pad(packed, ((0, 0), (0, src_lanes - mp)))

    mpa = mpa_for(mp, ng, chunk)
    tbl = jnp.stack([g_first_slot, gstarts, gsizes // chunk], axis=0)
    (pairs,) = _make_realign(ng, src_lanes, mpa, chunk)(tbl, packed)
    ranges = jnp.stack([gstarts, gcounts], axis=0)
    return SortedPairs(
        ranges=ranges, pairs=pairs, total_pairs=total, kept_bounds=kept_bounds
    )
