"""Microbenchmarks for the rasterizer's pair-table primitives on real TPU.

Measures the candidate building blocks for the round-2 perf work (docs/
PERF.md roadmap): every row-loop-bound XLA gather/scatter around the Pallas
blend kernels, plus the Pallas replacements under consideration.

Run: python benchmarks/microbench.py [name ...]

Methodology: each op runs REPS times inside one jit via lax.fori_loop; the
carry is the op's FULL output folded back into its input (so nothing can be
dead-code-eliminated or hoisted), and the wall time is closed by fetching a
scalar to the host (block_until_ready under-measures over the axon relay).
A `null` experiment measures the chain scaffolding itself; subtract it.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

P = int(os.environ.get("MB_P", 1 << 18))  # gaussian capacity
MP = int(os.environ.get("MB_MP", 3 << 17))  # pair capacity (393216)
NG = 404  # tile groups at 1200x680 / group=8
CHUNK = 128
MPA = MP + NG * CHUNK
REPS = int(os.environ.get("MB_REPS", 30))


def timed(name, op, x, *rest):
    """op: (x, *rest) -> y with y foldable into x via shapes matching."""

    def run(x, *rest):
        def body(i, c):
            out = op(c, *rest)
            return out

        final = jax.lax.fori_loop(0, REPS, body, x)
        return jnp.sum(jax.tree.leaves(final)[0][..., :1])

    fn = jax.jit(run)
    float(fn(x, *rest))  # compile + warmup
    t0 = time.perf_counter()
    float(fn(x, *rest))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:46s} {dt:8.3f} ms/op")
    return dt


def rng_arrays(seed=0):
    r = np.random.default_rng(seed)
    idx = jnp.asarray(r.integers(0, P, MPA).astype(np.int32))
    vals = jnp.asarray(r.standard_normal((MPA, 16)).astype(np.float32))
    table = jnp.asarray(r.standard_normal((P + 1, 16)).astype(np.float32))
    return idx, vals, table


def bench_null():
    _, vals, _ = rng_arrays()
    timed("null chain [MPA,16]", lambda c: c * 1.000001, vals)


def bench_fold():
    idx, vals, _ = rng_arrays()

    def op(c, idx):
        out = jnp.zeros((P + 1, 16), jnp.float32).at[idx].add(c)
        return c.at[: P + 1].add(out)  # fold FULL result back

    timed("fold scatter-add [MPA,16]->[P,16]", op, vals, idx)


def bench_fold_sorted():
    _, vals, _ = rng_arrays()
    r = np.random.default_rng(11)
    sidx = jnp.asarray(np.sort(r.integers(0, P, MPA)).astype(np.int32))

    def op(c, idx):
        out = jnp.zeros((P + 1, 16), jnp.float32).at[idx].add(
            c, indices_are_sorted=True
        )
        return c.at[: P + 1].add(out)

    timed("fold scatter-add SORTED idx", op, vals, sidx)


def bench_segsum_sorted():
    _, vals, _ = rng_arrays()
    r = np.random.default_rng(11)
    sidx = jnp.asarray(np.sort(r.integers(0, P, MPA)).astype(np.int32))

    def op(c, idx):
        out = jax.ops.segment_sum(c, idx, num_segments=P + 1, indices_are_sorted=True)
        return c.at[: P + 1].add(out)

    timed("segment_sum sorted [MPA,16]->[P,16]", op, vals, sidx)


def bench_gather_wide():
    idx, _, table = rng_arrays()

    def op(c, idx):
        rows = c[idx]  # [MPA,16]
        return c.at[: P + 1].add(rows[: P + 1])

    timed("gather [P,16] by [MPA] random idx", op, table, idx)


def bench_gather_narrow():
    idx, _, table = rng_arrays()
    t4 = table[:, :4]

    def op(c, idx):
        rows = c[idx]
        return c.at[: P + 1].add(rows[: P + 1])

    timed("gather [P,4] by [MPA] random idx", op, t4, idx)


def bench_scatter_narrow():
    r = np.random.default_rng(2)
    pos = jnp.asarray(r.choice(MP, P, replace=False).astype(np.int32))
    val = jnp.asarray(np.arange(P, dtype=np.int32))

    def op(c, val):
        out = jnp.zeros((MP,), jnp.int32).at[c % MP].max(val)
        return (c + out[:P]) % jnp.int32(2**30)

    timed("scatter-max [P]->[MP] narrow", op, pos, val)


def bench_scatter_wide_mp():
    """The align-pairs scatter: [MP,16] rows -> [MPA,16] at given positions."""
    r = np.random.default_rng(12)
    # monotone positions w/ group padding gaps, like align_pairs_grouped
    pos = np.sort(r.choice(MPA, MP, replace=False)).astype(np.int32)
    posj = jnp.asarray(pos)
    src = jnp.asarray(r.standard_normal((MP, 16)).astype(np.float32))

    def op(c, pos):
        out = jnp.zeros((MPA, 16), jnp.float32).at[pos].set(c)
        return c + out[:MP]

    timed("scatter-set [MP,16]->[MPA,16] monotone", op, src, posj)


def bench_scatter_narrow_mp():
    r = np.random.default_rng(12)
    pos = np.sort(r.choice(MPA, MP, replace=False)).astype(np.int32)
    posj = jnp.asarray(pos)
    src = jnp.asarray(r.integers(0, P, MP).astype(np.int32))

    def op(c, pos):
        out = jnp.full((MPA,), P, jnp.int32).at[pos].set(c)
        return c + out[:MP] - out[0]

    timed("scatter-set [MP]->[MPA] narrow monotone", op, src, posj)


def bench_cummax():
    r = np.random.default_rng(3)
    x = jnp.asarray(r.integers(0, P, MP).astype(np.int32))

    def op(c):
        return jax.lax.cummax(c) % jnp.int32(2**28)

    timed("cummax [MP] int32", op, x)


def _sort_n(n_payload, label):
    r = np.random.default_rng(4)
    keys = jnp.asarray(r.integers(0, 3226, MP).astype(np.int32))
    d = jnp.asarray(r.standard_normal(MP).astype(np.float32))
    cols = tuple(
        jnp.asarray(r.standard_normal(MP).astype(np.float32)) for _ in range(n_payload)
    )

    def op(c, d, *cols):
        out = jax.lax.sort((c % 3226, d) + cols, num_keys=2, is_stable=True)
        acc = out[1]
        for o in out[2:]:
            acc = acc + o  # consume EVERY payload output (defeat DCE)
        return out[0] + keys + acc.astype(jnp.int32) % 2

    timed(label, op, keys, d, *cols)


def bench_sorts():
    _sort_n(1, "2-key stable sort, 3 ops [MP]")
    _sort_n(6, "2-key stable sort, 8 ops [MP]")
    _sort_n(14, "2-key stable sort, 16 ops [MP]")


# ---------------------------------------------------------------- pallas ops
def _realign_kernel(tbl_ref, src_hbm, dst_hbm, buf_ref, sem_in, sem_out):
    g = pl.program_id(0)
    src0 = tbl_ref[0, g]  # arbitrary offset
    dst0 = tbl_ref[1, g]  # 128-aligned
    n_chunks = tbl_ref[2, g]
    base = (src0 // CHUNK) * CHUNK
    shift = src0 - base

    def body(j, _):
        dma = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(pl.multiple_of(base + j * CHUNK, CHUNK), 2 * CHUNK)],
            buf_ref,
            sem_in,
        )
        dma.start()
        dma.wait()
        rolled = pltpu.roll(buf_ref[:], -shift, 1)
        out = pltpu.make_async_copy(
            dst_hbm.at[:, pl.ds(pl.multiple_of(dst0 + j * CHUNK, CHUNK), CHUNK)],
            sem_out,
        )
        # write via a second buffer? reuse buf: need a [16, CHUNK] view
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _realign_kernel2(tbl_ref, src_hbm, dst_hbm, buf_ref, obuf_ref, sem_in, sem_out):
    g = pl.program_id(0)
    src0 = tbl_ref[0, g]
    dst0 = tbl_ref[1, g]
    n_chunks = tbl_ref[2, g]
    base = (src0 // CHUNK) * CHUNK
    shift = src0 - base

    def body(j, _):
        dma = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(pl.multiple_of(base + j * CHUNK, CHUNK), 2 * CHUNK)],
            buf_ref,
            sem_in,
        )
        dma.start()
        dma.wait()
        obuf_ref[:] = pltpu.roll(buf_ref[:], -shift, 1)[:, :CHUNK]
        out = pltpu.make_async_copy(
            obuf_ref,
            dst_hbm.at[:, pl.ds(pl.multiple_of(dst0 + j * CHUNK, CHUNK), CHUNK)],
            sem_out,
        )
        out.start()
        out.wait()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def bench_realign_dma():
    """HBM->HBM roll-realign group copies (the align_pairs replacement)."""
    r = np.random.default_rng(7)
    src = jnp.asarray(r.standard_normal((16, MP + CHUNK)).astype(np.float32))
    counts = r.multinomial(MP - NG, np.ones(NG) / NG)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    gsizes = (counts + CHUNK - 1) // CHUNK * CHUNK
    dsts = np.concatenate([[0], np.cumsum(gsizes)[:-1]])
    nch = (counts + CHUNK - 1) // CHUNK
    tbl = jnp.asarray(np.stack([starts, dsts, nch]).astype(np.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NG,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[
            pltpu.VMEM((16, 2 * CHUNK), jnp.float32),
            pltpu.VMEM((16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        _realign_kernel2,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((16, MPA), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    def op(c, tbl):
        (out,) = call(tbl, c)
        return c.at[:, : MP + CHUNK].add(out[:, : MP + CHUNK]) * 0.5

    timed("pallas roll-realign DMA 404 groups", op, src, tbl)


def _wingather_kernel(ws_ref, tbl_hbm, ranks_ref, out_ref, win_ref, sem, *, win, cpc):
    c = pl.program_id(0)
    w0 = ws_ref[c]
    dma = pltpu.make_async_copy(
        tbl_hbm.at[:, pl.ds(pl.multiple_of(w0, 128), win)], win_ref, sem
    )
    dma.start()
    local = ranks_ref[:] - w0  # [cpc] int32 in [0, win)
    dma.wait()
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (cpc, win), 1) == local[:, None]
    ).astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        onehot,
        win_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def bench_windowed_gather():
    """Monotone-rank gather via windowed one-hot matmul (win=1152, cpc=1024).

    Mirrors production: ranks are DENSE visible-ordinals (cummax over a
    scatter of cumsum(visible)), so any 1024 consecutive pairs span < 1024
    distinct ranks and a 1152 window (128-aligned start) always covers.
    """
    win, cpc = 1152, 1024
    nchunks = MP // cpc
    r = np.random.default_rng(8)
    steps = r.random(MP) < (P / MP / 2)
    ranks = np.minimum(np.cumsum(steps).astype(np.int32), P - 1)
    # window starts 128-aligned for the HBM lane slice
    ws = (ranks.reshape(nchunks, cpc)[:, 0] // 128 * 128).astype(np.int32)
    ranks2d = jnp.asarray(ranks)
    wstarts = jnp.asarray(ws)
    table = jnp.asarray(r.standard_normal((16, P + win)).astype(np.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((cpc,), lambda i, ws: (i,)),
        ],
        out_specs=pl.BlockSpec((cpc, 16), lambda i, ws: (i, 0)),
        scratch_shapes=[pltpu.VMEM((16, win), jnp.float32), pltpu.SemaphoreType.DMA],
    )
    call = pl.pallas_call(
        functools.partial(_wingather_kernel, win=win, cpc=cpc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nchunks * cpc, 16), jnp.float32),
    )

    def op(c, ws, rk):
        out = call(ws, c, rk)
        return c.at[:, :P].add(out[:P].T) * 0.99999

    timed("pallas windowed onehot gather [MP,16]", op, table, wstarts, ranks2d)


def _wingather_dg_kernel(ws_ref, tbl_hbm, ranks_ref, out_ref, win_ref, sem, *, win, cpc):
    c = pl.program_id(0)
    w0 = ws_ref[c]
    dma = pltpu.make_async_copy(
        tbl_hbm.at[:, pl.ds(pl.multiple_of(w0, 128), win)], win_ref, sem
    )
    dma.start()
    local = ranks_ref[:] - w0  # [cpc] in [0, win)
    dma.wait()
    idx = jnp.broadcast_to(local[None, :], (16, cpc))
    idx = jnp.concatenate([idx, jnp.zeros((16, win - cpc), jnp.int32)], axis=1)
    out_ref[:] = jnp.take_along_axis(win_ref[:], idx, axis=1)[:, :cpc]


def bench_windowed_gather_dg():
    """Same windowed gather via Mosaic dynamic_gather on the lane axis.

    dynamic_gather requires indices.shape == operand.shape, so the window is
    cpc + 128 wide (room for the 128-align-down of the start) and the index
    panel is padded. Dense monotone ranks guarantee span <= cpc.
    """
    win, cpc = 2176, 2048
    nchunks = MP // cpc
    r = np.random.default_rng(8)
    steps = r.random(MP) < (P / MP / 2)
    ranks = np.minimum(np.cumsum(steps).astype(np.int32), P - 1)
    ws = (ranks.reshape(nchunks, cpc)[:, 0] // 128 * 128).astype(np.int32)
    ranks2d = jnp.asarray(ranks)
    wstarts = jnp.asarray(ws)
    table = jnp.asarray(r.standard_normal((16, P + win)).astype(np.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((cpc,), lambda i, ws: (i,)),
        ],
        out_specs=pl.BlockSpec((16, cpc), lambda i, ws: (0, i)),
        scratch_shapes=[pltpu.VMEM((16, win), jnp.float32), pltpu.SemaphoreType.DMA],
    )
    call = pl.pallas_call(
        functools.partial(_wingather_dg_kernel, win=win, cpc=cpc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, nchunks * cpc), jnp.float32),
    )

    def op(c, ws, rk):
        out = call(ws, c, rk)
        return c.at[:, :P].add(out[:, :P]) * 0.99999

    timed("pallas windowed dyn-gather [MP,16]", op, table, wstarts, ranks2d)


def bench_searchsorted():
    r = np.random.default_rng(9)
    pt = jnp.asarray(np.sort(r.integers(0, 3226, MP)).astype(np.int32))
    q = jnp.arange(3226, dtype=jnp.int32)

    def op(c, q):
        b = jnp.searchsorted(c, q, side="left").astype(jnp.int32)
        return c.at[:3226].max(b)

    timed("searchsorted 3226 queries in [MP]", op, pt, q)


def bench_cumsum_p():
    r = np.random.default_rng(10)
    x = jnp.asarray(r.integers(0, 4, P).astype(np.int32))

    def op(c):
        return jnp.cumsum(c) % jnp.int32(2**28)

    timed("cumsum [P] int32", op, x)


def bench_backsort_payload():
    """Fold-v2 piece 1 (r4): sort pair-grad rows back to expansion (gid-
    contiguous) order by a carried slot key — 1 int key + 9 f32 payload."""
    r = np.random.default_rng(3)
    key = jnp.asarray(r.permutation(MPA).astype(np.int32))
    rows = [jnp.asarray(r.standard_normal(MPA).astype(np.float32)) for _ in range(9)]

    def op(k, *rs):
        out = jax.lax.sort((k,) + rs, num_keys=1, is_stable=False)
        return out[0] ^ 1, *out[1:]

    def run(k, *rs):
        def body(i, c):
            return op(*c)
        final = jax.lax.fori_loop(0, REPS, body, (k, *rs))
        return jnp.sum(final[1][:1])

    fn = jax.jit(run)
    float(fn(key, *rows))
    t0 = time.perf_counter()
    float(fn(key, *rows))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{'back-sort 1key+9payload [MPA]':46s} {dt:8.3f} ms/op")


def bench_fold_cumsum_ends():
    """Fold-v2 pieces 2+3 (r4): values pre-sorted to gid-contiguous order;
    segment sum = cumsum along pairs + gather at per-gaussian end offsets +
    adjacent diff. Cost model: bandwidth (cumsum) + P-row gather — replaces
    the MPA-row scatter when MPA >> P."""
    r = np.random.default_rng(5)
    vals = jnp.asarray(r.standard_normal((MPA, 16)).astype(np.float32))
    t = r.integers(0, 7, P).astype(np.int64)
    t = (t * (0.9 * MP / max(t.sum(), 1))).astype(np.int64)
    ends = jnp.asarray((np.cumsum(t) - 1).clip(0, MPA - 1).astype(np.int32))

    def op(c, ends):
        cs = jnp.cumsum(c, axis=0)  # [MPA, 16]
        at_ends = cs[ends]  # [P, 16] row gather
        out = jnp.diff(at_ends, axis=0, prepend=jnp.zeros((1, 16), jnp.float32))
        return c.at[:P].add(out)

    timed("fold-v2 cumsum+ends-gather+diff", op, vals, ends)


ALL = {
    "null": bench_null,
    "backsort": bench_backsort_payload,
    "fold_v2": bench_fold_cumsum_ends,
    "fold": bench_fold,
    "fold_sorted": bench_fold_sorted,
    "segsum": bench_segsum_sorted,
    "gather_wide": bench_gather_wide,
    "gather_narrow": bench_gather_narrow,
    "scatter_narrow": bench_scatter_narrow,
    "scatter_wide_mp": bench_scatter_wide_mp,
    "scatter_narrow_mp": bench_scatter_narrow_mp,
    "cummax": bench_cummax,
    "sorts": bench_sorts,
    "realign": bench_realign_dma,
    "wingather": bench_windowed_gather,
    "wingather_dg": bench_windowed_gather_dg,
    "searchsorted": bench_searchsorted,
    "cumsum_p": bench_cumsum_p,
}


def bench_fold_v3():
    """Fold-v3 (r4 production candidate): the full sort-by-gid composition
    that replaces the [MPA,16]->[P,16] scatter-add. Padding lanes carry
    garbage gids but exactly-zero grads, so zero rows inside a segment
    leave every prefix diff unchanged — no forward-pipeline changes needed.

      1. lax.sort((gid, g0..g8), num_keys=1)        (gid-contiguous order)
      2. prefix = [0; cumsum(G, axis=0)]            (running segment sums)
      3. n_le = searchsorted(sgid, arange(P), right) (per-gaussian bounds)
      4. acc = diff(prefix[n_le], prepend=0)        (segment sums)
    """
    r = np.random.default_rng(7)
    gid = jnp.asarray(np.sort(r.integers(0, P, MPA)).astype(np.int32))
    # unsorted input (the realigned kernel order)
    perm = r.permutation(MPA)
    gid = gid[jnp.asarray(perm)]
    grows = [jnp.asarray(r.standard_normal(MPA).astype(np.float32)) for _ in range(9)]

    def op(gid, *gs):
        rows = jax.lax.sort((gid,) + gs, num_keys=1, is_stable=False)
        sgid = rows[0]
        g = jnp.stack(rows[1:], axis=1)  # [MPA, 9]
        cs = jnp.concatenate(
            [jnp.zeros((1, 9), jnp.float32), jnp.cumsum(g, axis=0)], axis=0
        )
        n_le = jnp.searchsorted(
            sgid, jnp.arange(P, dtype=jnp.int32), side="right"
        )
        at = cs[n_le]
        acc = jnp.diff(at, axis=0, prepend=jnp.zeros((1, 9), jnp.float32))
        # chain: fold result back into the inputs
        out = [v.at[:P].add(acc[:, i]) for i, v in enumerate(gs)]
        return (gid ^ 1, *out)

    def run(gid, *gs):
        def body(i, c):
            return op(*c)
        final = jax.lax.fori_loop(0, REPS, body, (gid, *grows))
        return jnp.sum(final[1][:1])

    fn = jax.jit(run)
    float(fn(gid, *grows))
    t0 = time.perf_counter()
    float(fn(gid, *grows))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{'fold-v3 sort+cumsum+searchsorted+diff':46s} {dt:8.3f} ms/op")


def bench_searchsorted_p():
    """Isolated: P queries into a sorted [MPA] key array (fold-v3 step 3)."""
    r = np.random.default_rng(7)
    sgid = jnp.asarray(np.sort(r.integers(0, P, MPA)).astype(np.int32))
    q = jnp.arange(P, dtype=jnp.int32)

    def op(sgid, q):
        n = jnp.searchsorted(sgid, q, side="right")
        return sgid.at[:P].add(n), q ^ 1

    def run(sgid, q):
        def body(i, c):
            return op(*c)
        final = jax.lax.fori_loop(0, REPS, body, (sgid, q))
        return jnp.sum(final[0][:1])

    fn = jax.jit(run)
    float(fn(sgid, q))
    t0 = time.perf_counter()
    float(fn(sgid, q))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{'searchsorted P-into-MPA':46s} {dt:8.3f} ms/op")




def bench_fold_v4():
    """Fold-v4 (r4 production candidate B): replaces searchsorted (79 ms,
    row-loop binary-search gathers) with ANALYTIC boundaries.

      fwd-side (counted here too): kept-count per gaussian kc via int
      cumsum over the expansion keep mask + ends gather + diff; boundary
      positions = cumsum(kc).
      bwd-side: lane validity from group ranges (2 tiny scatters + int
      cumsum), mask padding gids BIG, sort (gid, 9 grads), prefix-sum the
      sorted grads, gather at boundaries, adjacent diff.
    """
    r = np.random.default_rng(7)
    ng, chunk = 404, 128
    mpa = MP + ng * chunk
    # synthetic group layout: gcounts sum to ~0.9 MP
    gc = r.integers(0, 2 * MP // ng, ng).astype(np.int64)
    gc = (gc * (0.9 * MP / max(gc.sum(), 1))).astype(np.int32)
    gs = ((gc + chunk - 1) // chunk * chunk).astype(np.int32)
    gstarts = (np.cumsum(gs) - gs).astype(np.int32)
    gcounts = jnp.asarray(gc)
    gstarts_j = jnp.asarray(gstarts)
    # per-lane gid: valid lanes get sorted-ish random gids, padding garbage
    gid = jnp.asarray(r.integers(0, P, mpa).astype(np.int32))
    grows = [jnp.asarray(r.standard_normal(mpa).astype(np.float32)) for _ in range(9)]
    # analytic per-gaussian boundary positions (fwd-computed in production)
    kc = r.integers(0, 5, P).astype(np.int64)
    kc = (kc * (0.9 * MP / max(kc.sum(), 1))).astype(np.int32)
    ends = jnp.asarray(np.cumsum(kc).clip(0, mpa).astype(np.int32))

    def op(gid, ends, *gs):
        # lane validity from group ranges
        bnd = jnp.zeros((mpa + 1,), jnp.int32)
        bnd = bnd.at[gstarts_j + gcounts].add(1)
        bnd = bnd.at[gstarts_j].add(-1)
        lvl = jnp.cumsum(bnd[:mpa])
        masked = jnp.where(lvl == -1, gid, jnp.int32(0x7FFFFF00))
        rows = jax.lax.sort((masked,) + gs, num_keys=1, is_stable=False)
        g = jnp.stack(rows[1:], axis=1)  # [MPA, 9]
        cs = jnp.concatenate(
            [jnp.zeros((1, 9), jnp.float32), jnp.cumsum(g, axis=0)], axis=0
        )
        at = cs[ends]
        acc = jnp.diff(at, axis=0, prepend=jnp.zeros((1, 9), jnp.float32))
        out = [v.at[:P].add(acc[:, i]) for i, v in enumerate(gs)]
        return (gid ^ 1, ends, *out)

    def run(gid, ends, *gs):
        def body(i, c):
            return op(*c)
        final = jax.lax.fori_loop(0, REPS, body, (gid, ends, *gs))
        return jnp.sum(final[2][:1])

    fn = jax.jit(run)
    float(fn(gid, ends, *grows))
    t0 = time.perf_counter()
    float(fn(gid, ends, *grows))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{'fold-v4 mask+sort+cumsum+analytic-ends':46s} {dt:8.3f} ms/op")




# --------------------------------------------------------------- expand (r4)
# Candidates to replace the expansion row-gather `table[rank]` ([P,16] ->
# [MP,16], jvp__.5 in the 400k profile) + the [MP,16]->[16,MP] transpose
# (transpose_jvp, both ~14-20 ns/row): telescoping bit-deltas scattered at
# `starts` (P rows, not MP) + an EXACT int32 wraparound cumsum over slots,
# fused with a Pallas block transpose so the result lands field-major.


def _expand_inputs(seed=11):
    r = np.random.default_rng(seed)
    tiles = r.integers(0, 6, P).astype(np.int64)
    tiles = (tiles * (0.95 * MP / max(tiles.sum(), 1))).astype(np.int32)
    starts = (np.cumsum(tiles) - tiles).astype(np.int32)
    rank = np.zeros(MP, np.int32)
    pos = starts[tiles > 0]
    np.add.at(rank, pos.clip(0, MP - 1), 1)
    rank = np.maximum(np.cumsum(rank) - 1, 0).astype(np.int32)
    table_bits = r.integers(-(2**31), 2**31, (P, 16)).astype(np.int64).astype(np.int32)
    return (
        jnp.asarray(tiles), jnp.asarray(starts), jnp.asarray(rank),
        jnp.asarray(table_bits),
    )


def bench_expand_gather_xla():
    """Today's expand: one [P,16]->[MP,16] row gather by monotone rank."""
    _, _, rank, table = _expand_inputs()
    tf = jax.lax.bitcast_convert_type(table, jnp.float32)

    def op(c, rank):
        rows = c[rank]  # [MP, 16]
        return c.at[:MP].add(rows[: min(P, MP)][:P] * 1e-30), rank ^ 0

    def run(tf, rank):
        def body(i, cc):
            return op(*cc)
        final = jax.lax.fori_loop(0, REPS, body, (tf, rank))
        return jnp.sum(final[0][:1])

    fn = jax.jit(run)
    float(fn(tf, rank))
    t0 = time.perf_counter()
    float(fn(tf, rank))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{'expand row-gather [P,16]->[MP,16]':46s} {dt:8.3f} ms/op")


def _bench_expand_pipeline(name, split):
    """gather -> transpose as production composes them. With split=False the
    two fuse into ONE transpose-rooted fusion (the suspected pathology: the
    fusion's output is written column-wise so the row-loop gather degrades);
    split=True puts an optimization_barrier between them so each runs in its
    isolated (fast) form."""
    _, _, rank, table = _expand_inputs()
    tf = jax.lax.bitcast_convert_type(table, jnp.float32)

    def op(c, rank):
        rows = c[rank]  # [MP, 16]
        if split:
            rows = jax.lax.optimization_barrier(rows)
        cols = jax.lax.optimization_barrier(rows.T)  # [16, MP]
        return c.at[:1, :].add(cols[:, :1].T * 1e-30), rank ^ 0

    def run(tf, rank):
        def body(i, cc):
            return op(*cc)
        final = jax.lax.fori_loop(0, REPS, body, (tf, rank))
        return jnp.sum(final[0][:1])

    fn = jax.jit(run)
    float(fn(tf, rank))
    t0 = time.perf_counter()
    float(fn(tf, rank))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:46s} {dt:8.3f} ms/op")


def bench_expand_fused():
    _bench_expand_pipeline("expand gather+transpose FUSED (production)", False)


def bench_expand_split():
    _bench_expand_pipeline("expand gather |barrier| transpose SPLIT", True)


def bench_expand_transpose_xla():
    """Today's post-expand transpose [MP,16] -> [16,MP] in XLA."""
    r = np.random.default_rng(12)
    x = jnp.asarray(r.standard_normal((MP, 16)).astype(np.float32))

    def op(c):
        t = c.T  # [16, MP]
        return c + t[:1, :].T * 1e-30

    timed("expand transpose [MP,16]->[16,MP] XLA", op, x)


def bench_expand_scatter_delta():
    """Delta scatter: [P,16] int rows added at starts into [MP,16]."""
    tiles, starts, _, table = _expand_inputs()
    delta = jnp.diff(table, axis=0, prepend=jnp.zeros((1, 16), jnp.int32))

    def op(c, starts, delta):
        out = jnp.zeros((MP, 16), jnp.int32).at[starts].add(
            delta, mode="drop"
        )
        return c ^ (out[:P] & 1), starts ^ 0, delta

    def run(c, starts, delta):
        def body(i, cc):
            return op(*cc)
        final = jax.lax.fori_loop(0, REPS, body, (c, starts, delta))
        return jnp.sum(final[0][:1].astype(jnp.float32))

    fn = jax.jit(run)
    float(fn(table, starts, delta))
    t0 = time.perf_counter()
    float(fn(table, starts, delta))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{'expand delta-scatter [P,16]-rows->[MP,16]':46s} {dt:8.3f} ms/op")


def bench_expand_cumsum_int():
    """int32 wraparound cumsum along axis 0 of [MP,16] in plain XLA."""
    r = np.random.default_rng(13)
    x = jnp.asarray(
        r.integers(-(2**31), 2**31, (MP, 16)).astype(np.int64).astype(np.int32)
    )

    def op(c):
        return jnp.cumsum(c, axis=0)

    timed("expand int32 cumsum [MP,16] axis0 XLA", op, x)


XP_BLK = 512


def _xpose_cumsum_kernel(x_ref, out_ref, carry_ref):
    """[BLK,16] int32 block -> transposed [16,BLK] inclusive cumsum along
    lanes with a cross-block running carry (grid is sequential)."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    t = x_ref[...].T  # [16, BLK]
    lane = jax.lax.broadcasted_iota(jnp.int32, (16, XP_BLK), 1)
    s = t
    sh = 1
    while sh < XP_BLK:
        r = pltpu.roll(s, sh, 1)
        s = s + jnp.where(lane >= sh, r, 0)
        sh *= 2
    s = s + carry_ref[:, :1]
    out_ref[...] = s
    carry_ref[...] = jnp.broadcast_to(s[:, XP_BLK - 1 : XP_BLK], (16, 128))


def bench_expand_xpose_cumsum_pallas():
    """Fused Pallas transpose + exact int32 cumsum: [MP,16] -> [16,MP]."""
    r = np.random.default_rng(13)
    x = jnp.asarray(
        r.integers(-(2**31), 2**31, (MP, 16)).astype(np.int64).astype(np.int32)
    )
    nb = MP // XP_BLK
    call = pl.pallas_call(
        _xpose_cumsum_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((XP_BLK, 16), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((16, XP_BLK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((16, MP), jnp.int32),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )
    # correctness vs XLA before timing
    ref = jnp.cumsum(x[: 4 * XP_BLK].astype(jnp.int32), axis=0).T
    got = np.asarray(call(x))[:, : 4 * XP_BLK]
    assert np.array_equal(np.asarray(ref), got), "pallas cumsum mismatch"

    def op(c):
        out = call(c)
        return c.at[:16].set(c[:16] ^ (out[:, :16].T & 1))

    timed("expand pallas xpose+int-cumsum [MP,16]", op, x)


ALL.update({"fold_v3": bench_fold_v3, "searchsorted_p": bench_searchsorted_p, "fold_v4": bench_fold_v4, "expand_gather": bench_expand_gather_xla, "expand_transpose": bench_expand_transpose_xla, "expand_scatter": bench_expand_scatter_delta, "expand_cumsum": bench_expand_cumsum_int, "expand_pallas": bench_expand_xpose_cumsum_pallas, "expand_fused": bench_expand_fused, "expand_split": bench_expand_split})


if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for n in names:
        try:
            ALL[n]()
        except Exception as e:  # keep going; report failures
            msg = str(e).split("\n")[0][:160]
            print(f"{n:46s} FAILED: {type(e).__name__}: {msg}")
