"""Monotone-window expansion-gather probe (round 4).

The binning pipeline's expansion `rows = table[rank]` is a row-loop-bound
XLA gather (~14 ns/row, docs/PERF.md) that scales with pair CAPACITY — at
converged-map density (2-3M pairs) it alone costs tens of ms. But `rank` is
MONOTONE (nondecreasing): any 512-lane output block draws from a <=640-lane
contiguous window of the table. That admits a Pallas kernel that streams
windows with double-buffered DMA and materializes each output block either

  a) mm:  window [16, W] x in-window one-hot [W, BC] on the MXU
          (3-pass exact split; r3's microbench negative was 6-pass HIGHEST
          with an HBM-materialized one-hot — this builds the one-hot from
          iota in VMEM and halves the passes), or
  b) dg:  lane dynamic_gather (jnp.take_along_axis inside the kernel) —
          failed to compile over the relay in r3 (HTTP 500); retried here.

Output is field-major [16, MP] directly, deleting the row-major
intermediate + transpose copy of the XLA path.

NOTE the payload-semantics constraint for (a): a matmul gather does
ARITHMETIC, so bitcast-int rows (NaN/denormal bit patterns) are corrupted;
the table must carry integers as exact f32 VALUES (< 2^24). Variant (b)
has no such constraint (pure lane shuffle).

Usage: python benchmarks/expand_probe.py [pairs_target ...]
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

REPS = 10
BC = 512  # output lanes per grid cell
WIN = BC + 128  # table window per cell (<= BC distinct ranks + alignment)
PACK = 16


def _split3(a):
    hi = a.astype(jnp.bfloat16)
    r1 = a - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _expand_kernel_mm(g0_ref, lr_ref, table_hbm, out_ref, win_ref, sem):
    c = pl.program_id(0)
    # g0_ref carries the window start in 128-lane BLOCK units so Mosaic can
    # prove the HBM slice offset divisible by the tiling (x*128 is provable;
    # a plain int that happens to be a multiple of 128 is not)
    g0 = g0_ref[c] * 128
    dma = pltpu.make_async_copy(table_hbm.at[:, pl.ds(g0, WIN)], win_ref, sem)
    dma.start()
    dma.wait()
    lr = lr_ref[0, :]  # [BC] int32 in-window rank
    wi = jax.lax.broadcasted_iota(jnp.int32, (WIN, BC), 0)
    oh = (wi == lr[None, :]).astype(jnp.bfloat16)  # [WIN, BC] 0/1
    hi, mid, lo = _split3(win_ref[:])  # [16, WIN]
    d = lambda x: jax.lax.dot_general(
        x, oh, ((((1,), (0,)), ((), ()))), preferred_element_type=jnp.float32
    )
    out_ref[:] = d(lo) + d(mid) + d(hi)


def _expand_kernel_dg(g0_ref, lr_ref, table_hbm, out_ref, win_ref, sem):
    c = pl.program_id(0)
    g0 = g0_ref[c] * 128
    dma = pltpu.make_async_copy(table_hbm.at[:, pl.ds(g0, WIN)], win_ref, sem)
    dma.start()
    dma.wait()
    lr = lr_ref[:]  # [1, BC]
    idx = jnp.broadcast_to(lr, (PACK, BC))
    out_ref[:] = jnp.take_along_axis(win_ref[:], idx, axis=1)


def make_expand(kernel, mp, p_lanes):
    ncells = mp // BC
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncells,),
        in_specs=[
            pl.BlockSpec((1, BC), lambda i, g: (0, i)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((PACK, BC), lambda i, g: (0, i))],
        scratch_shapes=[
            pltpu.VMEM((PACK, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((PACK, mp), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )


def build(mp, p):
    """Synthetic monotone expansion: p gaussians with random tiles_touched
    summing to ~0.92*mp (capacity slack like the autosizer's 1.15x)."""
    rng = np.random.default_rng(0)
    t = rng.integers(0, 7, p).astype(np.int64)
    total = int(t.sum())
    scale = 0.92 * mp / total
    t = np.maximum((t * scale).astype(np.int64), 0)
    starts = np.cumsum(t) - t
    rank = np.zeros(mp, np.int32)
    live = t > 0
    np.maximum.at(rank, starts[live].clip(0, mp - 1), np.arange(1, p + 1)[live])
    rank = np.maximum.accumulate(rank) - 1
    rank = np.maximum(rank, 0).astype(np.int32)
    table = rng.standard_normal((16, p)).astype(np.float32)
    # int-valued rows (start/gid/rect) as exact f32 VALUES
    table[3] = np.arange(p, dtype=np.float32)
    table[4] = starts.astype(np.float32)
    p_lanes = (p + 127) // 128 * 128 + WIN
    table_pad = np.zeros((16, p_lanes), np.float32)
    table_pad[:, :p] = table
    g0 = (rank[::BC] // 128 * 128).astype(np.int32)
    lr = (rank - np.repeat(g0, BC)[: len(rank)]).astype(np.int32)
    return (
        jnp.asarray(table_pad), jnp.asarray(rank),
        jnp.asarray(g0 // 128), jnp.asarray(lr)[None, :], p_lanes,
    )


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jfn(*args)
    float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:40s} {dt:8.3f} ms/op")
    return dt


def main(targets):
    targets = [int(t) for t in targets] or [180224, 1048576]
    for mp in targets:
        p = max(mp // 3, 1000) // 128 * 128
        table, rank, g0, lr, p_lanes = build(mp, p)
        print(f"--- mp={mp} p={p} ---")

        def chain_xla(tbl):
            def step(i, t):
                rows = t.T[rank]  # row-major XLA gather (the r3 pipeline
                # gathers from a [P, 16] table; .T is free at trace time
                # because we then transpose back)
                cols = jax.lax.optimization_barrier(rows.T)
                return t + cols[:, :1] * 1e-30
            t = jax.lax.fori_loop(0, REPS, step, tbl)
            return jnp.sum(t[0, :1])

        tbl_rowmajor = table.T  # [p_lanes, 16]

        def chain_xla2(tbl_rm):
            def step(i, t):
                rows = t[rank]
                cols = jax.lax.optimization_barrier(rows.T)
                return t.at[:1, :1].add(jnp.sum(cols[:, :1]) * 1e-30)
            t = jax.lax.fori_loop(0, REPS, step, tbl_rm)
            return jnp.sum(t[0, :1])

        timed("xla row-gather + transpose", chain_xla2, tbl_rowmajor)

        run_mm = make_expand(_expand_kernel_mm, mp, p_lanes)

        def chain_mm(tbl):
            def step(i, t):
                (cols,) = run_mm(g0, lr, t)
                return t.at[:1, :1].add(jnp.sum(cols[:, :1]) * 1e-30)
            t = jax.lax.fori_loop(0, REPS, step, tbl)
            return jnp.sum(t[0, :1])

        # parity first
        (got,) = jax.jit(lambda t: run_mm(g0, lr, t))(table)
        ref = np.asarray(table).T[np.asarray(rank)].T
        d = float(np.max(np.abs(np.asarray(got) - ref)))
        print(f"  mm parity: max|d| = {d:.3e}")
        timed("pallas windowed one-hot mm", chain_mm, table)

        try:
            run_dg = make_expand(_expand_kernel_dg, mp, p_lanes)
            (got,) = jax.jit(lambda t: run_dg(g0, lr, t))(table)
            d = float(np.max(np.abs(np.asarray(got) - ref)))
            print(f"  dg parity: max|d| = {d:.3e}")

            def chain_dg(tbl):
                def step(i, t):
                    (cols,) = run_dg(g0, lr, t)
                    return t.at[:1, :1].add(jnp.sum(cols[:, :1]) * 1e-30)
                t = jax.lax.fori_loop(0, REPS, step, tbl)
                return jnp.sum(t[0, :1])

            timed("pallas lane dynamic_gather", chain_dg, table)
        except Exception as e:  # r3: relay HTTP 500 on lane gathers
            print(f"  dg FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main(sys.argv[1:])
