#!/usr/bin/env python3
"""Re-derive the fold-dispatch crossover for THIS chip.

`ops/pallas_blend_grouped._fold_pair_grads` statically picks between an
XLA scatter-add (cheap at small pair counts) and the sorted-prefix fold
(6.5x cheaper at 1.2M rows on v5e) based on `_SORTED_FOLD_MIN_ROWS` — a
v5e-measured constant (docs/PERF.md r4). On a different TPU generation the
two cost curves move independently, so this script measures BOTH paths
over an MPA grid, prints a table, and recommends the crossover to pin via
`GSDF_FOLD_CROSSOVER` (read at import).

    python benchmarks/fold_crossover.py [--rows 131072,262144,...]
        [--p 400000] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def measure_path(mpa: int, p: int, sorted_path: bool, iters: int) -> float:
    """ms/call of one fold flavor at MPA rows folding into P gaussians."""
    import jax
    import jax.numpy as jnp

    from gsdf_slam_tpu.ops.pallas_blend_grouped import PACK, _fold_pair_grads

    rng = np.random.default_rng(0)
    grads = jnp.asarray(rng.uniform(-1, 1, (PACK, mpa)).astype(np.float32))
    # plausible gid layout: sorted segments covering all of [0, p)
    gid = jnp.asarray(np.sort(rng.integers(0, p, mpa)).astype(np.int32))
    ng = 64
    gstarts = jnp.asarray(
        (np.arange(ng) * (mpa // ng)).astype(np.int32)
    )
    gcounts = jnp.full((ng,), mpa // ng, jnp.int32)
    ranges = jnp.stack([gstarts, gcounts], axis=0)
    counts = np.bincount(np.asarray(gid), minlength=p + 1)
    kept_bounds = jnp.asarray(np.cumsum(counts[:p]).astype(np.int32))
    min_rows = 0 if sorted_path else mpa + 1

    @jax.jit
    def fold(g):
        return _fold_pair_grads(g, gid, ranges, kept_bounds, p,
                                min_rows=min_rows)

    out = fold(grads)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fold(out.sum() * 0 + grads)  # chain a dependency
    float(out[0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--rows",
        default="131072,262144,393216,524288,786432,1179648",
        help="comma-separated MPA row counts to probe",
    )
    ap.add_argument("--p", type=int, default=400_000)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    rows = [int(v) for v in args.rows.split(",")]
    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0]})")
    print(f"{'rows':>10} {'scatter ms':>11} {'sorted ms':>10}  winner")
    crossover = None
    for mpa in rows:
        ms_sc = measure_path(mpa, args.p, False, args.iters)
        ms_so = measure_path(mpa, args.p, True, args.iters)
        win = "sorted" if ms_so < ms_sc else "scatter"
        if crossover is None and ms_so < ms_sc:
            crossover = mpa
        print(f"{mpa:>10} {ms_sc:>11.2f} {ms_so:>10.2f}  {win}")
    if crossover is None:
        print("\nscatter won everywhere probed; raise --rows to find the "
              "crossover, or pin GSDF_FOLD_CROSSOVER above your workload's "
              "MPA to keep the scatter")
    else:
        print(f"\nrecommended: GSDF_FOLD_CROSSOVER={crossover}")
        cur = int(os.environ.get("GSDF_FOLD_CROSSOVER", 393216))
        if crossover != cur:
            print(f"(current effective value: {cur})")


if __name__ == "__main__":
    main()
