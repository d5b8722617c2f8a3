#!/usr/bin/env python3
"""Measure the per-tile early-termination opportunity the grouped blend
kernels currently leave on the table.

The grouped stream lays each group's 8 tiles out SEQUENTIALLY (tile 0's
depth-sorted pairs, then tile 1's, ...), and the fwd kernel's exit test is
`max over the whole [256, G] panel` — but unprocessed tiles sit at
log_raw = 0, so the group-level exit can only ever fire inside the LAST
tile of a group. Every other tile's post-saturation pairs (all 256 pixels
at T < T_EPS) stream through as fully masked work. The CUDA reference
terminates per 16x16 tile block (forward.cu:386-389 block vote), so this
is exactly the granularity gap vs the reference.

This probe replays the binned bench scene on the host (XLA binning path —
identical pair set/order to the production sort_expand_pack stream) and
reports, per tile: the saturation frontier (first pair index after which
every pixel is dead), the pairs beyond it, and — simulating the proposed
kernel jump (`on a chunk whose top slot is saturated -> jump to the next
slot's first chunk`) — the chunk-level savings at the production chunk
size.

    GSDF_PROBE_N=400000 python benchmarks/term_probe.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

TILE = 16
CHUNK = 128
GROUP = 8


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    import bench
    from gsdf_slam_tpu.ops.binning import bin_gaussians
    from gsdf_slam_tpu.ops.projection import preprocess, tile_grid

    n = int(os.environ.get("GSDF_PROBE_N", 0))
    if n:
        state, _ = bench.build_scene(n=n, converged=True)
        max_pairs = bench.autosize_pairs(state)
    else:
        state, _ = bench.build_scene()
        max_pairs = bench.MAX_PAIRS
    cam = bench._bench_camera(bench.WIDTH, bench.HEIGHT)
    pre = preprocess(
        state.xyz, state.scaling_act(), state.rotation_act(),
        state.opacity_act()[:, 0], state.f_dc, state.f_rest, state.alive,
        cam, width=bench.WIDTH, height=bench.HEIGHT, sh_degree=3,
    )
    gw, gh = tile_grid(bench.WIDTH, bench.HEIGHT)
    opac = state.opacity_act()[:, 0]
    binned = bin_gaussians(pre, opac, grid_w=gw, grid_h=gh, max_pairs=max_pairs)

    tiles = np.asarray(binned.pair_tile)
    gauss = np.asarray(binned.pair_gauss)
    total = int(binned.total_pairs)
    tiles, gauss = tiles[:total], gauss[:total]
    means2d = np.asarray(pre.means2d)
    conics = np.asarray(pre.conics)
    op_h = np.asarray(opac)
    num_tiles = gw * gh
    print(f"scene: {total} pairs, grid {gw}x{gh}; host pull "
          f"{time.time() - t0:.1f}s")

    from gsdf_slam_tpu.ops.blend import ALPHA_MAX, ALPHA_MIN, T_EPS

    log_t_eps = np.log(T_EPS)
    jy, jx = np.mgrid[0:TILE, 0:TILE]
    jx = jx.reshape(-1).astype(np.float32)
    jy = jy.reshape(-1).astype(np.float32)

    bounds = np.searchsorted(tiles, np.arange(num_tiles + 1))
    sat_pos = np.full(num_tiles, -1, np.int64)  # global frontier position
    skippable_pairs = 0
    dead_pairs_exact = 0
    frontiers = []
    for t in range(num_tiles):
        lo, hi = bounds[t], bounds[t + 1]
        if hi == lo:
            continue
        g = gauss[lo:hi]
        x = means2d[g, 0] - (t % gw) * TILE
        y = means2d[g, 1] - (t // gw) * TILE
        a, b, c = conics[g, 0], conics[g, 1], conics[g, 2]
        o = op_h[g]
        dx = x[:, None] - jx[None, :]
        dy = y[:, None] - jy[None, :]
        power = (
            -0.5 * (a[:, None] * dx * dx + c[:, None] * dy * dy)
            - b[:, None] * dx * dy
        )
        alpha = np.minimum(ALPHA_MAX, o[:, None] * np.exp(power))
        alpha[(power > 0) | (alpha < ALPHA_MIN)] = 0.0
        logt = np.cumsum(np.log1p(-alpha), axis=0)
        # per-pair EXACT deadness: no pixel where this pair both lands
        # (alpha > 0) and the exclusive transmittance is still alive —
        # the bwd kernel's `applied & alpha>0` test per lane
        logt_prev = np.vstack([np.zeros((1, logt.shape[1]), logt.dtype),
                               logt[:-1]])
        pair_alive = ((alpha > 0) & (logt_prev >= log_t_eps)).any(axis=1)
        dead_pairs_exact += int((~pair_alive).sum())
        dead = (logt < log_t_eps).all(axis=1)
        if dead.any():
            k = int(np.argmax(dead))
            sat_pos[t] = lo + k
            skippable_pairs += (hi - lo) - (k + 1)
            frontiers.append((k + 1, hi - lo))
        else:
            frontiers.append((hi - lo, hi - lo))

    # chunk-level simulation of the proposed jump rule over the grouped
    # stream: group g's stream is its tiles' pairs concatenated, chunked at
    # CHUNK lanes (chunk-aligned group starts, as sort_expand_pack lays out)
    ng = (num_tiles + GROUP - 1) // GROUP
    total_chunks = 0
    used_chunks = 0
    for gi in range(ng):
        t_lo = gi * GROUP
        t_hi = min(t_lo + GROUP, num_tiles)
        cnt = int(bounds[t_hi] - bounds[t_lo])
        if cnt == 0:
            continue
        base = bounds[t_lo]
        n_chunks = (cnt + CHUNK - 1) // CHUNK
        total_chunks += n_chunks
        # first chunk of each slot, local frontier positions
        first = bounds[t_lo : t_hi + 1] - base  # [G+1] local start offsets
        c = 0
        used = 0
        while c < n_chunks:
            used += 1
            hi_lane = min((c + 1) * CHUNK, cnt) - 1
            s_hi = int(np.searchsorted(first, hi_lane, side="right")) - 1
            t_cur = t_lo + s_hi
            sp = sat_pos[t_cur]
            if sp >= 0 and (sp - base) <= hi_lane:
                if s_hi + 1 >= t_hi - t_lo:
                    c = n_chunks  # saturated slot was the group's last tile
                else:
                    c = max(c + 1, int(first[s_hi + 1]) // CHUNK)
            else:
                c += 1
        used_chunks += used

    fr = np.array(frontiers, np.float64)
    print(f"\npairs beyond per-tile saturation frontier: {skippable_pairs} "
          f"({100.0 * skippable_pairs / max(total, 1):.1f}%)")
    print(f"per-pair-exact dead pairs (zero fwd+bwd contribution): "
          f"{dead_pairs_exact} "
          f"({100.0 * dead_pairs_exact / max(total, 1):.1f}%)")
    print(f"chunks: {total_chunks} -> {used_chunks} under the jump rule "
          f"({100.0 * (total_chunks - used_chunks) / max(total_chunks, 1):.1f}% skipped)")
    sat_tiles = int((fr[:, 0] < fr[:, 1]).sum())
    print(f"tiles that saturate at all: {sat_tiles}/{len(fr)}")
    if sat_tiles:
        sel = fr[fr[:, 0] < fr[:, 1]]
        print(f"median frontier of saturating tiles: "
              f"{np.median(sel[:, 0]):.0f} of {np.median(sel[:, 1]):.0f} pairs")


if __name__ == "__main__":
    main()
