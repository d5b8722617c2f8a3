#!/usr/bin/env python3
"""Per-op profile of the bench train step on the real chip.

Runs bench.py's exact workload under jax.profiler and aggregates XLA op
time from the trace (the .trace.json.gz event dump), printing a sorted
table. Usage: python benchmarks/profile_step.py [trace_dir]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_and_trace(trace_dir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    # GSDF_PROFILE_N=400000 profiles the converged-density scale-curve
    # point (bench.py headline) instead of the legacy 200k scene
    prof_n = int(os.environ.get("GSDF_PROFILE_N", 0))
    if prof_n:
        # calibrated_scene uses the committed CALIB constants (no count-fn
        # compile / bisection on the profile path)
        state, adam, max_pairs = bench.calibrated_scene(prof_n)
    else:
        state, adam = bench.build_scene()
        max_pairs = bench.MAX_PAIRS
    from gsdf_slam_tpu.config import OptimizationParams
    from gsdf_slam_tpu.engine import train_step
    from gsdf_slam_tpu.ops import CameraMatrices, RasterizeConfig

    fovx = 2 * np.arctan(bench.WIDTH / (2 * 600.0))
    fovy = 2 * np.arctan(bench.HEIGHT / (2 * 600.0))
    cam = CameraMatrices.from_pose(np.array([1.0, 0, 0, 0]), np.zeros(3), fovx, fovy)
    cfg = RasterizeConfig(
        height=bench.HEIGHT, width=bench.WIDTH,
        max_pairs=max_pairs, chunk=bench.CHUNK,
    )
    opt = OptimizationParams()
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (bench.HEIGHT, bench.WIDTH, 3)).astype(np.float32))
    bg = jnp.zeros(3)

    cached = os.environ.get("GSDF_PROFILE_CACHED", "") == "1"

    def one(s, a, it, cache=None, export=False):
        return train_step(s, a, cam, gt, None, bg, jnp.int32(it),
                          jnp.float32(1.0), cfg, opt,
                          binning_cache=cache, export_binning_cache=export)

    s, a = state, adam
    for i in range(3):
        s, a, m = one(s, a, i + 1)
    cache = None
    if cached:
        # profile the cross-step-persistence path (the production steady
        # state trains 7/8 steps through it at cadence 8)
        s, a, m, cache = one(s, a, 4, export=True)
        s, a, m = one(s, a, 5, cache=cache)
    jax.block_until_ready((s.xyz,))
    with jax.profiler.trace(trace_dir):
        for i in range(5):
            s, a, m = one(s, a, i + 10, cache=cache)
        jax.block_until_ready((s.xyz,))
        float(m.loss)


def parse(trace_dir: str, top: int = 40):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace files under", trace_dir)
        return
    path = max(files, key=lambda p: Path(p).stat().st_mtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find TPU device-op track: pick pids whose name mentions TensorCore/device
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n or "/device" in n.lower()}
    # leaf-only aggregation: drop any event that fully contains another
    # event on the same thread (grouping spans double-count their children)
    by_tid = defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        by_tid[(e["pid"], e.get("tid"))].append(e)
    agg = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for evs in by_tid.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        for i, e in enumerate(evs):
            end = e["ts"] + e.get("dur", 0)
            is_parent = (i + 1 < len(evs) and evs[i + 1]["ts"] < end)
            if is_parent:
                continue
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e3  # us -> ms
            agg[name] += dur
            count[name] += 1
            total += dur
    print(f"trace: {path}\ndevice leaf-op total: {total:.2f} ms over 5 steps "
          f"({total / 5:.2f} ms/step)\n")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    for name, ms in rows:
        print(f"{ms / 5:8.3f} ms/step  x{count[name] // 5:<5d} {name[:90]}")


if __name__ == "__main__":
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gsdf_trace"
    if len(sys.argv) <= 2 or sys.argv[2] != "--parse-only":
        run_and_trace(d)
    parse(d)
