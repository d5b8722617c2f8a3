"""Benchmark: render+backward training iterations/sec on one chip.

Measures the full jitted train step (render forward -> L1+SSIM loss ->
custom-VJP backward -> 6-group Adam -> densification stats) at Replica room0
resolution (1200x680, SURVEY.md §6) on a synthetic room-scale scene.

Prints ONE JSON line. `vs_baseline` divides by an assumed 30 it/s for the
CUDA reference on A100 at this workload (the reference publishes no numbers
— README.md:1 is a joke line; 30 it/s ≈ 33 ms/iter is the Photo-SLAM-class
figure from its paper's RTX/A6000 numbers scaled to A100). The north-star
target is vs_baseline >= 2.0.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np

A100_REFERENCE_ITERS_PER_SEC = 30.0

# default = Replica room0 resolution; GSDF_BENCH_RES=1226x370 probes the
# KITTI streaming resolution (kitti_parser.hpp:156-157, BASELINE.md)
WIDTH, HEIGHT = (
    int(v) for v in os.environ.get("GSDF_BENCH_RES", "1200x680").split("x")
)
N_GAUSSIANS = 200_000
CAPACITY = 1 << 18
# autosized-realistic: 1.15x the observed 156.3k pairs (exact-KNN scale
# init, r3), 16k-granular — what mapper._autosize_pairs would settle on
MAX_PAIRS = int(os.environ.get("GSDF_BENCH_MAX_PAIRS", 180224))
CHUNK = 1024
# kernel-shape sweep knobs (defaults = production config)
PALLAS_CHUNK = int(os.environ.get("GSDF_BENCH_PALLAS_CHUNK", 128))
PALLAS_GROUP = int(os.environ.get("GSDF_BENCH_PALLAS_GROUP", 8))
# cross-step binning persistence cadence (engine/settings.py): 1 fresh
# bin + N-1 cached re-renders per keyframe visit block. The bench scene is
# steady-state (no densification in flight), so the mapper's production
# default is the staged post-densify cadence
# (MapperSettings.rebin_interval_after_densify = 8). 1 = re-bin every step
# (reference semantics, rasterizer_impl.cu:456-500; also reported as
# iters_per_sec_fresh_binning); quality delta of the cadence is measured
# in QUALITY_REBIN.json (0.12 dB).
REBIN_INTERVAL = int(os.environ.get("GSDF_BENCH_REBIN", 0)) or None
WARMUP = 3
ITERS = 20


def build_scene(seed=0):
    import jax.numpy as jnp

    from gsdf_slam_tpu.models import AdamState, create_from_pcd

    rng = np.random.default_rng(seed)
    # room-scale shell: points on walls/floor of a ~8m box viewed from center
    pts = rng.uniform(-4, 4, (N_GAUSSIANS, 3)).astype(np.float32)
    # push onto the box surface to mimic a room scan
    ax = rng.integers(0, 3, N_GAUSSIANS)
    sign = rng.choice([-4.0, 4.0], N_GAUSSIANS)
    pts[np.arange(N_GAUSSIANS), ax] = sign
    cols = rng.uniform(0, 1, (N_GAUSSIANS, 3)).astype(np.float32)
    state = create_from_pcd(
        jnp.asarray(pts), jnp.asarray(cols), jnp.ones(N_GAUSSIANS, bool), CAPACITY
    )
    adam = AdamState.init(state.params())
    return state, adam


def measure(state, adam, width, height, rebin):
    """Time the full jitted train step at one resolution.

    Returns (production-cadence it/s, fresh-binning it/s, live pair count).
    States CHAIN through the loops so every step truly executes (the
    runtime elides/overlaps independent repeat calls, inflating rates)."""
    import jax
    import jax.numpy as jnp

    from gsdf_slam_tpu.config import OptimizationParams
    from gsdf_slam_tpu.engine import train_step
    from gsdf_slam_tpu.ops import CameraMatrices, RasterizeConfig

    fovx = 2 * np.arctan(width / (2 * 600.0))
    fovy = 2 * np.arctan(height / (2 * 600.0))
    cam = CameraMatrices.from_pose(np.array([1.0, 0, 0, 0]), np.zeros(3), fovx, fovy)
    cfg = RasterizeConfig(
        height=height, width=width, max_pairs=MAX_PAIRS, chunk=CHUNK,
        pallas_chunk=PALLAS_CHUNK, pallas_group=PALLAS_GROUP,
    )
    opt = OptimizationParams()
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    bg = jnp.zeros(3)

    def one(s, a, it, cache=None, export=False):
        return train_step(
            s, a, cam, gt, None, bg, jnp.int32(it), jnp.float32(1.0), cfg, opt,
            binning_cache=cache, export_binning_cache=export,
        )

    s, a = state, adam
    for i in range(WARMUP):
        s, a, m = one(s, a, i + 1)
    cache = None
    if rebin > 1:
        s, a, m, cache = one(s, a, WARMUP + 1, export=True)
        s, a, m = one(s, a, WARMUP + 2, cache=cache)
    jax.block_until_ready((s.xyz, a.m["xyz"]))
    pairs = int(m.total_pairs)

    # reference-semantics rate: fresh binning every step
    t0 = time.perf_counter()
    for i in range(ITERS):
        s, a, m = one(s, a, i + 10)
    jax.block_until_ready((s.xyz, a.m["xyz"]))
    float(m.loss)  # hard barrier: block_until_ready is flaky over the relay
    ips_fresh = ITERS / (time.perf_counter() - t0)

    ips = ips_fresh
    if rebin > 1:
        # production cadence: 1 binning-exporting step + rebin-1 cached
        # re-renders per block (engine/mapper.py cross-step persistence;
        # same-keyframe re-train regime, times_of_use > 1)
        t0 = time.perf_counter()
        for i in range(ITERS):
            if i % rebin == 0:
                s, a, m, cache = one(s, a, i + 40, export=True)
            else:
                s, a, m = one(s, a, i + 40, cache=cache)
        jax.block_until_ready((s.xyz, a.m["xyz"]))
        float(m.loss)
        ips = ITERS / (time.perf_counter() - t0)
    return ips, ips_fresh, pairs


def main():
    import jax

    from gsdf_slam_tpu.engine.settings import MapperSettings

    state, adam = build_scene()
    st = MapperSettings()
    rebin = REBIN_INTERVAL or st.rebin_interval_after_densify or st.rebin_interval
    ips, ips_fresh, pairs = measure(state, adam, WIDTH, HEIGHT, rebin)

    detail = {
        "resolution": f"{WIDTH}x{HEIGHT}",
        "gaussians": N_GAUSSIANS,
        "pairs": pairs,
        "platform": jax.devices()[0].platform,
        "rebin_interval": rebin,
        "iters_per_sec_fresh_binning": round(ips_fresh, 3),
    }
    # BASELINE.md prescribes timing at Replica room0 AND KITTI streaming
    # resolutions (kitti_parser.hpp:156-157). Second pass unless the main
    # run was already re-pointed via GSDF_BENCH_RES.
    if "GSDF_BENCH_RES" not in os.environ:
        k_ips, k_fresh, k_pairs = measure(state, adam, 1226, 370, rebin)
        detail["kitti"] = {
            "resolution": "1226x370",
            "iters_per_sec": round(k_ips, 3),
            "iters_per_sec_fresh_binning": round(k_fresh, 3),
            "pairs": k_pairs,
        }
    # attach the latest committed quality artifact (benchmarks/quality.py)
    qpath = Path(__file__).parent / "QUALITY.json"
    if qpath.exists():
        q = json.loads(qpath.read_text())
        detail["quality"] = {
            "held_out_psnr_db": round(q["psnr_mean"], 2),
            "held_out_ssim": round(q["ssim_mean"], 4),
            "source": "QUALITY.json",
        }
    # attach the end-to-end streaming artifact (benchmarks/e2e_stream.py):
    # full online loop incl. host ingest + compiles, the number a SLAM
    # system lives on (reference trains 1 iter/frame online,
    # src/gaussian_mapper.cpp:328-331)
    epath = Path(__file__).parent / "E2E.json"
    if epath.exists():
        e = json.loads(epath.read_text())
        run = e.get("warm") or e.get("cold") or {}
        detail["e2e"] = {
            "frames_per_sec": run.get("frames_per_sec"),
            "iters_per_sec_e2e": run.get("iters_per_sec_e2e"),
            "compile_share": run.get("compile_share"),
            "run": "warm" if "warm" in e else "cold",
            "source": "E2E.json",
        }
    print(
        json.dumps(
            {
                "metric": "render_backward_iters_per_sec",
                "value": round(ips, 3),
                "unit": "it/s",
                "vs_baseline": round(ips / A100_REFERENCE_ITERS_PER_SEC, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
