"""Benchmark: render+backward training iterations/sec on one chip.

Measures the full jitted train step (render forward -> L1+SSIM loss ->
custom-VJP backward -> 6-group Adam -> densification stats) at Replica room0
resolution (1200x680, SURVEY.md §6).

Headline (round 4+): the CONVERGED-DENSITY workload — 400k gaussians at
~2.5 pairs/gaussian (the density a trained Replica-room0 map actually has,
QUALITY.json: 676k gaussians; the r1-r3 200k/165k-pair scene measured a
sparser regime). The full iters/s-vs-scale curve ({100k, 200k, 400k, 800k}
gaussians, fresh + cached binning) is in `detail.scale_curve`, and the
legacy 200k scene stays in `detail.legacy_200k` for round-over-round
comparability.

Prints ONE JSON line. `vs_baseline` divides by an assumed 30 it/s for the
CUDA reference on A100 (the reference publishes no numbers — README.md:1 is
a joke line; 30 it/s ≈ 33 ms/iter is the Photo-SLAM-class figure from its
paper's RTX/A6000 numbers scaled to A100). The reference's blend cost grows
with num_rendered (rasterizer_impl.cu:456-500, forward.cu:317-477), so 30
it/s is, if anything, generous to us at converged density. North star is
vs_baseline >= 2.0.

`--mesh N` measures the view-parallel mesh mode (parallel/sharding.py) over
N devices instead: aggregate train-step throughput with N keyframes per
batched step (the mapper's window-sampling regime). On this sandbox only
1 real chip exists; run with XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT for a
CPU-mesh smoke, or on real hardware for the production number.
"""

from __future__ import annotations

import argparse
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
# in QUALITY_REBIN.json (0.15 dB).
REBIN_INTERVAL = int(os.environ.get("GSDF_BENCH_REBIN", 0)) or None
WARMUP = 3
ITERS = 20
# headline scale-curve: gaussian counts at converged density
# (~2.5 pairs/gaussian, see build_scene(converged=True)); "" disables
CURVE = [
    int(v)
    for v in os.environ.get(
        "GSDF_BENCH_CURVE", "100000,200000,400000,800000"
    ).split(",")
    if v
]
HEADLINE_N = 400_000  # the >=400k converged point VERDICT r3 asks for
PAIRS_PER_GAUSSIAN = 2.5
GRAN = 16384  # mapper._autosize_pairs granularity


def _capacity_for(n: int) -> int:
    cap = 1 << 17
    while cap < n * 1.2:
        cap <<= 1
    return cap


def build_scene(seed=0, n=N_GAUSSIANS, converged=False):
    """Synthetic room-scale box scan with `n` gaussians.

    With ``converged=True`` the scene models a TRAINED map rather than a
    fresh ingest: opacity 0.5 (converged splats are opaque; per-tile
    opacity culling then keeps most rect tiles, rasterizer_impl.cu:66-118)
    and scales calibrated so the binned pair count is ~2.5x the gaussian
    count (QUALITY.json-era densities run 2-3 pairs/gaussian)."""
    import jax.numpy as jnp

    from gsdf_slam_tpu.models import AdamState, create_from_pcd
    from gsdf_slam_tpu.ops.transforms import inverse_sigmoid

    rng = np.random.default_rng(seed)
    # room-scale shell: points on walls/floor of a ~8m box viewed from center
    pts = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    # push onto the box surface to mimic a room scan
    ax = rng.integers(0, 3, n)
    sign = rng.choice([-4.0, 4.0], n)
    pts[np.arange(n), ax] = sign
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cap = _capacity_for(n) if n != N_GAUSSIANS else CAPACITY
    state = create_from_pcd(
        jnp.asarray(pts), jnp.asarray(cols), jnp.ones(n, bool), cap
    )
    if converged:
        op = inverse_sigmoid(0.5 * jnp.ones_like(state.opacity))
        state = state.replace(
            opacity=jnp.where(state.alive[:, None], op, state.opacity)
        )
        state = _calibrate_scales(state, n)
    adam = AdamState.init(state.params())
    return state, adam


def _bench_camera(width, height):
    from gsdf_slam_tpu.ops import CameraMatrices

    fovx = 2 * np.arctan(width / (2 * 600.0))
    fovy = 2 * np.arctan(height / (2 * 600.0))
    return CameraMatrices.from_pose(np.array([1.0, 0, 0, 0]), np.zeros(3), fovx, fovy)


def _pair_count_fn(width, height):
    """Jitted pre-cull pair count (sum of tiles_touched — the quantity the
    pair CAPACITY must hold, ops/pallas_binning.sort_expand_pack) as a
    function of a traced scale modifier."""
    import jax
    import jax.numpy as jnp

    from gsdf_slam_tpu.ops.projection import preprocess

    cam = _bench_camera(width, height)

    @jax.jit
    def count(state, mult):
        pre = preprocess(
            state.xyz, state.scaling_act(), state.rotation_act(),
            state.opacity_act()[:, 0], state.f_dc, state.f_rest, state.alive,
            cam, width=width, height=height, sh_degree=3,
            scale_modifier=mult,
        )
        return jnp.sum(pre.tiles_touched)

    return count


def _calibrate_scales(state, n):
    """Scale splats so the scene bins ~PAIRS_PER_GAUSSIAN pairs/gaussian
    (bisection over a traced scale modifier — one compile, many probes)."""
    import jax.numpy as jnp

    count = _pair_count_fn(WIDTH, HEIGHT)
    target = PAIRS_PER_GAUSSIAN * n
    lo, hi = 0.25, 64.0
    mult = 1.0
    for _ in range(24):
        mult = (lo * hi) ** 0.5
        pairs = float(count(state, jnp.float32(mult)))
        if abs(pairs - target) / target < 0.04:
            break
        if pairs < target:
            lo = mult
        else:
            hi = mult
    return state.replace(
        scaling=jnp.where(
            state.alive[:, None], state.scaling + np.log(mult), state.scaling
        )
    )


def autosize_pairs(state, width=None, height=None) -> int:
    """mapper._autosize_pairs policy: 1.15x observed, 16k-granular."""
    import jax.numpy as jnp

    count = _pair_count_fn(width or WIDTH, height or HEIGHT)
    pairs = float(count(state, jnp.float32(1.0)))
    return int(max(np.ceil(pairs * 1.15 / GRAN), 1) * GRAN)


def measure(state, adam, width, height, rebin, max_pairs=MAX_PAIRS, iters=ITERS):
    """Time the full jitted train step at one resolution.

    Returns (production-cadence it/s, fresh-binning it/s, live pair count).
    States CHAIN through the loops so every step truly executes (the
    runtime elides/overlaps independent repeat calls, inflating rates)."""
    import jax
    import jax.numpy as jnp

    from gsdf_slam_tpu.config import OptimizationParams
    from gsdf_slam_tpu.engine import train_step
    from gsdf_slam_tpu.ops import RasterizeConfig

    cam = _bench_camera(width, height)
    cfg = RasterizeConfig(
        height=height, width=width, max_pairs=max_pairs, chunk=CHUNK,
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
    for i in range(iters):
        s, a, m = one(s, a, i + 10)
    jax.block_until_ready((s.xyz, a.m["xyz"]))
    float(m.loss)  # hard barrier: block_until_ready is flaky over the relay
    ips_fresh = iters / (time.perf_counter() - t0)

    ips = ips_fresh
    if rebin > 1:
        # production cadence: 1 binning-exporting step + rebin-1 cached
        # re-renders per block (engine/mapper.py cross-step persistence;
        # same-keyframe re-train regime, times_of_use > 1)
        t0 = time.perf_counter()
        for i in range(iters):
            if i % rebin == 0:
                s, a, m, cache = one(s, a, i + 40, export=True)
            else:
                s, a, m = one(s, a, i + 40, cache=cache)
        jax.block_until_ready((s.xyz, a.m["xyz"]))
        float(m.loss)
        ips = iters / (time.perf_counter() - t0)
    return ips, ips_fresh, pairs


def measure_mesh(n_devices: int, rebin: int):
    """Aggregate throughput of the view-parallel mesh mode: N keyframes per
    batched step over an N-device mesh (parallel/sharding.py). Reported as
    aggregate iterations (views trained) per second."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gsdf_slam_tpu.config import OptimizationParams
    from gsdf_slam_tpu.ops import RasterizeConfig
    from gsdf_slam_tpu.parallel.sharding import (
        batch_cameras, make_sharded_train_step, replicate_to_mesh,
    )

    devs = jax.devices()[:n_devices]
    if len(devs) < n_devices:
        raise SystemExit(
            f"--mesh {n_devices} requested but only {len(devs)} devices visible"
        )
    mesh = Mesh(np.asarray(devs), ("dp",))
    state, adam = build_scene(n=HEADLINE_N, converged=True)
    mp = autosize_pairs(state)
    cfg = RasterizeConfig(
        height=HEIGHT, width=WIDTH, max_pairs=mp, chunk=CHUNK,
        pallas_chunk=PALLAS_CHUNK, pallas_group=PALLAS_GROUP,
    )
    step, n_dev = make_sharded_train_step(mesh, cfg, OptimizationParams())
    state = replicate_to_mesh(mesh, state)
    adam = replicate_to_mesh(mesh, adam)

    rng = np.random.default_rng(1)
    cams = batch_cameras([_bench_camera(WIDTH, HEIGHT) for _ in range(n_dev)])
    gts = jnp.asarray(
        rng.uniform(0, 1, (n_dev, HEIGHT, WIDTH, 3)).astype(np.float32)
    )
    bg = jnp.zeros(3)

    s, a = state, adam
    for i in range(WARMUP):
        s, a, m = step(s, a, cams, gts, None, bg, jnp.int32(i + 1), jnp.float32(1.0))
    jax.block_until_ready((s.xyz, a.m["xyz"]))
    iters = max(ITERS // 2, 8)
    t0 = time.perf_counter()
    for i in range(iters):
        s, a, m = step(s, a, cams, gts, None, bg, jnp.int32(i + 10), jnp.float32(1.0))
    jax.block_until_ready((s.xyz, a.m["xyz"]))
    float(m.loss)
    dt = time.perf_counter() - t0
    agg = iters * n_dev / dt
    print(json.dumps({
        "metric": "mesh_view_parallel_aggregate_iters_per_sec",
        "value": round(agg, 3),
        "unit": "views/s",
        "vs_baseline": round(agg / A100_REFERENCE_ITERS_PER_SEC, 3),
        "detail": {
            "n_devices": n_dev,
            "platform": jax.devices()[0].platform,
            "gaussians": HEADLINE_N,
            "resolution": f"{WIDTH}x{HEIGHT}",
            "pairs_capacity": mp,
            "steps_per_sec": round(agg / n_dev, 3),
        },
    }))


def main():
    import jax

    from gsdf_slam_tpu.engine.settings import MapperSettings

    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=0,
                    help="measure the N-device view-parallel mesh mode")
    args = ap.parse_args()

    st = MapperSettings()
    rebin = REBIN_INTERVAL or st.rebin_interval_after_densify or st.rebin_interval
    if args.mesh:
        measure_mesh(args.mesh, rebin)
        return

    # ---- converged-density scale curve (the headline workload) ----
    curve = []
    headline = None
    for n in CURVE:
        state, adam = build_scene(n=n, converged=True)
        mp = autosize_pairs(state)
        it = ITERS if n <= 200_000 else max(8, ITERS // 2)
        ips, ips_fresh, pairs = measure(
            state, adam, WIDTH, HEIGHT, rebin, max_pairs=mp, iters=it
        )
        pt = {
            "gaussians": n,
            "pairs": pairs,
            "pairs_capacity": mp,
            "iters_per_sec_fresh_binning": round(ips_fresh, 3),
            "iters_per_sec_cached": round(ips, 3),
        }
        curve.append(pt)
        if n == HEADLINE_N:
            headline = pt

    # ---- legacy r1-r3 scene (round-over-round comparability) ----
    state, adam = build_scene()
    ips, ips_fresh, pairs = measure(state, adam, WIDTH, HEIGHT, rebin)
    legacy = {
        "gaussians": N_GAUSSIANS,
        "pairs": pairs,
        "iters_per_sec_fresh_binning": round(ips_fresh, 3),
        "iters_per_sec_cached": round(ips, 3),
    }

    detail = {
        "resolution": f"{WIDTH}x{HEIGHT}",
        "gaussians": HEADLINE_N,
        "pairs": headline["pairs"] if headline else None,
        "platform": jax.devices()[0].platform,
        "rebin_interval": rebin,
        "iters_per_sec_fresh_binning": (
            headline["iters_per_sec_fresh_binning"] if headline else None
        ),
        "iters_per_sec_cached": (
            headline["iters_per_sec_cached"] if headline else None
        ),
        "scale_curve": curve,
        "legacy_200k": legacy,
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
    value = headline["iters_per_sec_fresh_binning"] if headline else ips_fresh
    print(
        json.dumps(
            {
                # headline = converged-density 400k-gaussian scene, re-binned
                # every iteration (reference semantics — same work per step
                # as rasterizer_impl.cu:456-500); cached-cadence rate is in
                # detail.iters_per_sec_cached
                "metric": "render_backward_iters_per_sec_400k_converged_fresh_binning",
                "value": value,
                "unit": "it/s",
                "vs_baseline": round(value / A100_REFERENCE_ITERS_PER_SEC, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
