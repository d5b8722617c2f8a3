"""Benchmark: render+backward training iterations/sec on one chip.

Measures the full jitted train step (render forward -> L1+SSIM loss ->
custom-VJP backward -> 6-group Adam -> densification stats) at Replica room0
resolution (1200x680, SURVEY.md §6).

Headline: the CONVERGED-DENSITY workload — 400k gaussians at ~2.5
pairs/gaussian (the density a trained Replica-room0 map actually has,
QUALITY.json: 676k gaussians). Additional points ({100k, 200k, 800k}
converged, the legacy r1-r3 200k scene, KITTI resolution) land in
`detail` as budget allows.

Prints ONE JSON line (from the PARENT process, always — see below).
`vs_baseline` divides by an assumed 30 it/s for the CUDA reference on A100
(the reference publishes no numbers — README.md:1 is a joke line; 30 it/s
~= 33 ms/iter is the Photo-SLAM-class figure from its paper's RTX/A6000
numbers scaled to A100). The reference's blend cost grows with
num_rendered (rasterizer_impl.cu:456-500, forward.cu:317-477), so 30 it/s
is, if anything, generous to us at converged density. North star is
vs_baseline >= 2.0.

Round-5 architecture (BENCH_r04 was rc=124/parsed=null — the old
all-or-nothing main() lost every number to a driver timeout):

  parent (no jax, hang-proof)          worker (all device work)
  ------------------------------      --------------------------------
  spawn worker, watch deadline   -->  stages in PRIORITY order, one
  SIGTERM handler: finalize now       JSON line appended per completed
  kill worker at budget          <--  stage (flushed immediately)
  assemble stages -> print ONE line

The worker pays the relay's one-time ~90 s first-transfer tax and
~100-300 s/jit cold-compile cost; the parent guarantees that whatever
finished inside GSDF_BENCH_BUDGET (default 540 s, under the driver's
600 s timeout) is printed and nothing is ever lost. Compiles the worker
starts but doesn't finish still seed the persistent XLA cache
(~/.cache/gsdf_slam_tpu/xla_cache), so a rerun picks up where it died.

Stage priority: 400k-converged fresh -> 400k cached cadence -> 800k fresh
(post-fold scale trend) -> legacy 200k -> KITTI res -> 100k/200k curve.

`--mesh N` measures the view-parallel mesh mode (parallel/sharding.py) over
N devices instead: aggregate train-step throughput with N keyframes per
batched step. On this sandbox only 1 real chip exists; run with
XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT for a CPU-mesh smoke, or on real
hardware for the production number.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
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
# bin + N-1 cached re-renders per keyframe visit block (production
# default = MapperSettings.rebin_interval_after_densify). 0/unset = that
# default; quality delta of the cadence is in QUALITY_REBIN.json (0.15 dB).
REBIN_INTERVAL = int(os.environ.get("GSDF_BENCH_REBIN", 0)) or None
WARMUP = 3
ITERS = 20
# curve points beyond the headline, priority-ordered; "" disables extras
CURVE = [
    int(v)
    for v in os.environ.get("GSDF_BENCH_CURVE", "800000,100000,200000").split(",")
    if v
]
# the >=400k converged point VERDICT r3 asks for (env knob is for small
# CPU smoke-tests of the harness, not for reporting)
HEADLINE_N = int(os.environ.get("GSDF_BENCH_HEADLINE", 400_000))
PAIRS_PER_GAUSSIAN = 2.5
GRAN = 16384  # mapper._autosize_pairs granularity

# Pre-measured calibration constants: scale multiplier that puts the
# converged synthetic scene at ~PAIRS_PER_GAUSSIAN pairs/gaussian, and the
# mapper-policy pair capacity, per (resolution, n). (Re)generate via
# `GSDF_BENCH_CALIBRATE=1 python bench.py` (re-runs the bisection and
# prints updated values to stderr); constants keep the driver-budget path
# free of the count-fn compile + 24 relay probes. The scene is a seeded
# deterministic construction, so the constants are exact re-runs.
CALIB: dict = {
    # measured 2026-08-20 on the live v5e chip (TPU v5 lite)
    "1200x680/100000": {"mult": 1.29684, "max_pairs": 294912},
    "1200x680/200000": {"mult": 1.83401, "max_pairs": 573440},
    "1200x680/400000": {"mult": 2.59368, "max_pairs": 1146880},
    "1200x680/800000": {"mult": 3.66802, "max_pairs": 2293760},
}


def _capacity_for(n: int) -> int:
    cap = 1 << 17
    while cap < n * 1.2:
        cap <<= 1
    return cap


def build_scene(seed=0, n=N_GAUSSIANS, converged=False, mult=None):
    """Synthetic room-scale box scan with `n` gaussians.

    With ``converged=True`` the scene models a TRAINED map rather than a
    fresh ingest: opacity 0.5 (converged splats are opaque; per-tile
    opacity culling then keeps most rect tiles, rasterizer_impl.cu:66-118)
    and scales calibrated so the binned pair count is ~2.5x the gaussian
    count (QUALITY.json-era densities run 2-3 pairs/gaussian). `mult`
    short-circuits the calibration bisection with a known multiplier."""
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
        if mult is None:
            mult = _calibrate_scale_mult(state, n)
            print(f"[bench] calibrated mult({n}) = {mult:.5f}", file=sys.stderr)
        state = state.replace(
            scaling=jnp.where(
                state.alive[:, None],
                state.scaling + np.log(mult),
                state.scaling,
            )
        )
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


def _calibrate_scale_mult(state, n) -> float:
    """Find the scale multiplier that bins ~PAIRS_PER_GAUSSIAN
    pairs/gaussian (bisection over a traced modifier — one compile, many
    probes). Used to (re)generate the CALIB table, not on the budget path."""
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
    return mult


def autosize_pairs(state, width=None, height=None) -> int:
    """mapper._autosize_pairs policy: 1.15x observed, 16k-granular."""
    import jax.numpy as jnp

    count = _pair_count_fn(width or WIDTH, height or HEIGHT)
    pairs = float(count(state, jnp.float32(1.0)))
    return int(max(np.ceil(pairs * 1.15 / GRAN), 1) * GRAN)


def calibrated_scene(n):
    """Converged scene + mapper-policy pair capacity, from the CALIB table
    when available (no count-fn compile), bisection otherwise."""
    key = f"{WIDTH}x{HEIGHT}/{n}"
    c = None if os.environ.get("GSDF_BENCH_CALIBRATE") else CALIB.get(key)
    state, adam = build_scene(n=n, converged=True, mult=c["mult"] if c else None)
    if c:
        mp = c["max_pairs"]
    else:
        mp = autosize_pairs(state)
        print(f"[bench] autosized max_pairs({n}) = {mp}", file=sys.stderr)
    return state, adam, mp


def _step_fns(width, height, max_pairs):
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

    return one


def measure_fresh(state, adam, width, height, max_pairs, iters=ITERS):
    """Reference-semantics rate: fresh binning every step. Returns
    (it/s, live pair count, final (state, adam) for the cached stage).

    States CHAIN through the loop so every step truly executes (the
    runtime elides/overlaps independent repeat calls, inflating rates),
    and the loop ends with a VALUE FETCH — block_until_ready alone is
    unreliable over the relay."""
    import jax

    one = _step_fns(width, height, max_pairs)
    s, a = state, adam
    for i in range(WARMUP):
        s, a, m = one(s, a, i + 1)
    jax.block_until_ready((s.xyz, a.m["xyz"]))
    float(m.loss)
    pairs = int(m.total_pairs)

    t0 = time.perf_counter()
    for i in range(iters):
        s, a, m = one(s, a, i + 10)
    jax.block_until_ready((s.xyz, a.m["xyz"]))
    float(m.loss)  # hard barrier
    ips = iters / (time.perf_counter() - t0)
    return ips, pairs, (s, a)


def measure_cached(state, adam, width, height, max_pairs, rebin, iters=ITERS):
    """Production cadence: 1 binning-exporting step + rebin-1 cached
    re-renders per block (engine/mapper.py cross-step persistence;
    same-keyframe re-train regime, times_of_use > 1)."""
    import jax

    one = _step_fns(width, height, max_pairs)
    s, a, m, cache = one(state, adam, 1, export=True)
    s, a, m = one(s, a, 2, cache=cache)
    jax.block_until_ready((s.xyz, a.m["xyz"]))
    float(m.loss)

    t0 = time.perf_counter()
    for i in range(iters):
        if i % rebin == 0:
            s, a, m, cache = one(s, a, i + 40, export=True)
        else:
            s, a, m = one(s, a, i + 40, cache=cache)
    jax.block_until_ready((s.xyz, a.m["xyz"]))
    float(m.loss)
    return iters / (time.perf_counter() - t0)


# --------------------------------------------------------------- worker


def _rebin_default() -> int:
    from gsdf_slam_tpu.engine.settings import MapperSettings

    st = MapperSettings()
    return REBIN_INTERVAL or st.rebin_interval_after_densify or st.rebin_interval


def run_worker(out_path: str, deadline: float) -> None:
    """Run stages in priority order, appending one flushed JSON line per
    completed stage to `out_path`. The parent enforces the deadline by
    SIGKILL; we soft-check it only to avoid *starting* hopeless stages
    (a started compile still seeds the persistent XLA cache)."""
    import jax
    import jax.numpy as jnp

    out = open(out_path, "a", buffering=1)

    def record(stage: str, **obj):
        out.write(json.dumps({"stage": stage, "t": round(time.time(), 1), **obj}) + "\n")
        out.flush()
        os.fsync(out.fileno())

    t_start = time.time()
    # pay the relay's one-time first-transfer tax up front, deterministically
    float(jnp.zeros(()))
    record(
        "attach",
        platform=jax.devices()[0].platform,
        attach_s=round(time.time() - t_start, 1),
    )

    rebin = _rebin_default()
    scenes: dict = {}

    def get_scene(n):
        if n not in scenes:
            scenes[n] = calibrated_scene(n)
        return scenes[n]

    def stage_headline_fresh():
        state, adam, mp = get_scene(HEADLINE_N)
        ips, pairs, (s, a) = measure_fresh(state, adam, WIDTH, HEIGHT, mp)
        scenes[HEADLINE_N] = (s, a, mp)  # chain trained state
        return dict(
            gaussians=HEADLINE_N, pairs=pairs, pairs_capacity=mp,
            iters_per_sec_fresh_binning=round(ips, 3),
            resolution=f"{WIDTH}x{HEIGHT}",
        )

    def stage_headline_cached():
        state, adam, mp = get_scene(HEADLINE_N)
        ips = measure_cached(state, adam, WIDTH, HEIGHT, mp, rebin)
        return dict(
            gaussians=HEADLINE_N, rebin_interval=rebin,
            iters_per_sec_cached=round(ips, 3),
        )

    def stage_curve(n):
        def _run():
            state, adam, mp = get_scene(n)
            it = ITERS if n <= 200_000 else max(8, ITERS // 2)
            ips, pairs, _ = measure_fresh(state, adam, WIDTH, HEIGHT, mp, iters=it)
            return dict(
                gaussians=n, pairs=pairs, pairs_capacity=mp,
                iters_per_sec_fresh_binning=round(ips, 3),
            )

        return _run

    def stage_legacy():
        state, adam = build_scene()
        ips, pairs, (s, a) = measure_fresh(state, adam, WIDTH, HEIGHT, MAX_PAIRS)
        scenes["legacy"] = (s, a, MAX_PAIRS)
        return dict(
            gaussians=N_GAUSSIANS, pairs=pairs,
            iters_per_sec_fresh_binning=round(ips, 3),
        )

    def stage_kitti():
        if "legacy" not in scenes:
            state, adam = build_scene()
            scenes["legacy"] = (state, adam, MAX_PAIRS)
        state, adam, mp = scenes["legacy"]
        ips, pairs, _ = measure_fresh(state, adam, 1226, 370, mp)
        return dict(
            resolution="1226x370", pairs=pairs,
            iters_per_sec_fresh_binning=round(ips, 3),
        )

    stages = [("headline_fresh", stage_headline_fresh),
              ("headline_cached", stage_headline_cached)]
    for n in CURVE:
        stages.append((f"curve_{n}", stage_curve(n)))
    stages += [("legacy_200k", stage_legacy), ("kitti", stage_kitti)]

    for name, fn in stages:
        if time.time() > deadline - 10:
            record(name, skipped="deadline")
            continue
        t0 = time.time()
        try:
            res = fn()
            record(name, wall_s=round(time.time() - t0, 1), **res)
        except Exception as exc:  # noqa: BLE001 — keep later stages alive
            record(name, error=f"{type(exc).__name__}: {exc}")


def run_worker_mesh(out_path: str, n_devices: int) -> None:
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

    out = open(out_path, "a", buffering=1)
    devs = jax.devices()[:n_devices]
    if len(devs) < n_devices:
        raise SystemExit(
            f"--mesh {n_devices} requested but only {len(devs)} devices visible"
        )
    mesh = Mesh(np.asarray(devs), ("dp",))
    state, adam, mp = calibrated_scene(HEADLINE_N)
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
    float(m.loss)
    iters = max(ITERS // 2, 8)
    t0 = time.perf_counter()
    for i in range(iters):
        s, a, m = step(s, a, cams, gts, None, bg, jnp.int32(i + 10), jnp.float32(1.0))
    jax.block_until_ready((s.xyz, a.m["xyz"]))
    float(m.loss)
    dt = time.perf_counter() - t0
    agg = iters * n_dev / dt
    out.write(json.dumps({
        "stage": "mesh",
        "aggregate_iters_per_sec": round(agg, 3),
        "n_devices": n_dev,
        "platform": jax.devices()[0].platform,
        "gaussians": HEADLINE_N,
        "resolution": f"{WIDTH}x{HEIGHT}",
        "pairs_capacity": mp,
        "steps_per_sec": round(agg / n_dev, 3),
    }) + "\n")
    out.flush()


# --------------------------------------------------------------- parent


def collect(out_path: Path) -> dict:
    stages: dict = {}
    if out_path.exists():
        for line in out_path.read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn final line from a killed worker
            stages[obj.pop("stage", "?")] = obj
    return stages


def emit(stages: dict, t0: float, partial_path: Path | None = None) -> None:
    """Assemble whatever stages completed into the ONE output line."""
    if "mesh" in stages:
        m = stages["mesh"]
        agg = m.get("aggregate_iters_per_sec", 0.0)
        print(json.dumps({
            "metric": "mesh_view_parallel_aggregate_iters_per_sec",
            "value": agg,
            "unit": "views/s",
            "vs_baseline": round(agg / A100_REFERENCE_ITERS_PER_SEC, 3),
            "detail": m,
        }))
        return

    head = stages.get("headline_fresh", {})
    cached = stages.get("headline_cached", {})
    curve = [head] if "iters_per_sec_fresh_binning" in head else []
    for n in sorted(set(CURVE + [HEADLINE_N])):
        st = stages.get(f"curve_{n}")
        if st and "iters_per_sec_fresh_binning" in st:
            curve.append(st)
    curve.sort(key=lambda p: p.get("gaussians", 0))

    detail = {
        "resolution": f"{WIDTH}x{HEIGHT}",
        "gaussians": HEADLINE_N,
        "pairs": head.get("pairs"),
        "platform": stages.get("attach", {}).get("platform"),
        "rebin_interval": cached.get("rebin_interval"),
        "iters_per_sec_fresh_binning": head.get("iters_per_sec_fresh_binning"),
        "iters_per_sec_cached": cached.get("iters_per_sec_cached"),
        "scale_curve": curve,
        "legacy_200k": stages.get("legacy_200k"),
        "kitti": stages.get("kitti"),
        "bench_wall_s": round(time.time() - t0, 1),
        "stages_completed": sorted(
            k for k, v in stages.items()
            if "error" not in v and "skipped" not in v
        ),
    }
    errors = {k: v["error"] for k, v in stages.items() if "error" in v}
    if errors:
        detail["stage_errors"] = errors

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
    # full online loop incl. host ingest + compiles (reference trains 1
    # iter/frame online, src/gaussian_mapper.cpp:328-331)
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

    value = head.get("iters_per_sec_fresh_binning")
    if value is None:
        # headline did not complete — fall back to the largest completed
        # converged point so the line still carries a real measurement
        fallback = curve[-1] if curve else None
        if fallback:
            value = fallback["iters_per_sec_fresh_binning"]
            detail["headline_fallback"] = f"curve_{fallback['gaussians']}"
        else:
            value = 0.0
            detail["headline_fallback"] = "none_completed"
    payload = {
        # headline = converged-density 400k-gaussian scene, re-binned
        # every iteration (reference semantics — same work per step as
        # rasterizer_impl.cu:456-500); cached-cadence rate is in
        # detail.iters_per_sec_cached
        "metric": "render_backward_iters_per_sec_400k_converged_fresh_binning",
        "value": value,
        "unit": "it/s",
        "vs_baseline": round(value / A100_REFERENCE_ITERS_PER_SEC, 3),
        "detail": detail,
    }
    if partial_path is not None:
        try:
            partial_path.write_text(json.dumps(payload, indent=1) + "\n")
        except OSError:
            pass
    print(json.dumps(payload))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=0,
                    help="measure the N-device view-parallel mesh mode")
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--out", default="", help=argparse.SUPPRESS)
    ap.add_argument("--deadline", type=float, default=0.0, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker:
        if args.mesh:
            run_worker_mesh(args.out, args.mesh)
        else:
            run_worker(args.out, args.deadline)
        return

    t0 = time.time()
    budget = float(os.environ.get("GSDF_BENCH_BUDGET", "540"))
    deadline = t0 + budget
    out_path = Path(tempfile.mkdtemp(prefix="gsdf_bench_")) / "stages.jsonl"
    partial = Path(__file__).parent / "BENCH_partial.json"

    cmd = [sys.executable, "-u", __file__, "--worker", "--out", str(out_path),
           "--deadline", str(deadline)]
    if args.mesh:
        cmd += ["--mesh", str(args.mesh)]

    def _spawn():
        return subprocess.Popen(cmd, stdout=sys.stderr, stderr=sys.stderr)

    proc = _spawn()

    done = {"v": False}

    def _finalize(signum=None, frame=None):
        if done["v"]:
            return
        done["v"] = True
        try:
            proc.terminate()
        except OSError:
            pass
        emit(collect(out_path), t0, partial)
        # do not wait for a possibly-hung worker: the line is out, leave
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, _finalize)
    signal.signal(signal.SIGINT, _finalize)

    # Attach watchdog: the relay's first device->host transfer has been
    # observed to hang FOREVER in one process while a fresh process works
    # fine (a per-process wedged channel). The worker records an "attach"
    # stage right after its first tiny transfer; if that line hasn't
    # appeared within GSDF_BENCH_ATTACH_TIMEOUT (and budget allows), kill
    # and respawn the worker once.
    attach_timeout = float(os.environ.get("GSDF_BENCH_ATTACH_TIMEOUT", "150"))
    respawns_left = 3
    spawn_t = time.time()
    while time.time() < deadline:
        if proc.poll() is not None:
            break
        if (
            respawns_left > 0
            and time.time() - spawn_t > attach_timeout
            and deadline - time.time() > 60
            and "attach" not in collect(out_path)
        ):
            print("[bench] worker attach stalled; respawning", file=sys.stderr)
            proc.kill()
            proc = _spawn()
            respawns_left -= 1
            spawn_t = time.time()
        time.sleep(1.0)
    if proc.poll() is None:
        proc.terminate()
        try:
            proc.wait(timeout=5)
        except subprocess.TimeoutExpired:
            proc.kill()
    _finalize()


if __name__ == "__main__":
    main()
