"""Probe: cached-binning step rate vs fresh, same scene as bench.py."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from gsdf_slam_tpu.config import OptimizationParams
from gsdf_slam_tpu.engine import train_step
from gsdf_slam_tpu.ops import CameraMatrices, RasterizeConfig

state, adam = bench.build_scene()
fovx = 2 * np.arctan(bench.WIDTH / (2 * 600.0))
fovy = 2 * np.arctan(bench.HEIGHT / (2 * 600.0))
cam = CameraMatrices.from_pose(np.array([1.0, 0, 0, 0]), np.zeros(3), fovx, fovy)
cfg = RasterizeConfig(
    height=bench.HEIGHT, width=bench.WIDTH, max_pairs=bench.MAX_PAIRS,
    chunk=bench.CHUNK,
)
opt = OptimizationParams()
rng = np.random.default_rng(1)
gt = jnp.asarray(rng.uniform(0, 1, (bench.HEIGHT, bench.WIDTH, 3)).astype(np.float32))
bg = jnp.zeros(3)


def fresh(s, a, it):
    return train_step(s, a, cam, gt, None, bg, jnp.int32(it), jnp.float32(1.0), cfg, opt)


def export(s, a, it):
    return train_step(
        s, a, cam, gt, None, bg, jnp.int32(it), jnp.float32(1.0), cfg, opt,
        export_binning_cache=True,
    )


def cached(s, a, it, c):
    return train_step(
        s, a, cam, gt, None, bg, jnp.int32(it), jnp.float32(1.0), cfg, opt,
        binning_cache=c,
    )


s, a = state, adam
for i in range(2):
    s, a, m = fresh(s, a, i + 1)
s, a, m, c = export(s, a, 3)
s, a, m = cached(s, a, 4, c)
jax.block_until_ready((s.xyz,))
print("compiled; pairs =", int(m.total_pairs))

N = 20
t0 = time.perf_counter()
for i in range(N):
    s, a, m = fresh(s, a, i + 10)
jax.block_until_ready((s.xyz,))
float(m.loss)
dt_fresh = time.perf_counter() - t0

t0 = time.perf_counter()
for i in range(N):
    s, a, m = cached(s, a, i + 40, c)
jax.block_until_ready((s.xyz,))
float(m.loss)
dt_cached = time.perf_counter() - t0

t0 = time.perf_counter()
for i in range(N):
    s, a, m, c = export(s, a, i + 70)
jax.block_until_ready((s.xyz,))
float(m.loss)
dt_export = time.perf_counter() - t0

print(f"fresh : {N/dt_fresh:.2f} it/s")
print(f"cached: {N/dt_cached:.2f} it/s")
print(f"export: {N/dt_export:.2f} it/s")
for k in (2, 3, 4, 8):
    mix = (dt_export / N + (k - 1) * dt_cached / N) / k
    print(f"rebin_interval={k}: {1/mix:.2f} it/s")
