#!/usr/bin/env python3
"""Replica room0 RGB-D offline mapping with known poses (BASELINE config #2).

Ingests every frame (depth-backprojected colorized cloud + keyframe), then
trains to `--iterations`, reporting PSNR/SSIM on held-out or training views.

    python demo/train_replica.py <scene_dir> [--iterations 30000]
        [--output results/replica_room0] [--eval-every 1000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", help="Replica scene dir (traj.txt, results/)")
    ap.add_argument("--iterations", type=int, default=30_000)
    ap.add_argument("--output", default="results/replica")
    ap.add_argument("--frame-stride", type=int, default=10, help="keyframe every Nth frame")
    ap.add_argument("--cloud-stride", type=int, default=8)
    ap.add_argument("--eval-every", type=int, default=2000)
    ap.add_argument("--capacity", type=int, default=1 << 19)
    ap.add_argument("--max-pairs", type=int, default=1 << 21)
    ap.add_argument("--checkpoint-every", type=int, default=0)
    ap.add_argument("--viewer", action="store_true")
    ap.add_argument(
        "--mesh", type=int, default=0, metavar="N",
        help="multi-chip mode: training over an N-device jax mesh. "
        "0 = single device.",
    )
    ap.add_argument(
        "--mesh-axis", choices=("view", "tile", "view_tile"), default="view",
        help="mesh parallelism axis: 'view' batches N keyframes per "
        "iteration (throughput; parallel/sharding.py), 'tile' keeps the "
        "1-view schedule and splits each render into tile-row bands "
        "(latency; parallel/tile_sharding.py), 'view_tile' composes both "
        "on a 2-D mesh — set --mesh-bands for the tile-axis size "
        "(parallel/view_tile_sharding.py)",
    )
    ap.add_argument(
        "--mesh-bands", type=int, default=2, metavar="B",
        help="with --mesh-axis view_tile: tile-axis size; the mesh is "
        "(N//B views) x (B bands)",
    )
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from gsdf_slam_tpu.config import OptimizationParams
    from gsdf_slam_tpu.data import DataLoader
    from gsdf_slam_tpu.engine import GaussianMapper, MapperSettings
    from gsdf_slam_tpu.ops.losses import psnr, ssim

    settings = MapperSettings(
        opt=OptimizationParams(),
        new_keyframe_times_of_use=8,
    )
    mesh = None
    if args.mesh:
        import jax
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < args.mesh:
            raise SystemExit(
                f"--mesh {args.mesh} needs {args.mesh} devices, have "
                f"{len(devs)} (for a virtual CPU mesh set "
                f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_"
                f"device_count={args.mesh})"
            )
        if args.mesh_axis == "view_tile":
            from gsdf_slam_tpu.parallel import make_view_tile_mesh

            if args.mesh % args.mesh_bands:
                raise SystemExit(
                    f"--mesh {args.mesh} is not divisible by --mesh-bands "
                    f"{args.mesh_bands}"
                )
            nv = args.mesh // args.mesh_bands
            mesh = make_view_tile_mesh(nv, args.mesh_bands, devs)
            kind = f"view x tile ({nv} views x {args.mesh_bands} bands)"
        else:
            mesh = Mesh(np.array(devs[: args.mesh]), ("dp",))
            kind = (
                "view-parallel" if args.mesh_axis == "view"
                else "tile-sharded (band-parallel)"
            )
        print(f"mesh mode: {args.mesh}-device {kind} training")

    loader = DataLoader(args.scene, "replica", cloud_stride=args.cloud_stride)
    mapper = GaussianMapper(
        settings=settings,
        dataloader=loader,
        result_dir=args.output,
        capacity=args.capacity,
        max_pairs=args.max_pairs,
        mesh=mesh,
        mesh_axis=args.mesh_axis,
    )
    if args.viewer:
        from gsdf_slam_tpu.viewer import ViewerServer

        ViewerServer(mapper).start()
        print("viewer at http://localhost:8090")

    frames = list(range(0, len(loader), args.frame_stride))
    print(f"ingesting {len(frames)} keyframes of {len(loader)} frames")
    for i in frames:
        mapper.ingest_frame(i, loader.get_item(i))
        mapper.train_for_one_iteration()

    t0 = time.time()
    start_iter = mapper.iteration
    while mapper.iteration < args.iterations:
        m = mapper.train_for_one_iteration()
        it = mapper.iteration
        if it % args.eval_every == 0:
            kf = next(iter(mapper.scene.keyframes.values()))
            img = mapper.render_from_pose(
                kf.t_cw, kf.camera.width, kf.camera.height,
                kf.camera.fovx, kf.camera.fovy,
            )
            p = float(psnr(jnp.asarray(img), jnp.asarray(kf.image)))
            s = float(ssim(jnp.asarray(img), jnp.asarray(kf.image)))
            ips = (it - start_iter) / (time.time() - t0)
            print(
                f"iter {it}: loss {m['loss']:.4f} psnr {p:.2f} ssim {s:.4f} "
                f"points {m['count']} ({ips:.1f} it/s)"
            )
        if args.checkpoint_every and it % args.checkpoint_every == 0:
            mapper.save_checkpoint(Path(args.output) / f"ckpt_{it}.npz")
    ply = mapper.save_ply()
    print("saved", ply)


if __name__ == "__main__":
    main()
