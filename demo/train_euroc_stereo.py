#!/usr/bin/env python3
"""EuRoC stereo SLAM-mode mapping with a live render/eval loop (BASELINE
config #4; the reference's scripts/euroc_stereo.sh operating mode).

The tracker is stood in by EuRoC ground-truth poses (the reference got
poses from ORB-SLAM3 stereo, gaussian_mapper.h:255-256); per frame the
loader rectifies the cam0/cam1 pair, runs SGBM stereo depth, and
backprojects a colorized world-frame cloud (data/euroc.py) that seeds the
map — the stereo analog of the reference's `stereo_vision_` path. Training
follows the streaming regime (1 iteration per ingested keyframe,
gaussian_mapper.cpp:328-331), with the periodic render/eval pass the
reference ran through its viewer/Record.* hooks done headlessly here:
every --eval-interval keyframes the current pose is re-rendered via
renderFromPose (gaussian_mapper.cpp:608-657) and scored against the live
camera image (PSNR, include/loss_utils.h:41-47).

    python demo/train_euroc_stereo.py <seq_dir>  # MH_01_easy (mav0 layout)
        [--config cfg/gaussian_mapper/Stereo/EuRoC/EuRoC.yaml]
        [--frame-stride 10] [--extra-iterations 2000]
        [--eval-interval 25] [--output results/euroc_stereo]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence", help="EuRoC sequence dir containing mav0/")
    ap.add_argument(
        "--config",
        default=str(REPO / "cfg/gaussian_mapper/Stereo/EuRoC/EuRoC.yaml"),
        help="mapper yaml (the reference's Stereo/EuRoC profile)",
    )
    ap.add_argument("--frame-stride", type=int, default=10)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--extra-iterations", type=int, default=2000)
    ap.add_argument("--eval-interval", type=int, default=25,
                    help="live render/eval every N keyframes (0 disables)")
    ap.add_argument("--cloud-stride", type=int, default=4,
                    help="SGBM cloud subsampling at ingest")
    ap.add_argument("--output", default="results/euroc_stereo")
    ap.add_argument("--capacity", type=int, default=1 << 18)
    ap.add_argument("--viewer", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from gsdf_slam_tpu.data import DataLoader
    from gsdf_slam_tpu.engine import GaussianMapper, MapperSettings
    from gsdf_slam_tpu.ops.losses import psnr_gaussian_splatting

    settings = MapperSettings.from_yaml(args.config)
    loader = DataLoader(args.sequence, "euroc", cloud_stride=args.cloud_stride)
    mapper = GaussianMapper(
        settings=settings, result_dir=args.output, capacity=args.capacity
    )
    if args.viewer:
        from gsdf_slam_tpu.viewer import ViewerServer

        ViewerServer(mapper).start()

    idx = list(range(0, len(loader), args.frame_stride))
    if args.max_frames:
        idx = idx[: args.max_frames]
    intr = loader.frames.intrinsics
    evals = []
    t0 = time.time()
    for n, i in enumerate(idx):
        fr = loader.get_item(i)
        mapper.feed_keyframe(
            i, fr.cam_pose.astype(np.float32), fr.image,
            points=fr.points, colors=fr.colors, intrinsics=intr,
        )
        out = mapper.train_for_one_iteration()
        if out and n % 20 == 0:
            print(
                f"kf {n}/{len(idx)}: loss {out['loss']:.4f} "
                f"points {out['count']}"
            )
        if args.eval_interval and n % args.eval_interval == 0:
            # live rendering/eval: renderFromPose of the newest keyframe,
            # scored against the live camera image
            h, w = fr.image.shape[:2]
            img = mapper.render_from_pose(
                np.linalg.inv(fr.cam_pose.astype(np.float64)).astype(
                    np.float32
                ),
                w, h,
            )
            p = float(psnr_gaussian_splatting(img, fr.image))
            evals.append({
                "keyframe": i, "iteration": mapper.iteration,
                "psnr_db": round(p, 2), "gaussians": int(mapper.state.count),
                "wall_s": round(time.time() - t0, 1),
            })
            print(
                f"  [eval] kf {i} iter {mapper.iteration}: "
                f"{p:.2f} dB, {int(mapper.state.count)} gaussians"
            )
    for _ in range(args.extra_iterations):
        out = mapper.train_for_one_iteration()
        if out and mapper.iteration % 500 == 0:
            print(
                f"iter {mapper.iteration}: loss {out['loss']:.4f} "
                f"psnr {out['psnr']:.2f} points {out['count']}"
            )
    print(f"done in {time.time() - t0:.1f}s; saving results")
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    if evals:
        (out_dir / "live_eval.json").write_text(
            json.dumps(evals, indent=1) + "\n"
        )
        print(f"wrote {out_dir / 'live_eval.json'} ({len(evals)} evals)")
    print("wrote", mapper.save_ply())


if __name__ == "__main__":
    main()
