#!/usr/bin/env python3
"""TUM monocular SLAM-mode mapping (BASELINE config #3; the reference's
scripts/tum_mono.sh operating mode, SURVEY.md §3.6).

The tracker is stood in by ground-truth poses (the reference got poses from
ORB-SLAM3); keyframes are fed image-only, so geometry growth comes from the
monocular inactive-geo densify path (depth cache + rendered-depth
propagation) and the per-camera undistorter handles fr1/fr2 distortion.

    python demo/train_tum_mono.py <seq_dir> [--family fr1]
        [--frame-stride 15] [--extra-iterations 2000] [--output results/tum]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence", help="TUM sequence dir (rgb.txt, groundtruth.txt)")
    ap.add_argument("--family", default="fr1", choices=["fr1", "fr2", "fr3"])
    ap.add_argument("--frame-stride", type=int, default=15)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--extra-iterations", type=int, default=2000)
    ap.add_argument("--output", default="results/tum_mono")
    ap.add_argument("--capacity", type=int, default=1 << 18)
    ap.add_argument("--viewer", action="store_true")
    args = ap.parse_args()

    import cv2
    import numpy as np

    from gsdf_slam_tpu.config import OptimizationParams
    from gsdf_slam_tpu.data.tum import TUM_INTRINSICS, TumParser
    from gsdf_slam_tpu.engine import GaussianMapper, MapperSettings

    parser = TumParser(args.sequence, family=args.family)
    fr = parser.frames()
    intr = TUM_INTRINSICS[args.family]

    # tum_mono schedule (cfg/gaussian_mapper/Monocular/TUM/*.yaml): densify
    # interval 100, times-of-use 2, inactive-geo densify with depth cache 10
    settings = MapperSettings(
        opt=OptimizationParams(
            densification_interval=100,
            densify_until_iter=15_000,
            opacity_reset_interval=3_000,
        ),
        new_keyframe_times_of_use=2,
        do_inactive_geo_densify=True,
        max_depth_cached=10,
        stable_num_iter_existence=1,
        large_rotation_threshold=30.0,
        large_translation_threshold=1.0,
    )
    mapper = GaussianMapper(
        settings=settings, result_dir=args.output, capacity=args.capacity
    )
    if args.viewer:
        from gsdf_slam_tpu.viewer import ViewerServer

        ViewerServer(mapper).start()

    idx = list(range(0, len(fr.color_files), args.frame_stride))
    if args.max_frames:
        idx = idx[: args.max_frames]
    t0 = time.time()
    for n, i in enumerate(idx):
        img = cv2.cvtColor(cv2.imread(str(fr.color_files[i])), cv2.COLOR_BGR2RGB)
        image = img.astype(np.float32) / 255.0
        mapper.feed_keyframe(
            i, fr.color_poses[i].astype(np.float32), image, intrinsics=intr
        )
        out = mapper.train_for_one_iteration()
        if out and n % 20 == 0:
            print(
                f"kf {n}/{len(idx)}: loss {out['loss']:.4f} "
                f"points {out['count']}"
            )
    for _ in range(args.extra_iterations):
        out = mapper.train_for_one_iteration()
        if out and mapper.iteration % 500 == 0:
            print(
                f"iter {mapper.iteration}: loss {out['loss']:.4f} "
                f"psnr {out['psnr']:.2f} points {out['count']}"
            )
    print(f"done in {time.time() - t0:.1f}s; saving results")
    print("wrote", mapper.save_ply())


if __name__ == "__main__":
    main()
