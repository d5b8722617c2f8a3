#!/usr/bin/env python3
"""KITTI streaming LiDAR+camera mapping (demo/train_kitti.cpp equivalent).

The reference hardcodes its dataset/config paths (train_kitti.cpp:64-68,
argv parsing commented out); this entry point takes them properly:

    python demo/train_kitti.py <dataset_dir> [--config cfg.yaml]
        [--output results/kitti] [--viewer] [--sky-mask mask.png]
        [--max-frames N]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", help="KITTI odometry sequence dir (calib.txt, poses.txt, image_2/, velodyne/)")
    ap.add_argument(
        "--dataset-type", default="kitti", choices=["kitti", "spires"],
        help="loader dispatch (the reference's train_kitti hardcodes Spires=5, "
        "data_loader.cpp:32-43; both LiDAR+camera types stream identically)",
    )
    ap.add_argument("--config", default=None, help="gaussian_mapper YAML (cv::FileStorage style)")
    ap.add_argument("--output", default="results/kitti")
    ap.add_argument("--viewer", action="store_true", help="serve the web viewer on :8090")
    ap.add_argument("--sky-mask", default=None, help="precomputed sky mask png (white = sky)")
    ap.add_argument("--skyseg-onnx", default=None, help="sky-segmentation ONNX model for live per-frame masking")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--capacity", type=int, default=1 << 19)
    ap.add_argument("--max-pairs", type=int, default=1 << 20)
    args = ap.parse_args()

    import numpy as np

    from gsdf_slam_tpu.data import DataLoader
    from gsdf_slam_tpu.engine import GaussianMapper, MapperSettings

    settings = (
        MapperSettings.from_yaml(args.config) if args.config else MapperSettings()
    )
    if args.skyseg_onnx:
        import dataclasses

        settings = dataclasses.replace(settings, skyseg_onnx_path=args.skyseg_onnx)
    sky = None
    if args.sky_mask:
        import cv2

        sky = cv2.imread(args.sky_mask, cv2.IMREAD_GRAYSCALE) > 32

    loader = DataLoader(args.dataset, args.dataset_type)
    mapper = GaussianMapper(
        settings=settings,
        dataloader=loader,
        result_dir=args.output,
        capacity=args.capacity,
        max_pairs=args.max_pairs,
        sky_mask=sky,
    )
    if args.viewer:
        from gsdf_slam_tpu.viewer import ViewerServer

        ViewerServer(mapper).start()
        print("viewer at http://localhost:8090")

    n = len(loader) if args.max_frames is None else min(args.max_frames, len(loader))
    t0 = time.time()
    for i in range(n):
        frame = loader.get_item(i)
        mapper.ingest_frame(i, frame)
        m = mapper.train_for_one_iteration()
        if i % 10 == 0 and m:
            dt = time.time() - t0
            print(
                f"frame {i + 1}/{n} loss {m['loss']:.4f} points {m['count']} "
                f"pairs {m['total_pairs']} ({(i + 1) / dt:.2f} fps)"
            )
    ply = mapper.save_ply()
    print("saved", ply)


if __name__ == "__main__":
    main()
