#!/usr/bin/env python3
"""Data-plane smoke test (demo/test_dataloader.cpp equivalent; BASELINE #1).

Parses a dataset, ingests frames, colorizes clouds, and reports stats —
asserted, unlike the reference's visual-only PCL/imshow loop
(test_dataloader.cpp:45-65). Optionally dumps colorized clouds as PLY.

    python demo/test_dataloader.py <dataset> --type kitti|replica|tum|spires
        [--frames 5] [--dump-ply out.ply]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--type", required=True, choices=["kitti", "replica", "tum", "spires"])
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--dump-ply", default=None)
    args = ap.parse_args()

    import numpy as np

    from gsdf_slam_tpu.data import DataLoader

    loader = DataLoader(args.dataset, args.type)
    print(f"dataset: {len(loader)} frames, intrinsics {loader.frames.intrinsics}")
    n = min(args.frames, len(loader))
    all_pts, all_cols = [], []
    for i in range(n):
        fr = loader.get_item(i)
        assert np.isfinite(fr.points).all(), f"frame {i}: non-finite points"
        assert fr.points.shape == fr.colors.shape
        assert 0.0 <= fr.colors.min() and fr.colors.max() <= 1.0
        print(
            f"frame {i}: {len(fr.points)} colorized points, "
            f"image {fr.image.shape}, cam t {fr.cam_pose[:3, 3].round(2)}"
        )
        all_pts.append(fr.points)
        all_cols.append(fr.colors)
    if args.dump_ply:
        from gsdf_slam_tpu.io import write_ply

        p = np.concatenate(all_pts)
        c = np.concatenate(all_cols)
        write_ply(
            args.dump_ply,
            {"x": p[:, 0], "y": p[:, 1], "z": p[:, 2],
             "red": c[:, 0], "green": c[:, 1], "blue": c[:, 2]},
        )
        print("wrote", args.dump_ply)
    print("OK")


if __name__ == "__main__":
    main()
