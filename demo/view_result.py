#!/usr/bin/env python3
"""Offline viewing of a trained model (demo/view_result.cpp equivalent).

Loads a 3DGS-format PLY (ours or any standard 3DGS checkpoint) and serves
the web viewer; optionally dumps renders along the recorded trajectory.

    python demo/view_result.py <point_cloud.ply> [--port 8090]
        [--dump-poses traj.txt --dump-dir renders/ --width 1200 --height 680]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ply")
    ap.add_argument("--port", type=int, default=8090)
    ap.add_argument("--dump-poses", default=None, help="pose file (16-per-line T_W_C) to render")
    ap.add_argument("--dump-dir", default="renders")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    args = ap.parse_args()

    import numpy as np

    from gsdf_slam_tpu.engine import GaussianMapper

    mapper = GaussianMapper()
    mapper.load_ply(args.ply)
    print(f"loaded {int(mapper.state.count)} gaussians from {args.ply}")

    if args.dump_poses:
        import cv2

        from gsdf_slam_tpu.data import load_poses

        poses, _ = load_poses(args.dump_poses, pose_type=1)
        out = Path(args.dump_dir)
        out.mkdir(parents=True, exist_ok=True)
        for i, t_wc in enumerate(poses):
            t_cw = np.linalg.inv(t_wc.astype(np.float64)).astype(np.float32)
            img = mapper.render_from_pose(t_cw, args.width, args.height)
            cv2.imwrite(
                str(out / f"{i:06d}.png"),
                cv2.cvtColor((np.clip(img, 0, 1) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
            )
        print(f"dumped {len(poses)} renders to {out}")
        return

    from gsdf_slam_tpu.viewer import ViewerServer

    ViewerServer(mapper, port=args.port).start()
    print(f"viewer at http://localhost:{args.port} — ctrl-c to quit")
    while True:
        time.sleep(3600)


if __name__ == "__main__":
    main()
