"""SfM demo: mono VO + multi-frame reconstruction + PLY export
(equivalent of reference matlab/demo_structure_from_motion.m and the C++
sfm app main.cpp).

Usage: python examples/demo_structure_from_motion.py [--frames N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--ply", default="demo_points.ply")
    ap.add_argument("--viz", default="demo_points.png")
    args = ap.parse_args()

    from sfm_tpu.config import Bucketing, Calibration, MonoParams
    from sfm_tpu.models.sfm import StructureFromMotion
    from sfm_tpu.utils.ply import export_ply
    from sfm_tpu.utils.synthetic import SceneConfig, make_sequence
    from sfm_tpu.utils.viz import plot_point_cloud

    cfg = SceneConfig()
    frames, gt = make_sequence(args.frames, cfg, step=0.8)
    params = MonoParams(
        calib=Calibration(f=cfg.f, cu=cfg.cu, cv=cfg.cv),
        height=1.6, pitch=0.0, bucket=Bucketing(max_features=1000))
    h, w = frames[0].shape
    sfm = StructureFromMotion(params, dims=(w, h), verbose=False)

    traj = []
    for i, img in enumerate(frames):
        ok = sfm.update(img)
        pose = np.linalg.inv(sfm.get_pose())  # camera in first-frame coords
        traj.append(pose[:3, 3])
        print(f"frame {i}: ok={ok} points={len(sfm.get_points())}")

    pts = sfm.get_points()
    print(f"reconstructed {len(pts)} points")
    export_ply(pts, args.ply)
    # points are in current-camera coords; re-express in first-frame coords
    T = np.linalg.inv(sfm.get_pose())
    pts_w = (T[:3, :3] @ pts.T + T[:3, 3:4]).T if len(pts) else pts
    plot_point_cloud(pts_w, args.viz, trajectory=np.array(traj),
                     title=f"SfM: {len(pts)} points")
    print(f"wrote {args.ply} and {args.viz}")


if __name__ == "__main__":
    main()
