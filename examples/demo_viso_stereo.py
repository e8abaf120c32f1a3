"""Stereo VO demo (equivalent of reference matlab/demo_viso_stereo.m).

Usage: python examples/demo_viso_stereo.py [--frames N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--out", default="demo_stereo_trajectory.png")
    args = ap.parse_args()

    from sfm_tpu.config import Bucketing, Calibration, StereoParams
    from sfm_tpu.models.stereo import VisualOdometryStereo
    from sfm_tpu.utils.kitti import kitti_errors, poses_from_motions
    from sfm_tpu.utils.synthetic import SceneConfig, make_sequence
    from sfm_tpu.utils.viz import plot_trajectories

    cfg = SceneConfig()
    left, right, gt = make_sequence(args.frames, cfg, step=0.8, baseline=0.571)
    gt_poses = np.stack([np.linalg.inv(T) for T in gt])

    # calibration mirrors matlab/demo_viso_stereo.m:9-12
    params = StereoParams(
        calib=Calibration(f=cfg.f, cu=cfg.cu, cv=cfg.cv), base=0.571,
        bucket=Bucketing(max_features=1000))
    h, w = left[0].shape
    vo = VisualOdometryStereo(params, dims=(w, h))

    motions = []
    replace = False
    for i in range(args.frames):
        ok = vo.process(left[i], right[i], replace=replace)
        replace = not ok and i > 0
        motions.append(vo.get_motion().copy())
        if i:
            nm = vo.get_number_of_matches()
            ni = vo.get_number_of_inliers()
            print(f"frame {i}: ok={ok} matches={nm} "
                  f"inliers={100.0 * ni / max(nm, 1):.1f}%")

    est = poses_from_motions(motions[1:])
    t_err = np.linalg.norm(est[-1, :3, 3] - gt_poses[len(est) - 1, :3, 3])
    print(f"final position error: {t_err:.3f} m over "
          f"{0.8 * (len(est) - 1):.1f} m driven")
    plot_trajectories(args.out, {"estimated": est, "ground truth": gt_poses},
                      "stereo VO trajectory")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
