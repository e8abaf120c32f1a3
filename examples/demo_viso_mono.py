"""Monocular VO demo (equivalent of reference matlab/demo_viso_mono.m).

Runs mono visual odometry over a synthetic sequence (or an image directory),
prints per-frame stats, plots the trajectory.

Usage: python examples/demo_viso_mono.py [image_dir] [--frames N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image_dir", nargs="?", default=None)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--out", default="demo_mono_trajectory.png")
    args = ap.parse_args()

    from sfm_tpu.config import Bucketing, Calibration, MonoParams
    from sfm_tpu.models.mono import VisualOdometryMono
    from sfm_tpu.utils.kitti import poses_from_motions
    from sfm_tpu.utils.viz import plot_trajectories

    if args.image_dir:
        from sfm_tpu.utils.io import ImageSequenceLoader

        video = ImageSequenceLoader(args.image_dir)
        frames = [video.get_frame(i)
                  for i in range(min(args.frames, video.n_frames))]
        calib = Calibration(f=645.2, cu=635.9, cv=194.1)
        gt_poses = None
        w, h = video.get_dims()
    else:
        from sfm_tpu.utils.synthetic import SceneConfig, make_sequence

        cfg = SceneConfig()
        frames, gt = make_sequence(args.frames, cfg, step=0.8)
        gt_poses = [np.linalg.inv(T) for T in gt]  # cam->world
        calib = Calibration(f=cfg.f, cu=cfg.cu, cv=cfg.cv)
        h, w = frames[0].shape

    # demo parameter setup mirrors matlab/demo_viso_mono.m (height/pitch)
    params = MonoParams(calib=calib, height=1.6, pitch=0.0,
                        bucket=Bucketing(max_features=1000))
    vo = VisualOdometryMono(params, dims=(w, h))

    motions = []
    replace = False
    for i, img in enumerate(frames):
        ok = vo.process(img, replace=replace)
        replace = not ok and i > 0  # keep older keyframe on failure
        motions.append(vo.get_motion().copy())
        if i:
            nm = vo.get_number_of_matches()
            ni = vo.get_number_of_inliers()
            print(f"frame {i}: ok={ok} matches={nm} "
                  f"inliers={100.0 * ni / max(nm, 1):.1f}%")

    est = poses_from_motions(motions[1:])
    named = {"estimated": est}
    if gt_poses is not None:
        named["ground truth"] = np.stack(gt_poses)
    plot_trajectories(args.out, named, "mono VO trajectory")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
