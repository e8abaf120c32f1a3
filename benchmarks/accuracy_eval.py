"""Trajectory accuracy evaluation on the shared synthetic sequence.

Runs the fused stereo + mono pipelines over the benchmark frames, integrates
poses, and reports the KITTI metric vs ground truth. If the reference C++
benchmark has been run with its POSE output saved (see
reference_baseline/run_ref.sh), its per-frame translations are compared too.

Usage: python benchmarks/accuracy_eval.py [n_frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def load(n):
    import benchmarks.gen_data as gen

    if not os.path.exists(os.path.join(gen.DATA, f"{n - 1:06d}_l.pgm")):
        gen.main(max(n, 50))
    left, right = [], []
    for i in range(n):
        for lst, s in ((left, "_l"), (right, "_r")):
            with open(os.path.join(gen.DATA, f"{i:06d}{s}.pgm"), "rb") as f:
                f.readline()
                w, h = map(int, f.readline().split())
                f.readline()
                lst.append(np.frombuffer(f.read(w * h), np.uint8).reshape(h, w))
    poses_wc = np.load(os.path.join(gen.DATA, "poses.npy"))  # world->cam
    gt = np.stack([np.linalg.inv(T) for T in poses_wc])      # cam->world
    return left, right, gt


def eval_stereo(left, right, gt):
    from sfm_tpu.config import Bucketing, Calibration, EngineConfig, StereoParams
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import make_stereo_frame_step
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix
    from sfm_tpu.utils.kitti import ate_rmse, kitti_errors, poses_from_motions

    h, w = left[0].shape
    params = StereoParams(calib=Calibration(f=645.2, cu=635.9, cv=194.1),
                          base=0.571, bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode="grid")
    step = make_stereo_frame_step(w, h, params, engine)
    p = params.match
    det = lambda img: detect_features(
        jnp.asarray(img), w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)
    pl_, pr_ = det(left[0]), det(right[0])
    key = jax.random.PRNGKey(0)
    motions = []
    n_fail = 0
    last = np.eye(4)
    for i in range(1, len(left)):
        key, k = jax.random.split(key)
        pl_, pr_, m, res = step(pl_, pr_, jnp.asarray(left[i]),
                                jnp.asarray(right[i]), jnp.asarray(last, jnp.float32), k)
        if bool(res.success):
            last = np.asarray(transformation_vector_to_matrix(res.tr))
        else:
            n_fail += 1
        motions.append(last.copy())
    est = poses_from_motions(motions)
    t_err, r_err, _ = kitti_errors(gt, est, step=3, lengths=(5, 10, 20, 30))
    ate = ate_rmse(gt, est)
    print(f"stereo: fails={n_fail}/{len(left)-1} "
          f"KITTI t_err={t_err:.2f}% r_err={r_err:.4f} deg/m ATE={ate:.3f} m")
    return t_err, ate


def eval_mono(left, gt):
    from sfm_tpu.config import Bucketing, Calibration, EngineConfig, MonoParams
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import make_mono_frame_step
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix
    from sfm_tpu.utils.kitti import ate_rmse, kitti_errors, poses_from_motions

    h, w = left[0].shape
    params = MonoParams(calib=Calibration(f=645.2, cu=635.9, cv=194.1),
                        height=1.6, pitch=0.0,
                        bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode="grid")
    step = make_mono_frame_step(w, h, params, engine)
    p = params.match
    det = lambda img: detect_features(
        jnp.asarray(img), w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)
    prev = det(left[0])
    key = jax.random.PRNGKey(0)
    motions = []
    n_fail = 0
    last = np.eye(4)
    for i in range(1, len(left)):
        key, k = jax.random.split(key)
        prev, m, res = step(prev, jnp.asarray(left[i]), k)
        if bool(res.success):
            last = np.asarray(transformation_vector_to_matrix(res.tr))
        else:
            n_fail += 1
        motions.append(last.copy())
    est = poses_from_motions(motions)
    t_err, r_err, _ = kitti_errors(gt, est, step=3, lengths=(5, 10, 20, 30))
    ate = ate_rmse(gt, est)
    tz = [m[2, 3] for m in motions]
    # standard mono practice: also report after global scale alignment
    from sfm_tpu.utils.kitti import scale_align

    est_s = scale_align(gt, est)
    t_err_s, r_err_s, _ = kitti_errors(gt, est_s, step=3,
                                       lengths=(5, 10, 20, 30))
    ate_s = ate_rmse(gt, est_s)
    print(f"mono: fails={n_fail}/{len(left)-1} "
          f"KITTI t_err={t_err:.2f}% r_err={r_err:.4f} deg/m ATE={ate:.3f} m "
          f"median t_z={np.median(tz):.3f} (gt -0.8) | scale-aligned: "
          f"t_err={t_err_s:.2f}% ATE={ate_s:.3f} m")
    return t_err, ate


def eval_reference(pose_file, gt):
    """Parse POSE lines from ref_bench stdout (translation only)."""
    from sfm_tpu.utils.kitti import ate_rmse, poses_from_motions

    if not os.path.exists(pose_file):
        print(f"(no reference pose file at {pose_file})")
        return
    tz = {}
    for line in open(pose_file):
        if line.startswith("POSE"):
            _, i, x, y, z = line.split()
            tz[int(i)] = (float(x), float(y), float(z))
    if not tz:
        return
    zs = [v[2] for v in tz.values()]
    print(f"reference: frames={len(tz)} median t_z={np.median(zs):.3f} (gt -0.8)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    left, right, gt = load(n)
    eval_stereo(left, right, gt)
    eval_mono(left, gt)
    eval_reference(os.path.join(os.path.dirname(__file__), "ref_poses.txt"), gt)
