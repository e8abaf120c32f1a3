"""One-command KITTI odometry evaluation (runs when real data is present).

    python benchmarks/kitti_eval.py --root /data/kitti_odometry --seq 00 \
        [--n 200] [--mono]

Loads the official layout (sequences/NN/image_0|1 + calib.txt + poses/NN.txt,
sfm_tpu/utils/kitti.py), runs the fused stereo (or mono) VO pipeline over the
frames, and prints the official KITTI segment metric (t_err %, r_err deg/m)
plus ATE against ground truth. No KITTI data ships in this environment; the
ingest path is smoke-tested on a fabricated 3-frame tree in
tests/test_kitti_ingest.py.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--seq", default="00")
    ap.add_argument("--n", type=int, default=0, help="frame cap (0 = all)")
    ap.add_argument("--mono", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                MonoParams, StereoParams)
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import (make_mono_frame_step,
                                         make_stereo_frame_step)
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix
    from sfm_tpu.utils import kitti

    seq = kitti.load_sequence(args.root, args.seq)
    left, right = seq.loaders()
    w, h = left.get_dims()
    n = left.n_frames if args.n == 0 else min(args.n, left.n_frames)
    print(f"seq {args.seq}: {n} frames {w}x{h} f={seq.f:.1f} "
          f"base={seq.base:.3f}", flush=True)

    engine = EngineConfig()
    cal = Calibration(f=seq.f, cu=seq.cu, cv=seq.cv)
    p = None
    if args.mono or right is None:
        params = MonoParams(calib=cal, height=1.65, pitch=-0.08,
                            bucket=Bucketing(max_features=1000))
        step = make_mono_frame_step(w, h, params, engine)
    else:
        params = StereoParams(calib=cal, base=seq.base,
                              bucket=Bucketing(max_features=1000))
        step = make_stereo_frame_step(w, h, params, engine)
    mp = params.match

    def detect(img):
        return detect_features(
            jnp.asarray(img), w=w, h=h, nms_n=mp.nms_n, nms_tau=mp.nms_tau,
            multi_stage=mp.multi_stage, half_resolution=mp.half_resolution,
            cap_sparse=engine.max_features_sparse,
            cap_dense=engine.max_features_dense)

    key = jax.random.PRNGKey(0)
    motions = []
    last = np.eye(4)
    t0 = time.perf_counter()
    if args.mono or right is None:
        prev = detect(left.get_frame(0))
        for i in range(1, n):
            key, k = jax.random.split(key)
            prev, _, res = step(prev, jnp.asarray(left.get_frame(i)), k)
            if bool(res.success):
                last = np.asarray(transformation_vector_to_matrix(res.tr))
            motions.append(last.copy())
    else:
        pl_, pr_ = detect(left.get_frame(0)), detect(right.get_frame(0))
        trp = jnp.eye(4, dtype=jnp.float32)
        for i in range(1, n):
            key, k = jax.random.split(key)
            pl_, pr_, _, res = step(pl_, pr_, jnp.asarray(left.get_frame(i)),
                                    jnp.asarray(right.get_frame(i)), trp, k)
            if bool(res.success):
                last = np.asarray(transformation_vector_to_matrix(res.tr))
                trp = jnp.asarray(last, jnp.float32)
            motions.append(last.copy())
    dt = time.perf_counter() - t0
    print(f"{(n - 1) / dt:.2f} fps end-to-end (incl. decode)", flush=True)

    est = kitti.poses_from_motions(motions)
    if seq.poses_gt is not None:
        gt = seq.poses_gt[:len(est)]
        if args.mono or right is None:
            est = kitti.scale_align(gt, est)
        t_err, r_err, _ = kitti.kitti_errors(gt, est)
        print(f"KITTI metric: t_err {t_err:.2f}%  r_err {r_err:.4f} deg/m  "
              f"ATE {kitti.ate_rmse(gt, est):.2f} m", flush=True)
    else:
        print("no ground-truth poses; trajectory only", flush=True)
    out = f"kitti_{args.seq}_traj.txt"
    np.savetxt(out, est[:, :3, :].reshape(len(est), 12))
    print(f"trajectory -> {out}", flush=True)


if __name__ == "__main__":
    main()
