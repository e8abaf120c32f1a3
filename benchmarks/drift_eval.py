"""Long-sequence f32 drift evaluation (VERDICT round-1 weak item 8).

The engine chains per-frame f32 Tr_delta estimates into a pose; the
reference chains f64. This runs BOTH on the same 300-frame synthetic
forward sequence and quantifies pose-chain drift vs horizon:

  * KITTI segment translation error at lengths 10..200 m,
  * ATE of the prefix trajectory at 50/100/200/300 frames,

for the reference stereo VO (f64) and our fused stereo step (f32, grid
outlier mode). If the f32 curve tracks the f64 curve (no superlinear
blow-up), single-precision geometry is validated for long sequences.

Writes benchmarks/drift_eval.json.
Usage: python benchmarks/drift_eval.py [n_frames]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import accuracy_eval as ae

HERE = os.path.dirname(os.path.abspath(__file__))


def horizon_metrics(gt_wc, motions):
    from sfm_tpu.utils.kitti import ate_rmse, kitti_errors, poses_from_motions

    gt = np.stack([np.linalg.inv(T) for T in gt_wc])
    est = poses_from_motions(motions)
    out = {"seg_t_err_pct": {}, "ate_prefix_m": {}}
    for L in (10, 20, 50, 100, 200):
        t_err, _, n_seg = kitti_errors(gt, est, step=3, lengths=(L,))
        if n_seg:
            out["seg_t_err_pct"][str(L)] = round(t_err, 3)
    for k in (50, 100, 200, len(est)):
        out["ate_prefix_m"][str(k)] = round(ate_rmse(gt[:k], est[:k]), 4)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    left, right, poses, d = ae.scene_data("forward", n)
    print(f"scene forward x {n} frames @ {d}", flush=True)

    rec = {"n_frames": n}

    # reference f64 stereo on the same frames
    m_ref = ae.run_reference("stereo", d, n, poses)
    rows = np.loadtxt(os.path.join(d, "ref_stereo", "vo.txt"))
    motions, last = [], np.eye(4)
    for r in rows[1:]:
        if r[1] > 0.5:
            last = np.eye(4)
            last[:3, :] = r[4:16].reshape(3, 4)
        motions.append(last.copy())
    rec["reference_f64"] = {**m_ref, **horizon_metrics(poses, motions)}
    print("ref f64:", rec["reference_f64"], flush=True)

    # ours f32 fused
    import jax
    import jax.numpy as jnp

    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                StereoParams)
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import make_stereo_frame_step
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix

    params = StereoParams(calib=Calibration(f=ae.F, cu=ae.CU, cv=ae.CV),
                          base=ae.BASE_M, bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode="grid")
    step = make_stereo_frame_step(ae.W, ae.H, params, engine)
    p = params.match
    det = lambda img: detect_features(
        jnp.asarray(img), w=ae.W, h=ae.H, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)
    pl_, pr_ = det(left[0]), det(right[0])
    key = jax.random.PRNGKey(0)
    motions, n_fail, last = [], 0, np.eye(4)
    for i in range(1, n):
        key, k = jax.random.split(key)
        pl_, pr_, m, res = step(pl_, pr_, jnp.asarray(left[i]),
                                jnp.asarray(right[i]),
                                jnp.asarray(last, jnp.float32), k)
        if bool(res.success):
            last = np.asarray(transformation_vector_to_matrix(res.tr))
        else:
            n_fail += 1
        motions.append(last.copy())
    rec["fused_f32"] = {**ae.metrics(poses, motions, n_fail),
                        **horizon_metrics(poses, motions)}
    print("ours f32:", rec["fused_f32"], flush=True)

    ref_ate = rec["reference_f64"]["ate_prefix_m"]
    our_ate = rec["fused_f32"]["ate_prefix_m"]
    rec["f32_vs_f64_ate_ratio"] = {
        k: round(our_ate[k] / max(ref_ate[k], 1e-9), 3) for k in our_ate}
    rec["verdict"] = ("f32 drift bounded: ATE ratio vs f64 reference stays "
                      "O(1) across horizons"
                      if max(rec["f32_vs_f64_ate_ratio"].values()) < 3.0
                      else "f32 drift EXCEEDS 3x the f64 reference")

    out = os.path.join(HERE, "drift_eval.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"ATE ratio f32/f64 per horizon: {rec['f32_vs_f64_ate_ratio']}")
    print(f"{rec['verdict']} -> {out}")


if __name__ == "__main__":
    main()
