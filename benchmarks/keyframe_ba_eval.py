"""Long-horizon keyframe BA over a real sequence run (VERDICT r4 item 3).

Runs the fused stereo VO pipeline over a 100+-frame synthetic drive,
chains every frame's inlier matches into unbounded tracks
(models/keyframe_ba.py), selects distance-spaced keyframes, builds the
map/keyframe-block BA problem, and refines it with the Schur-complement
engine — once unsharded and once with landmarks sharded over an 8-device
mesh — asserting:

  * sharded chi2 == unsharded chi2 (exact psum reduction),
  * chi2 decreases over the refinement,
  * keyframe ATE vs ground truth IMPROVES after BA.

Writes benchmarks/keyframe_ba_eval.json. Usage:
    python benchmarks/keyframe_ba_eval.py [scene] [n_frames]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))


def run_eval(scene: str = "curve", n_frames: int = 110, w: int = 416,
             h: int = 160, use_mesh: bool = True, seed: int = 0,
             verbose: bool = True):
    import jax
    import jax.numpy as jnp

    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                StereoParams)
    from sfm_tpu.models.keyframe_ba import (TrackAccumulator,
                                            build_keyframe_problem,
                                            refine_keyframes,
                                            select_keyframes)
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import make_stereo_frame_step
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix
    from sfm_tpu.utils.kitti import ate_rmse, poses_from_motions
    from sfm_tpu.utils.synthetic import SceneConfig, scene_sequence

    f = w * 166.0 / 320.0
    base = 0.5
    cfg = SceneConfig(width=w, height=h, f=f, cu=w / 2.0, cv=h / 2.0,
                      wall_dist=7.0)
    left, right, gt_wc = scene_sequence(scene, n_frames, cfg, baseline=base)
    gt = np.stack([np.linalg.inv(T) for T in gt_wc])  # cam->world

    params = StereoParams(calib=Calibration(f=f, cu=w / 2.0, cv=h / 2.0),
                          base=base, bucket=Bucketing(max_features=1000))
    engine = EngineConfig(max_features_dense=1024, max_features_sparse=256,
                          max_matches=1024, refine_window=1024,
                          outlier_mode="knnw")
    step = make_stereo_frame_step(w, h, params, engine)
    p = params.match
    det = lambda img: detect_features(
        jnp.asarray(img), w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)

    acc = TrackAccumulator(engine.max_features_dense)
    pl_, pr_ = det(left[0]), det(right[0])
    key = jax.random.PRNGKey(seed)
    motions, last = [], np.eye(4)
    n_fail = 0
    for i in range(1, n_frames):
        key, k = jax.random.split(key)
        pl_, pr_, m, res = step(pl_, pr_, jnp.asarray(left[i]),
                                jnp.asarray(right[i]),
                                jnp.asarray(last, jnp.float32), k)
        if bool(res.success):
            last = np.asarray(transformation_vector_to_matrix(res.tr))
            acc.push(m, i, keep=np.asarray(res.inliers), stereo=True)
        else:
            n_fail += 1
            acc.reset_chain()
        motions.append(last.copy())
    est = poses_from_motions(motions)  # [n_frames,4,4] cam->world

    kf = select_keyframes(est, min_dist=2.0)
    intr = (f, w / 2.0, h / 2.0)
    # PRIMARY: left-image observations only. Measured better for
    # trajectory correction than the rigid-baseline stereo variant below:
    # stereo rows double the (already well-satisfied) depth constraints
    # anchoring the solution to the VO poses, diluting the reprojection
    # signal that corrects drift (A/B in this JSON).
    kfp = build_keyframe_problem(acc, est, kf, intr, max_obs=8,
                                 max_landmarks=8192, pad_to=8)
    # rigid-baseline STEREO-observation variant (obs_base=base rows)
    kfp_stereo = build_keyframe_problem(acc, est, kf, intr, max_obs=16,
                                        max_landmarks=8192, pad_to=8,
                                        stereo_base=base)

    # ATE over keyframes, both trajectories re-rooted at kf[0]
    def reroot(P, idx):
        return np.einsum("ij,njk->nik", np.linalg.inv(P[idx[0]]), P[idx])

    gt_kf = reroot(gt, kf)
    est_kf = reroot(est, kf)
    ate_before = ate_rmse(gt_kf, est_kf)

    # chi2 at iteration 0 (no update) for the decrease check
    from sfm_tpu.parallel.ba import ba_step_local

    _, chi2_0 = jax.jit(lambda pr: ba_step_local(
        pr, jnp.asarray(intr, jnp.float32), jnp.float32(1e-3),
        n_fixed=2))(kfp.problem)
    chi2_0 = float(chi2_0)

    poses_l, pts_l, pv_l, chi2_local = refine_keyframes(
        kfp, intr, iters=20, n_fixed=2, mesh=None)

    out = {
        "scene": scene, "n_frames": n_frames, "w": w, "h": h,
        "n_fail": n_fail,
        "n_keyframes": int(len(kf)),
        "n_landmarks": int(kfp.n_landmarks),
        "n_obs": int(np.asarray(kfp.problem.obs_mask).sum()),
        "chi2_initial": chi2_0,
        "chi2_after_local": chi2_local,
        "ate_before_m": ate_before,
    }

    ate_after = ate_rmse(gt_kf, poses_l)
    out["ate_after_local_m"] = ate_after

    # stereo-observation A/B (capability line; see note at the build)
    poses_s2, _, _, chi2_s2 = refine_keyframes(
        kfp_stereo, intr, iters=20, n_fixed=2, mesh=None)
    out["n_obs_stereo"] = int(np.asarray(
        kfp_stereo.problem.obs_mask).sum())
    out["chi2_after_stereo_obs"] = chi2_s2
    out["ate_after_stereo_obs_m"] = ate_rmse(gt_kf, poses_s2)

    if use_mesh:
        from sfm_tpu.parallel.ba import make_ba_step
        from sfm_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        mesh = make_mesh({"data": n_dev})
        # single-step chi2 parity: the psum-reduced camera system must give
        # the same chi2 as the unsharded step on the identical state
        _, chi2_s1 = make_ba_step(intr, n_fixed=2, mesh=mesh)(kfp.problem,
                                                              1e-2)
        _, chi2_l1 = make_ba_step(intr, n_fixed=2)(kfp.problem, 1e-2)
        out["chi2_step_sharded"] = float(chi2_s1)
        out["chi2_step_local"] = float(chi2_l1)
        assert abs(float(chi2_s1) - float(chi2_l1)) <= 1e-5 * abs(
            float(chi2_l1)), (float(chi2_s1), float(chi2_l1))
        poses_s, _, _, chi2_shard = refine_keyframes(
            kfp, intr, iters=20, n_fixed=2, mesh=mesh)
        out["mesh_devices"] = n_dev
        # communication volume: ONE psum of the reduced camera system per
        # iteration (S [Nc*6, Nc*6] + rhs [Nc*6] + chi2), rides ICI
        nc6 = len(kf) * 6
        out["psum_bytes_per_iter"] = int((nc6 * nc6 + nc6 + 1) * 4)
        out["chi2_after_sharded"] = chi2_shard
        out["ate_after_sharded_m"] = ate_rmse(gt_kf, poses_s)
        out["sharded_pose_max_diff_m"] = float(
            np.abs(poses_s[:, :3, 3] - poses_l[:, :3, 3]).max())

    if verbose:
        print(json.dumps(out, indent=1))
    return out


def main():
    # force CPU + 8 virtual devices (the sitecustomize axon registration
    # ignores the env var; mirror tests/conftest.py)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    scene = sys.argv[1] if len(sys.argv) > 1 else "curve"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 110
    out = run_eval(scene, n)
    with open(os.path.join(HERE, "keyframe_ba_eval.json"), "w") as fp:
        json.dump(out, fp, indent=1)
    assert out["chi2_after_local"] < out["chi2_initial"]
    assert out["ate_after_local_m"] < out["ate_before_m"], \
        (out["ate_after_local_m"], out["ate_before_m"])
    print("keyframe BA eval PASSED")


if __name__ == "__main__":
    main()
