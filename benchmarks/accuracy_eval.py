"""Trajectory accuracy evaluation across the named synthetic scenes.

For each scene (forward / curve / scurve / pillars, full KITTI-shaped frames)
this runs:
  * the reference C++ VO (via reference_baseline/ref_dump, full 3x4 Tr_delta)
  * our fused pipeline (grid outlier mode — the benchmarked config)
  * our class path (Delaunay outlier mode — reference-faithful)
for both stereo and mono, and reports the KITTI metric (t_err %, r_err deg/m),
ATE and success rate against ground truth. This is the grid-vs-Delaunay A/B
from ROADMAP and the BASELINE.md accuracy table source.

Usage: python benchmarks/accuracy_eval.py [n_frames] [scene ...]
Writes benchmarks/accuracy_results.json.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF_DUMP = os.path.join(HERE, "reference_baseline", "ref_dump")

F, CU, CV, BASE_M = 645.2, 635.9, 194.1, 0.571
W, H = 1241, 376
LENGTHS = (10, 20, 30, 50)


def write_pgm(path, img):
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())


def scene_data(name, n):
    """Render (or load cached) scene frames + GT poses."""
    from sfm_tpu.utils.synthetic import SceneConfig, scene_sequence

    d = os.path.join(HERE, f"data_{name}")
    meta = os.path.join(d, "meta.txt")
    if os.path.exists(meta) and open(meta).read().startswith(f"n={n} "):
        left, right = [], []
        for i in range(n):
            for lst, s in ((left, "_l"), (right, "_r")):
                with open(os.path.join(d, f"{i:06d}{s}.pgm"), "rb") as f:
                    f.readline(); w, h = map(int, f.readline().split()); f.readline()
                    lst.append(np.frombuffer(f.read(w * h), np.uint8).reshape(h, w))
        poses = np.load(os.path.join(d, "poses.npy"))
        return left, right, poses, d
    os.makedirs(d, exist_ok=True)
    cfg = SceneConfig()  # full KITTI-shaped
    left, right, poses = scene_sequence(name, n, cfg, baseline=BASE_M)
    for i in range(n):
        write_pgm(os.path.join(d, f"{i:06d}.pgm"), left[i])
        write_pgm(os.path.join(d, f"{i:06d}_l.pgm"), left[i])
        write_pgm(os.path.join(d, f"{i:06d}_r.pgm"), right[i])
    np.save(os.path.join(d, "poses.npy"), np.stack(poses))
    with open(meta, "w") as f:
        f.write(f"n={n} scene={name} w={cfg.width} h={cfg.height}\n")
    return left, right, np.stack(poses), d


def metrics(gt_wc, motions, n_fail, scale_aligned=False):
    """motions: list of per-frame Tr_delta (prev->cur), frames 1..N-1."""
    from sfm_tpu.utils.kitti import (ate_rmse, kitti_errors,
                                     poses_from_motions, scale_align)

    gt = np.stack([np.linalg.inv(T) for T in gt_wc])  # cam->world
    est = poses_from_motions(motions)
    t_err, r_err, _ = kitti_errors(gt, est, step=3, lengths=LENGTHS)
    ate = ate_rmse(gt, est)
    out = dict(t_err_pct=round(t_err, 3), r_err_deg_m=round(r_err, 5),
               ate_m=round(ate, 4), fails=n_fail, frames=len(motions))
    if scale_aligned:
        est_s = scale_align(gt, est)
        t_s, _, _ = kitti_errors(gt, est_s, step=3, lengths=LENGTHS)
        out["t_err_scaled_pct"] = round(t_s, 3)
        out["ate_scaled_m"] = round(ate_rmse(gt, est_s), 4)
    return out


def run_reference(kind, d, n, gt):
    if not os.path.exists(REF_DUMP):
        subprocess.run(["bash", os.path.join(HERE, "reference_baseline",
                                             "build.sh")], check=True)
    out_dir = os.path.join(d, f"ref_{kind}")
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    subprocess.run([REF_DUMP, "vo", d, str(n), kind, str(F), str(CU), str(CV),
                    str(BASE_M), "1.6", out_dir], check=True,
                   capture_output=True)
    secs = time.time() - t0
    rows = np.loadtxt(os.path.join(out_dir, "vo.txt"))
    motions, n_fail, last = [], 0, np.eye(4)
    for r in rows[1:]:
        if r[1] > 0.5:
            last = np.eye(4)
            last[:3, :] = r[4:16].reshape(3, 4)
        else:
            n_fail += 1
        motions.append(last.copy())
    m = metrics(gt, motions, n_fail, scale_aligned=(kind == "mono"))
    m["fps"] = round(n / secs, 2)
    return m


def run_fused_stereo(left, right, gt):
    from sfm_tpu.config import Bucketing, Calibration, EngineConfig, StereoParams
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import make_stereo_frame_step
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix

    params = StereoParams(calib=Calibration(f=F, cu=CU, cv=CV), base=BASE_M,
                          bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode="knnw")
    step = make_stereo_frame_step(W, H, params, engine)
    p = params.match
    det = lambda img: detect_features(
        jnp.asarray(img), w=W, h=H, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)
    pl_, pr_ = det(left[0]), det(right[0])
    key = jax.random.PRNGKey(0)
    motions, n_fail, last = [], 0, np.eye(4)
    for i in range(1, len(left)):
        key, k = jax.random.split(key)
        pl_, pr_, m, res = step(pl_, pr_, jnp.asarray(left[i]),
                                jnp.asarray(right[i]),
                                jnp.asarray(last, jnp.float32), k)
        if bool(res.success):
            last = np.asarray(transformation_vector_to_matrix(res.tr))
        else:
            n_fail += 1
        motions.append(last.copy())
    return metrics(gt, motions, n_fail)


def run_fused_mono(left, gt):
    from sfm_tpu.config import Bucketing, Calibration, EngineConfig, MonoParams
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import make_mono_frame_step
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix

    params = MonoParams(calib=Calibration(f=F, cu=CU, cv=CV), height=1.6,
                        pitch=0.0, bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode="knnw")
    step = make_mono_frame_step(W, H, params, engine)
    p = params.match
    det = lambda img: detect_features(
        jnp.asarray(img), w=W, h=H, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)
    prev = det(left[0])
    key = jax.random.PRNGKey(0)
    motions, n_fail, last = [], 0, np.eye(4)
    for i in range(1, len(left)):
        key, k = jax.random.split(key)
        prev, m, res = step(prev, jnp.asarray(left[i]), k)
        if bool(res.success):
            last = np.asarray(transformation_vector_to_matrix(res.tr))
        else:
            n_fail += 1
        motions.append(last.copy())
    return metrics(gt, motions, n_fail, scale_aligned=True)


def run_class_stereo(left, right, gt):
    """Reference-faithful class path: Delaunay outliers + subpixel off."""
    from sfm_tpu.config import Bucketing, Calibration, EngineConfig, StereoParams
    from sfm_tpu.models.stereo import VisualOdometryStereo

    params = StereoParams(calib=Calibration(f=F, cu=CU, cv=CV), base=BASE_M,
                          bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode="delaunay")
    vo = VisualOdometryStereo(params, engine, dims=(W, H))
    motions, n_fail, last = [], 0, np.eye(4)
    vo.process(left[0], right[0])
    for i in range(1, len(left)):
        ok = vo.process(left[i], right[i])
        if ok:
            last = vo.get_motion().copy()
        else:
            n_fail += 1
        motions.append(last.copy())
    return metrics(gt, motions, n_fail)


def run_class_mono(left, gt):
    from sfm_tpu.config import Bucketing, Calibration, EngineConfig, MonoParams
    from sfm_tpu.models.mono import VisualOdometryMono

    params = MonoParams(calib=Calibration(f=F, cu=CU, cv=CV), height=1.6,
                        pitch=0.0, bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode="delaunay")
    vo = VisualOdometryMono(params, engine, dims=(W, H))
    motions, n_fail, last = [], 0, np.eye(4)
    vo.process(left[0])
    for i in range(1, len(left)):
        ok = vo.process(left[i])
        if ok:
            last = vo.get_motion().copy()
        else:
            n_fail += 1
        motions.append(last.copy())
    return metrics(gt, motions, n_fail, scale_aligned=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    scene_names = sys.argv[2:] or ["forward", "curve", "scurve", "pillars"]
    results = {}
    for name in scene_names:
        n_sc = min(n, 80) if name == "curve" else n  # curve crosses walls later
        print(f"=== scene {name} ({n_sc} frames) ===", flush=True)
        left, right, poses, d = scene_data(name, n_sc)
        res = {}
        res["ref_stereo"] = run_reference("stereo", d, n_sc, poses)
        print("  ref stereo:", res["ref_stereo"], flush=True)
        res["ref_mono"] = run_reference("mono", d, n_sc, poses)
        print("  ref mono:  ", res["ref_mono"], flush=True)
        t0 = time.time()
        res["fused_stereo_knnw"] = run_fused_stereo(left, right, poses)
        print(f"  fused stereo (knnw): {res['fused_stereo_knnw']} "
              f"[{time.time()-t0:.0f}s]", flush=True)
        t0 = time.time()
        res["class_stereo_delaunay"] = run_class_stereo(left, right, poses)
        print(f"  class stereo (delaunay): {res['class_stereo_delaunay']} "
              f"[{time.time()-t0:.0f}s]", flush=True)
        t0 = time.time()
        res["fused_mono_knnw"] = run_fused_mono(left, poses)
        print(f"  fused mono (knnw): {res['fused_mono_knnw']} "
              f"[{time.time()-t0:.0f}s]", flush=True)
        t0 = time.time()
        res["class_mono_delaunay"] = run_class_mono(left, poses)
        print(f"  class mono (delaunay): {res['class_mono_delaunay']} "
              f"[{time.time()-t0:.0f}s]", flush=True)
        results[name] = res
    out = os.path.join(HERE, "accuracy_results.json")
    merged = {}
    if os.path.exists(out):  # merge: partial runs must not drop other scenes
        try:
            merged = json.load(open(out))
        except ValueError:
            merged = {}
    merged.update(results)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"wrote {out}")

    # markdown summary for BASELINE.md
    print("\n| scene | config | t_err % | r_err deg/m | ATE m | fails |")
    print("|---|---|---|---|---|---|")
    for name, res in results.items():
        for cfg_name, m in res.items():
            print(f"| {name} | {cfg_name} | {m['t_err_pct']} | "
                  f"{m['r_err_deg_m']} | {m['ate_m']} | {m['fails']} |")


if __name__ == "__main__":
    main()
