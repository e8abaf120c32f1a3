"""Outlier-filter A/B sweep: find ONE on-device config that matches the
reference's Delaunay accuracy (matcher.cpp:1207-1377) on every scene while
keeping fused-pipeline speed.

For each candidate EngineConfig (grid / knn with various k & min_support)
this runs the fused stereo AND mono pipelines on all 4 synthetic scenes and
reports t_err / ATE / fails next to the reference CPU numbers (from
accuracy_results.json, or recomputed via ref_dump when missing).

Usage: python benchmarks/knn_sweep.py [n_frames] [config ...]
  config grammar: grid | grid:r80:s4 | knn:k8:s3
Writes benchmarks/knn_sweep.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from accuracy_eval import (BASE_M, CU, CV, F, H, W, metrics, run_reference,
                           scene_data)

HERE = os.path.dirname(os.path.abspath(__file__))


def parse_cfg(s):
    from sfm_tpu.config import EngineConfig

    parts = s.split(":")
    kw = dict(outlier_mode=parts[0])
    refinement = 1
    for p in parts[1:]:
        if p == "pre":
            kw["refine_pre_filter"] = True
        elif p == "sub":
            refinement = 2  # subpixel parabolic fitting
        elif p.startswith("w"):
            kw["refine_window"] = int(p[1:])
        elif p.startswith("k"):
            kw["outlier_knn_k"] = int(p[1:])
        elif p.startswith("s"):
            kw["outlier_min_support"] = int(p[1:])
        elif p.startswith("r"):
            kw["outlier_grid_radius"] = float(p[1:])
    return _with_refinement(EngineConfig(**kw), refinement)


def _with_refinement(engine, refinement):
    # stash the MatcherParams.refinement choice alongside the engine config
    # (frozen dataclass: carry it out-of-band for make_steps)
    object.__setattr__(engine, "_sweep_refinement", refinement)
    return engine


def make_steps(engine):
    from sfm_tpu.config import (Bucketing, Calibration, MonoParams,
                                StereoParams, replace)
    from sfm_tpu.models.pipeline import (make_mono_frame_step,
                                         make_stereo_frame_step)

    sp = StereoParams(calib=Calibration(f=F, cu=CU, cv=CV), base=BASE_M,
                      bucket=Bucketing(max_features=1000))
    mp = MonoParams(calib=Calibration(f=F, cu=CU, cv=CV), height=1.6,
                    pitch=0.0, bucket=Bucketing(max_features=1000))
    refinement = getattr(engine, "_sweep_refinement", 1)
    if refinement != 1:
        sp = replace(sp, match=replace(sp.match, refinement=refinement))
        mp = replace(mp, match=replace(mp.match, refinement=refinement))
    return (make_stereo_frame_step(W, H, sp, engine), sp,
            make_mono_frame_step(W, H, mp, engine), mp, engine)


def run_stereo(step, params, engine, left, right, gt):
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix

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


def run_mono(step, params, engine, left, gt):
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix

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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cfg_strs = sys.argv[2:] or ["knn:k8:s4", "knn:k8:s3", "knn:k8:s2",
                                "knn:k12:s4", "grid"]
    scenes = ["forward", "curve", "scurve", "pillars"]

    data, refs = {}, {}
    ref_path = os.path.join(HERE, "accuracy_results.json")
    prior = json.load(open(ref_path)) if os.path.exists(ref_path) else {}
    for name in scenes:
        n_sc = min(n, 80) if name == "curve" else n
        data[name] = scene_data(name, n_sc)
        if name in prior and prior[name]["ref_stereo"]["frames"] == n_sc - 1:
            refs[name] = {"stereo": prior[name]["ref_stereo"],
                          "mono": prior[name]["ref_mono"]}
        else:
            left, right, poses, d = data[name]
            refs[name] = {"stereo": run_reference("stereo", d, n_sc, poses),
                          "mono": run_reference("mono", d, n_sc, poses)}
        print(f"ref {name}: stereo {refs[name]['stereo']} | "
              f"mono {refs[name]['mono']}", flush=True)

    results = {"ref": refs}
    for cs in cfg_strs:
        engine = parse_cfg(cs)
        s_step, s_params, m_step, m_params, engine = make_steps(engine)
        results[cs] = {}
        for name in scenes:
            left, right, poses, d = data[name]
            t0 = time.time()
            st = run_stereo(s_step, s_params, engine, left, right, poses)
            mo = run_mono(m_step, m_params, engine, left, poses)
            results[cs][name] = {"stereo": st, "mono": mo}
            rs, rm = refs[name]["stereo"], refs[name]["mono"]
            flag_s = "OK " if st["t_err_pct"] <= rs["t_err_pct"] * 1.02 else "BAD"
            flag_m = ("OK " if mo["t_err_scaled_pct"]
                      <= rm["t_err_scaled_pct"] * 1.1 else "BAD")
            print(f"{cs:12s} {name:8s} stereo {st['t_err_pct']:6.2f} "
                  f"(ref {rs['t_err_pct']:5.2f}) {flag_s} | "
                  f"mono {mo['t_err_scaled_pct']:6.2f} "
                  f"(ref {rm['t_err_scaled_pct']:5.2f}) {flag_m} "
                  f"fails {st['fails']}/{mo['fails']} "
                  f"[{time.time()-t0:.0f}s]", flush=True)

    out = os.path.join(HERE, "knn_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
