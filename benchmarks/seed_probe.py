"""Run-to-run noise probe: same config, multiple PRNG seeds.

The outlier-filter sweep picks a winner by single runs; this measures the
RANSAC-seed noise floor per scene so differences below it aren't
over-interpreted. Usage:
    python benchmarks/seed_probe.py [n_frames] [config] [scene ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from accuracy_eval import metrics, scene_data
from knn_sweep import make_steps, parse_cfg, run_mono, run_stereo

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    cfg = sys.argv[2] if len(sys.argv) > 2 else "knnw:k8:s4"
    scenes = sys.argv[3:] or ["curve", "scurve", "pillars"]
    seeds = [0, 1, 2, 3]
    engine = parse_cfg(cfg)
    s_step, s_params, m_step, m_params, engine = make_steps(engine)

    out = {}
    for name in scenes:
        n_sc = min(n, 80) if name == "curve" else n
        left, right, poses, d = scene_data(name, n_sc)
        st_errs, mo_errs = [], []
        for seed in seeds:
            st = run_stereo_seeded(s_step, s_params, engine, left, right,
                                   poses, seed)
            mo = run_mono_seeded(m_step, m_params, engine, left, poses, seed)
            st_errs.append(st["t_err_pct"])
            mo_errs.append(mo["t_err_scaled_pct"])
            print(f"{cfg} {name} seed {seed}: stereo {st['t_err_pct']:.2f} "
                  f"mono {mo['t_err_scaled_pct']:.2f} "
                  f"fails {st['fails']}/{mo['fails']}", flush=True)
        out[name] = {"stereo": st_errs, "mono": mo_errs,
                     "stereo_mean": float(np.mean(st_errs)),
                     "stereo_std": float(np.std(st_errs)),
                     "mono_mean": float(np.mean(mo_errs)),
                     "mono_std": float(np.std(mo_errs))}
        print(f"{cfg} {name}: stereo {np.mean(st_errs):.2f}±{np.std(st_errs):.2f} "
              f"mono {np.mean(mo_errs):.2f}±{np.std(mo_errs):.2f}", flush=True)
    path = os.path.join(HERE, "seed_probe.json")
    rec = {}
    if os.path.exists(path):
        try:
            rec = json.load(open(path))
        except ValueError:
            rec = {}
    rec[cfg] = out
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)


def run_stereo_seeded(step, params, engine, left, right, gt, seed):
    from accuracy_eval import H as HH, W as WW
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix

    p = params.match
    det = lambda img: detect_features(
        jnp.asarray(img), w=WW, h=HH, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)
    pl_, pr_ = det(left[0]), det(right[0])
    key = jax.random.PRNGKey(seed)
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


def run_mono_seeded(step, params, engine, left, gt, seed):
    from accuracy_eval import H as HH, W as WW
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix

    p = params.match
    det = lambda img: detect_features(
        jnp.asarray(img), w=WW, h=HH, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)
    prev = det(left[0])
    key = jax.random.PRNGKey(seed)
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


if __name__ == "__main__":
    main()
