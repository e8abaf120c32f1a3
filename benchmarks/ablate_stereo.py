"""Ablation-based stage attribution for the fused stereo step (run on TPU).

Rebuilds the headline step with single stages removed/shrunk and reports the
pipelined ms/frame delta of each variant — the measurement behind the
BASELINE.md speed-of-light ledger (per-op traces over the tunnel absorb
overlap waits and mislead; ablation diffs don't).

Usage: python benchmarks/ablate_stereo.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N_FRAMES = 40
REPS = 3


def build_step(w, h, params, engine, *, refine_on=True, estimate_on=True,
               outliers_on=True, dense_on=True, bucket_on=True):
    """_make_stereo_step_core with stage toggles (mirrors pipeline.py)."""
    from sfm_tpu.models.matcher import detect_features, match_quad
    from sfm_tpu.models.pipeline import _outliers
    from sfm_tpu.models.stereo import StereoResult, stereo_estimate_motion
    from sfm_tpu.ops.matching import bucket_matches, compute_prior_statistics
    from sfm_tpu.ops.refine import relocate_minimum_prefix, small_ref_descriptors

    p = params.match
    radius = p.match_radius / 2 if p.half_resolution else p.match_radius
    nbu = -(-w // p.match_binsize)
    nbv = -(-h // p.match_binsize)
    kw = dict(w=w, h=h, binsize=p.match_binsize, nbu=nbu, nbv=nbv,
              radius=float(radius), disp_tol=float(p.match_disp_tolerance),
              cap=engine.max_matches)
    calib4 = jnp.asarray(
        [params.calib.f, params.calib.cu, params.calib.cv, params.base],
        jnp.float32)
    mode = engine.outlier_mode

    def detect(img):
        return detect_features(
            img, w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
            multi_stage=p.multi_stage, half_resolution=p.half_resolution,
            cap_sparse=engine.max_features_sparse,
            cap_dense=engine.max_features_dense)

    @jax.jit
    def step(prev_l, prev_r, I1, I2, tr_prior, key):
        cur_l = detect(I1)
        cur_r = detect(I2)
        k_bucket, k_ransac = jax.random.split(key)
        m1 = match_quad(prev_l.sparse, prev_r.sparse, cur_l.sparse,
                        cur_r.sparse, None, tr_prior, calib4,
                        use_rt=False, use_tr=True, **kw)
        if outliers_on:
            m1 = _outliers(m1, 2, p.outlier_flow_tolerance,
                           p.outlier_disp_tolerance, engine.max_matches,
                           mode, engine, limit=engine.max_features_sparse)
        m2 = m1
        if dense_on:
            rt = compute_prior_statistics(
                m1, method=2, n_bins_u=nbu, n_bins_v=nbv,
                binsize=p.match_binsize, match_radius=float(radius))
            m2 = match_quad(prev_l.dense, prev_r.dense, cur_l.dense,
                            cur_r.dense, rt, tr_prior, calib4,
                            use_rt=True, use_tr=True, **kw)
            if outliers_on:
                m2 = _outliers(m2, 2, p.outlier_flow_tolerance,
                               p.outlier_disp_tolerance, engine.max_matches,
                               mode, engine)
        cap_pb = min(engine.refine_window, engine.max_matches)
        if bucket_on:
            m2 = bucket_matches(m2, k_bucket, params.bucket.max_features,
                                params.bucket.bucket_width,
                                params.bucket.bucket_height, cap_pb)
        if refine_on and p.refinement > 0:
            ref = small_ref_descriptors(cur_l.du_full, cur_l.dv_full,
                                        m2.u1c[:cap_pb], m2.v1c[:cap_pb],
                                        count=m2.count)
            wf, hf = jnp.float32(w), jnp.float32(h)
            u1p, v1p = relocate_minimum_prefix(
                cur_l.du_full, cur_l.dv_full, prev_l.du_full,
                prev_l.dv_full, m2.u1c, m2.v1c, m2.u1p, m2.v1p,
                wf, hf, window=cap_pb, ref=ref, count=m2.count)
            u2c, v2c = relocate_minimum_prefix(
                cur_l.du_full, cur_l.dv_full, cur_r.du_full,
                cur_r.dv_full, m2.u1c, m2.v1c, m2.u2c, m2.v2c,
                wf, hf, window=cap_pb, ref=ref, count=m2.count)
            u2p, v2p = relocate_minimum_prefix(
                cur_l.du_full, cur_l.dv_full, prev_r.du_full,
                prev_r.dv_full, m2.u1c, m2.v1c, m2.u2p, m2.v2p,
                wf, hf, window=cap_pb, ref=ref, count=m2.count)
            m2 = m2._replace(u1p=u1p, v1p=v1p, u2c=u2c, v2c=v2c,
                             u2p=u2p, v2p=v2p)
        if estimate_on:
            res = stereo_estimate_motion(
                m2, k_ransac, calib4, jnp.float32(params.inlier_threshold),
                ransac_iters=params.ransac_iters,
                reweighting=params.reweighting)
        else:
            z6 = jnp.zeros(6, jnp.float32)
            res = StereoResult(tr=z6, success=jnp.bool_(True),
                               inliers=m2.valid, n_inliers=m2.count,
                               n_matches=m2.count)
        return cur_l, cur_r, m2, res

    return step


def time_variant(label, step, frames, detect0):
    left, right = frames
    key = jax.random.PRNGKey(0)
    trp = jnp.eye(4, dtype=jnp.float32)
    prev_l, prev_r = detect0
    # warmup/compile
    for i in range(1, 3):
        prev_l, prev_r, m, res = step(prev_l, prev_r, left[i], right[i],
                                      trp, key)
    jax.block_until_ready(res.tr)
    pl0, pr0 = prev_l, prev_r
    best = 1e9
    for _ in range(REPS):
        prev_l, prev_r = pl0, pr0
        out = []
        t0 = time.perf_counter()
        for i in range(3, 3 + N_FRAMES):
            prev_l, prev_r, m, res = step(prev_l, prev_r, left[i], right[i],
                                          trp, key)
            out.append(res.tr)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / N_FRAMES * 1000)
    print(f"ABL {label:30s} {best:6.2f} ms/frame", flush=True)
    return best


def main():
    import bench
    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                StereoParams, replace)
    from sfm_tpu.models.matcher import detect_features

    left, right, poses = bench.load_frames()
    h, w = left[0].shape
    params = StereoParams(
        calib=Calibration(f=645.2, cu=635.9, cv=194.1), base=0.571,
        bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode="knnw")
    p = params.match

    dev_l = [jax.device_put(x) for x in left[:3 + N_FRAMES]]
    dev_r = [jax.device_put(x) for x in right[:3 + N_FRAMES]]
    jax.block_until_ready(dev_l + dev_r)

    detect0 = tuple(detect_features(
        img, w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense) for img in (dev_l[0], dev_r[0]))

    results = {}
    variants = [
        ("full", dict()),
        ("no_refine", dict(refine_on=False)),
        ("no_estimate", dict(estimate_on=False)),
        ("no_refine_no_estimate", dict(refine_on=False, estimate_on=False)),
        ("no_outliers", dict(outliers_on=False)),
        ("no_bucket", dict(bucket_on=False)),
        ("sparse_only", dict(dense_on=False, refine_on=False,
                             estimate_on=False)),
    ]
    for label, kw in variants:
        step = build_step(w, h, params, engine, **kw)
        results[label] = time_variant(label, step, (dev_l, dev_r), detect0)

    # also scale RANSAC
    params50 = replace(params, ransac_iters=50)
    step = build_step(w, h, params50, engine)
    results["ransac50"] = time_variant("ransac50", step, (dev_l, dev_r),
                                       detect0)

    full = results["full"]
    print("\nstage attribution (ms):", flush=True)
    for label, ms in results.items():
        if label != "full":
            print(f"  {label:28s} saves {full - ms:6.2f}", flush=True)


if __name__ == "__main__":
    main()
