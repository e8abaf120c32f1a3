"""Stage-level TPU timing of the stereo pipeline: times each jitted stage
separately on realistic data to direct optimization (run on the TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:35s} {dt:8.2f} ms", flush=True)
    return out, dt


def main():
    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                StereoParams)
    from sfm_tpu.models.matcher import detect_features, match_quad
    from sfm_tpu.models.pipeline import _grid_outliers
    from sfm_tpu.models.stereo import stereo_estimate_motion
    from sfm_tpu.ops.matching import bucket_matches, compute_prior_statistics
    from sfm_tpu.ops.refine import relocate_minimum
    import benchmarks.gen_data as gen

    if not os.path.exists(os.path.join(gen.DATA, "000001_l.pgm")):
        gen.main(10)
    frames = []
    for i in range(2):
        for s in ("_l", "_r"):
            with open(os.path.join(gen.DATA, f"{i:06d}{s}.pgm"), "rb") as f:
                f.readline()
                w, h = map(int, f.readline().split())
                f.readline()
                frames.append(np.frombuffer(f.read(w * h), np.uint8).reshape(h, w))
    h, w = frames[0].shape
    print(f"backend={jax.default_backend()} frames {w}x{h}", flush=True)

    params = StereoParams(calib=Calibration(f=645.2, cu=635.9, cv=194.1),
                          base=0.571, bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode="grid")
    p = params.match
    radius = p.match_radius / 2
    nbu = -(-w // p.match_binsize)
    nbv = -(-h // p.match_binsize)
    kw = dict(w=w, h=h, binsize=p.match_binsize, nbu=nbu, nbv=nbv,
              radius=float(radius), disp_tol=float(p.match_disp_tolerance),
              cap=engine.max_matches)

    det = lambda img: detect_features(
        img, w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)

    pl_, _ = timeit("detect_features", det, jnp.asarray(frames[0]))
    pr_ = det(jnp.asarray(frames[1]))
    cl_ = det(jnp.asarray(frames[2]))
    cr_ = det(jnp.asarray(frames[3]))
    jax.block_until_ready(cr_)

    calib4 = jnp.asarray([645.2, 635.9, 194.1, 0.571], jnp.float32)
    tr_eye = jnp.eye(4)

    q1 = functools_partial = lambda: match_quad(
        pl_.sparse, pr_.sparse, cl_.sparse, cr_.sparse, None, tr_eye, calib4,
        use_rt=False, use_tr=True, **kw)
    m1, _ = timeit("match_quad sparse (4 passes)", q1)
    m1o, _ = timeit("grid_outliers sparse", lambda: _grid_outliers(
        m1, 2, 5.0, 5.0, engine.max_matches))
    rt, _ = timeit("prior_statistics", lambda: compute_prior_statistics(
        m1o, method=2, n_bins_u=nbu, n_bins_v=nbv, binsize=p.match_binsize,
        match_radius=float(radius)))
    m2, _ = timeit("match_quad dense (4 passes)", lambda: match_quad(
        pl_.dense, pr_.dense, cl_.dense, cr_.dense, rt, tr_eye, calib4,
        use_rt=True, use_tr=True, **kw))
    _, _ = timeit("relocate_minimum x1", lambda: relocate_minimum(
        cl_.du_full, cl_.dv_full, pl_.du_full, pl_.dv_full,
        m2.u1c, m2.v1c, m2.u1p, m2.v1p, jnp.float32(w), jnp.float32(h)))
    m2o, _ = timeit("grid_outliers dense", lambda: _grid_outliers(
        m2, 2, 5.0, 5.0, engine.max_matches))
    key = jax.random.PRNGKey(0)
    m2b, _ = timeit("bucket_matches", lambda: bucket_matches(
        m2o, key, 1000, 50.0, 50.0, engine.max_matches))
    _, _ = timeit("stereo_estimate_motion", lambda: stereo_estimate_motion(
        m2b, key, calib4, jnp.float32(2.0), ransac_iters=200))

    # isolated SAD pass comparison: pallas vs jnp
    from sfm_tpu.ops.matching import sad_argmin_pass
    from sfm_tpu.ops.pallas_kernels import sad_argmin_pallas

    d1 = pl_.dense.desc.astype(jnp.float32)
    d2 = cl_.dense.desc.astype(jnp.float32)
    n1 = d1.shape[0]
    t = jnp.full((n1,), -1.0, jnp.float32)
    uf = pl_.dense.u.astype(jnp.float32)
    vf = pl_.dense.v.astype(jnp.float32)
    args = (d1, pl_.dense.cls, uf - 100, uf + 100, vf - 100, vf + 100, t, t,
            d2, cl_.dense.u.astype(jnp.float32),
            cl_.dense.v.astype(jnp.float32), cl_.dense.cls, cl_.dense.valid)
    timeit("sad pass (jnp scan)", lambda: sad_argmin_pass(*args))
    timeit("sad pass (pallas)", lambda: sad_argmin_pallas(*args))


if __name__ == "__main__":
    main()
