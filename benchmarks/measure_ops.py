"""Honest per-op TPU timings (fresh jax.jit wrapper per measurement, which
matches end-to-end fused behavior; pre-jitted functions measured alone can
report misleading numbers)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timefn(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:38s} {(time.perf_counter() - t0) / n * 1000:8.2f} ms",
          flush=True)
    return out


def main():
    from sfm_tpu.config import Bucketing, Calibration, EngineConfig, MonoParams
    from sfm_tpu.models.matcher import detect_features, match_flow
    from sfm_tpu.models.mono import mono_estimate_motion
    from sfm_tpu.ops.matching import (bucket_matches, compute_prior_statistics,
                                      dedup_by_pixel)
    from sfm_tpu.ops.refine import relocate_minimum
    import benchmarks.gen_data as gen

    frames = []
    for i in range(2):
        with open(os.path.join(gen.DATA, f"{i:06d}_l.pgm"), "rb") as f:
            f.readline()
            w, h = map(int, f.readline().split())
            f.readline()
            frames.append(np.frombuffer(f.read(w * h), np.uint8).reshape(h, w))
    params = MonoParams(calib=Calibration(f=645.2, cu=635.9, cv=194.1),
                        height=1.6, bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode="grid")
    p = params.match
    radius = p.match_radius / 2
    nbu = -(-w // p.match_binsize)
    nbv = -(-h // p.match_binsize)
    kw = dict(w=w, h=h, binsize=p.match_binsize, nbu=nbu, nbv=nbv,
              radius=float(radius), disp_tol=float(p.match_disp_tolerance),
              cap=engine.max_matches)

    def det(img):
        return detect_features(
            img, w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
            multi_stage=p.multi_stage, half_resolution=p.half_resolution,
            cap_sparse=engine.max_features_sparse,
            cap_dense=engine.max_features_dense)

    prev = timefn("detect", det, jnp.asarray(frames[0]))
    cur = det(jnp.asarray(frames[1]))
    jax.block_until_ready(cur)

    m2 = timefn("match_flow dense (2 passes+dedup)", lambda a, b: match_flow(
        a.dense, b.dense, None, use_rt=False, **kw), prev, cur)

    timefn("dedup_by_pixel alone", lambda keep, u, v: dedup_by_pixel(
        keep, u, v, w, h), m2.valid, m2.u1c, m2.v1c)

    timefn("prior_statistics", lambda m: compute_prior_statistics(
        m, method=0, n_bins_u=nbu, n_bins_v=nbv, binsize=p.match_binsize,
        match_radius=float(radius)), m2)

    key = jax.random.PRNGKey(0)
    timefn("bucket_matches", lambda m: bucket_matches(
        m, key, 1000, 50.0, 50.0, engine.max_matches), m2)

    timefn("relocate_minimum (patch)", lambda m: relocate_minimum(
        cur.du_full, cur.dv_full, prev.du_full, prev.dv_full,
        m.u1c, m.v1c, m.u1p, m.v1p, jnp.float32(w), jnp.float32(h)), m2)

    calib = jnp.asarray([645.2, 635.9, 194.1], jnp.float32)
    timefn("mono_estimate (2000 hyp)", lambda m: mono_estimate_motion(
        m, key, calib, jnp.float32(1.6), jnp.float32(0.0),
        jnp.float32(1e-5), jnp.float32(100.0), ransac_iters=2000), m2)

    from sfm_tpu.models.stereo import stereo_estimate_motion

    calib4 = jnp.asarray([645.2, 635.9, 194.1, 0.571], jnp.float32)
    timefn("stereo_estimate (200 hyp GN)", lambda m: stereo_estimate_motion(
        m, key, calib4, jnp.float32(2.0), ransac_iters=200), m2)


if __name__ == "__main__":
    main()
