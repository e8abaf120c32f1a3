"""Benchmark harness: stereo (headline) + mono VO frames/sec on one chip.

Prints ONE JSON line:
  {"metric": "stereo_vo_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 25.26}

Baseline denominator: the reference C++ stereo VO at 25.26 FPS on this
host's CPU (BASELINE.md, benchmarks/reference_baseline). Extra diagnostics go
to stderr. Runs the fused single-dispatch pipelines (models/pipeline.py) on
whatever backend jax selects (the TPU under the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_STEREO_FPS = 25.26  # BASELINE.md measured reference CPU stereo VO
REF_MONO_FPS = 8.40

N_FRAMES = 30
WARMUP = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_frames():
    import benchmarks.gen_data as gen

    data = gen.DATA
    if not os.path.exists(os.path.join(data, f"{N_FRAMES + WARMUP - 1:06d}_l.pgm")):
        gen.main(max(50, N_FRAMES + WARMUP))
    left, right = [], []
    for i in range(N_FRAMES + WARMUP):
        for lst, suffix in ((left, "_l"), (right, "_r")):
            with open(os.path.join(data, f"{i:06d}{suffix}.pgm"), "rb") as f:
                f.readline()
                w, h = map(int, f.readline().split())
                f.readline()
                # .copy(): frombuffer views are read-only and take a slow
                # synchronous transfer path (13.5 ms vs 0.6 ms per image)
                lst.append(
                    np.frombuffer(f.read(w * h), np.uint8).reshape(h, w).copy())
    poses = np.load(os.path.join(data, "poses.npy"))
    return left, right, poses


def bench_stereo(left, right, poses):
    import jax
    import jax.numpy as jnp

    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                StereoParams)
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import make_stereo_frame_step

    h, w = left[0].shape
    params = StereoParams(
        calib=Calibration(f=645.2, cu=635.9, cv=194.1), base=0.571,
        bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode="grid")
    step = make_stereo_frame_step(w, h, params, engine)

    p = params.match
    detect = lambda img: detect_features(
        jnp.asarray(img), w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)

    key = jax.random.PRNGKey(0)
    prev_l = detect(left[0])
    prev_r = detect(right[0])
    tr_prior = jnp.eye(4)

    # warmup (compile)
    t0 = time.perf_counter()
    for i in range(1, WARMUP):
        key, k = jax.random.split(key)
        prev_l, prev_r, m, res = step(prev_l, prev_r, jnp.asarray(left[i]),
                                      jnp.asarray(right[i]), tr_prior, k)
    jax.block_until_ready(res.tr)
    log(f"stereo warmup/compile: {time.perf_counter() - t0:.1f}s")

    # double-buffer host->device image transfers against compute (the async
    # dispatch queue overlaps the next device_put with the current step)
    dev_l = [jax.device_put(left[i]) for i in range(WARMUP, WARMUP + 2)]
    dev_r = [jax.device_put(right[i]) for i in range(WARMUP, WARMUP + 2)]
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + N_FRAMES):
        key, k = jax.random.split(key)
        prev_l, prev_r, m, res = step(prev_l, prev_r, dev_l.pop(0),
                                      dev_r.pop(0), tr_prior, k)
        nxt = i + 2
        if nxt < WARMUP + N_FRAMES:
            dev_l.append(jax.device_put(left[nxt]))
            dev_r.append(jax.device_put(right[nxt]))
    jax.block_until_ready(res.tr)
    dt = time.perf_counter() - t0
    fps = N_FRAMES / dt

    # accuracy on last frame (sanity, stderr only)
    tr = np.asarray(res.tr)
    gt = poses[WARMUP + N_FRAMES - 1] @ np.linalg.inv(
        poses[WARMUP + N_FRAMES - 2])
    log(f"stereo: {fps:.2f} fps  last tr t=({tr[3]:.3f},{tr[4]:.3f},{tr[5]:.3f})"
        f" gt t_z={gt[2, 3]:.3f} success={bool(res.success)} "
        f"matches={int(res.n_matches)} inliers={int(res.n_inliers)}")
    return fps


def bench_mono(left, poses):
    import jax
    import jax.numpy as jnp

    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                MonoParams)
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import make_mono_frame_step

    h, w = left[0].shape
    params = MonoParams(
        calib=Calibration(f=645.2, cu=635.9, cv=194.1), height=1.6,
        pitch=0.0, bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode="grid")
    step = make_mono_frame_step(w, h, params, engine)

    p = params.match
    prev = detect_features(
        jnp.asarray(left[0]), w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    for i in range(1, WARMUP):
        key, k = jax.random.split(key)
        prev, m, res = step(prev, jnp.asarray(left[i]), k)
    jax.block_until_ready(res.tr)
    log(f"mono warmup/compile: {time.perf_counter() - t0:.1f}s")

    dev = [jax.device_put(left[i]) for i in range(WARMUP, WARMUP + 2)]
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + N_FRAMES):
        key, k = jax.random.split(key)
        prev, m, res = step(prev, dev.pop(0), k)
        if i + 2 < WARMUP + N_FRAMES:
            dev.append(jax.device_put(left[i + 2]))
    jax.block_until_ready(res.tr)
    fps = N_FRAMES / (time.perf_counter() - t0)
    tr = np.asarray(res.tr)
    log(f"mono: {fps:.2f} fps  last tr t=({tr[3]:.3f},{tr[4]:.3f},{tr[5]:.3f})"
        f" success={bool(res.success)} matches={int(res.n_matches)}")
    return fps


def main():
    import jax

    log(f"backend: {jax.devices()}")
    left, right, poses = load_frames()
    stereo_fps = bench_stereo(left, right, poses)
    try:
        mono_fps = bench_mono(left, poses)
        log(f"mono_vo_fps={mono_fps:.2f} vs_baseline={mono_fps / REF_MONO_FPS:.2f}")
    except Exception as e:  # mono is secondary; never break the headline
        log(f"mono bench failed: {e}")
    print(json.dumps({
        "metric": "stereo_vo_fps_per_chip",
        "value": round(stereo_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(stereo_fps / REF_STEREO_FPS, 3),
    }))


if __name__ == "__main__":
    main()
