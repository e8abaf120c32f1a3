"""Capture a jax.profiler trace of the fused stereo (or mono) frame step and
aggregate per-op device time with parse_xplane.py.

Usage: python benchmarks/trace_fused.py [mono] [top_n]
"""

import glob
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    mono = "mono" in sys.argv[1:]
    top_n = next((int(a) for a in sys.argv[1:] if a.isdigit()), 40)

    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                MonoParams, StereoParams)
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import (make_mono_frame_step,
                                         make_stereo_frame_step)
    import benchmarks.gen_data as gen

    if not os.path.exists(os.path.join(gen.DATA, "000003_l.pgm")):
        gen.main(10)
    frames = []
    for i in range(4):
        for s in ("_l", "_r"):
            with open(os.path.join(gen.DATA, f"{i:06d}{s}.pgm"), "rb") as f:
                f.readline()
                w, h = map(int, f.readline().split())
                f.readline()
                frames.append(np.frombuffer(f.read(w * h), np.uint8).reshape(h, w))
    h, w = frames[0].shape
    print(f"backend={jax.default_backend()} {w}x{h} mono={mono}", flush=True)

    engine = EngineConfig(outlier_mode=os.environ.get("TRACE_MODE", "knnw"))
    calib = Calibration(f=645.2, cu=635.9, cv=194.1)
    bucket = Bucketing(max_features=1000)

    def det(img, p):
        return detect_features(
            img, w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
            multi_stage=p.multi_stage, half_resolution=p.half_resolution,
            cap_sparse=engine.max_features_sparse,
            cap_dense=engine.max_features_dense)

    key = jax.random.PRNGKey(0)
    if mono:
        params = MonoParams(calib=calib, bucket=bucket)
        step = make_mono_frame_step(w, h, params, engine)
        prev = det(jnp.asarray(frames[0]), params.match)
        args = lambda i: (prev, jnp.asarray(frames[2 * (i % 3)]), key)
        run = lambda i: step(*args(i))
    else:
        params = StereoParams(calib=calib, base=0.571, bucket=bucket)
        step = make_stereo_frame_step(w, h, params, engine)
        pl = det(jnp.asarray(frames[0]), params.match)
        pr = det(jnp.asarray(frames[1]), params.match)
        tr = jnp.eye(4)
        run = lambda i: step(pl, pr, jnp.asarray(frames[2 + 2 * (i % 3)]),
                             jnp.asarray(frames[3 + 2 * (i % 3)]), tr, key)

    jax.block_until_ready(run(0))  # compile
    t0 = time.perf_counter()
    for i in range(10):
        out = run(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10 * 1000
    print(f"fused step: {dt:.2f} ms/frame", flush=True)

    trace_dir = "/tmp/sfm_trace"
    subprocess.run(["rm", "-rf", trace_dir])
    with jax.profiler.trace(trace_dir):
        for i in range(5):
            out = run(i)
        jax.block_until_ready(out)
    pbs = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    print(pbs, flush=True)
    if pbs:
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     "parse_xplane.py"),
                        pbs[0], str(top_n)])


if __name__ == "__main__":
    main()
