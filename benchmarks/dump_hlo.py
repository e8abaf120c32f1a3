"""Dump optimized HLO of the fused stereo step (with source metadata) for
hot-op attribution. Usage: python benchmarks/dump_hlo.py [mono] > /tmp/hlo.txt
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    mono = "mono" in sys.argv[1:]
    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                MonoParams, StereoParams)
    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import (make_mono_frame_step,
                                         make_stereo_frame_step)

    w, h = 1241, 376
    engine = EngineConfig(outlier_mode="grid")
    calib = Calibration(f=645.2, cu=635.9, cv=194.1)
    bucket = Bucketing(max_features=1000)
    img = jnp.zeros((h, w), jnp.uint8)

    def det(p):
        return detect_features(
            img, w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
            multi_stage=p.multi_stage, half_resolution=p.half_resolution,
            cap_sparse=engine.max_features_sparse,
            cap_dense=engine.max_features_dense)

    key = jax.random.PRNGKey(0)
    if mono:
        params = MonoParams(calib=calib, bucket=bucket)
        step = make_mono_frame_step(w, h, params, engine)
        lowered = step.lower(det(params.match), img, key)
    else:
        params = StereoParams(calib=calib, base=0.571, bucket=bucket)
        step = make_stereo_frame_step(w, h, params, engine)
        pl = det(params.match)
        lowered = step.lower(pl, pl, img, img, jnp.eye(4), key)
    compiled = lowered.compile()
    print(compiled.as_text())


if __name__ == "__main__":
    main()
