"""Reference parity for the FUSED pipelines (the benchmarked code path).

test_reference_parity.py proves the class-path Matcher/VO against the
reference C++ (ref_dump); the BENCH numbers, however, come from the fused
one-dispatch steps (models/pipeline.py). This file closes that gap: the
fused mono and stereo steps run on the same scenes and are held to the same
per-frame Tr and trajectory bounds against the reference dumps
(viso_mono.cpp:100-190, viso_stereo.cpp:42-145), in the shipped outlier
modes ("knn" — the headline config — and "grid").
"""

import os
import subprocess

import numpy as np
import pytest

from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                            MonoParams, StereoParams)

from test_reference_parity import (BASE, CFG, CU, CV, F, H, N_FRAMES, SCENES,
                                   W, _check_vo_parity, _load_ref_vo,
                                   ref_dump_bin, scenes)


def _engine(mode):
    return EngineConfig(max_features_dense=1024, max_features_sparse=256,
                        max_matches=1024, outlier_mode=mode,
                        outlier_min_support=3 if mode == "knn" else 4)


def _detect(img, engine):
    import jax.numpy as jnp

    from sfm_tpu.models.matcher import detect_features

    from sfm_tpu.config import MatcherParams

    p = MatcherParams()
    return detect_features(
        jnp.asarray(img), w=W, h=H, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)


def _run_fused(kind, mode, scenes, ref_dump_bin, tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from sfm_tpu.models.pipeline import (make_mono_frame_step,
                                         make_stereo_frame_step)
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix

    engine = _engine(mode)
    if kind == "mono":
        params = MonoParams(calib=Calibration(f=F, cu=CU, cv=CV), height=1.6,
                            pitch=0.0, bucket=Bucketing(max_features=1000))
        step = make_mono_frame_step(W, H, params, engine)
    else:
        params = StereoParams(calib=Calibration(f=F, cu=CU, cv=CV), base=BASE,
                              bucket=Bucketing(max_features=1000))
        step = make_stereo_frame_step(W, H, params, engine)

    results = {}
    for name in SCENES:
        left, right, poses, d = scenes[name]
        out = tmp_path_factory.mktemp(f"fvo_{kind}_{mode}_{name}")
        subprocess.run([ref_dump_bin, "vo", d, str(N_FRAMES), kind,
                        str(F), str(CU), str(CV), str(BASE), "1.6", str(out)],
                       check=True, capture_output=True)
        ref = _load_ref_vo(out / "vo.txt")

        key = jax.random.PRNGKey(0)
        ours = [dict(ok=False, tr=np.eye(4))]
        last = np.eye(4)
        if kind == "mono":
            prev = _detect(left[0], engine)
            for i in range(1, N_FRAMES):
                key, k = jax.random.split(key)
                prev, _, res = step(prev, jnp.asarray(left[i]), k)
                if bool(res.success):
                    last = np.asarray(transformation_vector_to_matrix(res.tr))
                ours.append(dict(ok=bool(res.success), tr=last.copy()))
        else:
            pl_, pr_ = _detect(left[0], engine), _detect(right[0], engine)
            for i in range(1, N_FRAMES):
                key, k = jax.random.split(key)
                pl_, pr_, _, res = step(pl_, pr_, jnp.asarray(left[i]),
                                        jnp.asarray(right[i]),
                                        jnp.asarray(last, jnp.float32), k)
                if bool(res.success):
                    last = np.asarray(transformation_vector_to_matrix(res.tr))
                ours.append(dict(ok=bool(res.success), tr=last.copy()))
        results[name] = (ref, ours, poses)
    return results


@pytest.mark.parametrize("mode", ["knn", "grid"])
def test_fused_stereo_vo_parity(mode, ref_dump_bin, scenes, tmp_path_factory):
    results = _run_fused("stereo", mode, scenes, ref_dump_bin,
                         tmp_path_factory)
    _check_vo_parity(results, t_tol=1.5, r_tol=0.01, t_floor=0.03)


def test_fused_mono_vo_parity(ref_dump_bin, scenes, tmp_path_factory):
    results = _run_fused("mono", "knn", scenes, ref_dump_bin,
                         tmp_path_factory)
    _check_vo_parity(results, t_tol=2.0, r_tol=0.02, t_floor=0.12)
