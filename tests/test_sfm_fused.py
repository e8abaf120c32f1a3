"""Fused single-dispatch mono SfM step (pipeline.make_mono_sfm_step) vs the
class-path StructureFromMotion driver: same pose accumulation semantics, map
points produced, failure leaves state untouched."""

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import (Bucketing, Calibration, EngineConfig, MonoParams,
                            ReconstructionParams)
from sfm_tpu.models.matcher import detect_features
from sfm_tpu.models.pipeline import make_mono_sfm_step
from sfm_tpu.models.reconstruction import init_state
from sfm_tpu.utils.synthetic import SceneConfig, make_sequence

W, H = 480, 160
CFG = SceneConfig(width=W, height=H, f=240.0, cu=240.0, cv=80.0,
                  wall_dist=5.0, far_dist=40.0)


def _detect(img, params, engine):
    p = params.match
    return detect_features(
        jnp.asarray(img), w=W, h=H, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)


def test_fused_sfm_step_accumulates_pose_and_points():
    frames, poses = make_sequence(5, CFG, step=0.4)
    params = MonoParams(calib=Calibration(f=CFG.f, cu=CFG.cu, cv=CFG.cv),
                        height=CFG.cam_height, pitch=CFG.cam_pitch,
                        ransac_iters=500,
                        bucket=Bucketing(max_features=1000))
    engine = EngineConfig(max_features_dense=2048, max_features_sparse=512,
                          max_matches=2048, max_tracks=512,
                          outlier_mode="grid")
    rp = ReconstructionParams(cam_height=CFG.cam_height,
                              cam_pitch=CFG.cam_pitch, point_type=0,
                              min_track_length=2, max_dist=30.0,
                              min_angle=0.5)
    step = make_mono_sfm_step(W, H, params, engine, rp)

    prev = _detect(frames[0], params, engine)
    recon = init_state(engine.max_tracks)
    tr_total = jnp.eye(4, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    n_pts = 0
    succ = []
    for i in range(1, 5):
        prev, recon, tr_total, res, pts, pt_valid = step(
            prev, recon, tr_total, jnp.asarray(frames[i]), key)
        succ.append(bool(res.success))
        n_pts += int(np.asarray(pt_valid).sum())
    assert all(succ), succ
    t = np.asarray(tr_total)[:3, 3]
    # 4 steps of 0.4 m forward; mono scale biased but direction must hold
    assert t[2] > 0.8, t
    assert abs(t[0]) < 0.3 and abs(t[1]) < 0.3, t

    # degenerate frame: state untouched, no points
    prev2, recon2, tr2, res2, _, pv2 = step(
        prev, recon, tr_total, jnp.zeros((H, W), jnp.uint8), key)
    assert not bool(res2.success)
    assert np.allclose(np.asarray(tr2), np.asarray(tr_total))
    assert int(np.asarray(pv2).sum()) == 0
    # prev keeps the old keyframe (replace semantics)
    assert np.array_equal(np.asarray(prev2.dense.u), np.asarray(prev.dense.u))
    assert np.array_equal(np.asarray(recon2.length), np.asarray(recon.length))
