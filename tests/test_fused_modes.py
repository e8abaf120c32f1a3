"""Fused-pipeline reference-surface options (VERDICT round-1 item 4):
subpixel refinement (refinement=2), gain estimation, and the
pure_callback-fused Delaunay outlier mode — all inside the single-dispatch
frame step (matcher.cpp:1379-1454 parabolicFitting, :286-324 getGain,
:1207-1377 removeOutliers)."""

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                            StereoParams, replace)
from sfm_tpu.models.matcher import detect_features
from sfm_tpu.models.pipeline import make_stereo_frame_step
from sfm_tpu.utils.synthetic import SceneConfig, make_sequence

W, H = 320, 160
CAL = Calibration(f=166.0, cu=160.0, cv=80.0)
SCENE = SceneConfig(width=W, height=H, f=166.0, cu=160.0, cv=80.0,
                    wall_dist=6.0)
BASE = 0.5


def _mk_engine(**kw):
    return EngineConfig(max_features_dense=1024, max_features_sparse=256,
                        max_matches=1024, refine_window=512, **kw)


def _run_seq(step, left, right, engine, params, n=4):
    p = params.match
    det = lambda img: detect_features(
        jnp.asarray(img), w=W, h=H, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)
    pl_, pr_ = det(left[0]), det(right[0])
    key = jax.random.PRNGKey(0)
    trp = jnp.eye(4, dtype=jnp.float32)
    out = []
    for i in range(1, n):
        key, k = jax.random.split(key)
        pl_, pr_, m, res = step(pl_, pr_, jnp.asarray(left[i]),
                                jnp.asarray(right[i]), trp, k)
        out.append(res)
    return out


def test_fused_subpixel_refinement():
    left, right, poses = make_sequence(4, SCENE, step=0.5, baseline=BASE)
    params = StereoParams(calib=CAL, base=BASE,
                          bucket=Bucketing(max_features=1000))
    params = replace(params, match=replace(params.match, refinement=2))
    engine = _mk_engine(outlier_mode="grid")
    step = make_stereo_frame_step(W, H, params, engine)
    results = _run_seq(step, left, right, engine, params)
    for i, res in enumerate(results, 1):
        assert bool(res.success), i
        gt = poses[i] @ np.linalg.inv(poses[i - 1])
        from sfm_tpu.ops.se3 import transformation_vector_to_matrix

        est = np.asarray(transformation_vector_to_matrix(res.tr))
        assert np.linalg.norm(est[:3, 3] - gt[:3, 3]) < 0.08, (i, est[:3, 3])


def test_fused_delaunay_callback_mode():
    left, right, poses = make_sequence(4, SCENE, step=0.5, baseline=BASE)
    params = StereoParams(calib=CAL, base=BASE,
                          bucket=Bucketing(max_features=1000))
    engine = _mk_engine(outlier_mode="delaunay")
    step = make_stereo_frame_step(W, H, params, engine)
    results = _run_seq(step, left, right, engine, params)
    for i, res in enumerate(results, 1):
        assert bool(res.success), i
        gt = poses[i] @ np.linalg.inv(poses[i - 1])
        from sfm_tpu.ops.se3 import transformation_vector_to_matrix

        est = np.asarray(transformation_vector_to_matrix(res.tr))
        assert np.linalg.norm(est[:3, 3] - gt[:3, 3]) < 0.08, (i, est[:3, 3])
        assert int(res.n_matches) > 100


def test_staged_delaunay_step_matches_callback_mode():
    """The staged host-Delaunay pipeline (for runtimes without
    pure_callback): with sparse_filter="delaunay" it must EQUAL the
    callback-fused Delaunay mode; the default hybrid (on-device knnw for
    the sparse pass, which only shapes the dense pass's prior ranges, exact
    host Delaunay for the final filter) must stay close."""
    from sfm_tpu.models.pipeline import make_stereo_frame_step_staged

    left, right, poses = make_sequence(3, SCENE, step=0.5, baseline=BASE)
    params = StereoParams(calib=CAL, base=BASE,
                          bucket=Bucketing(max_features=1000))
    engine = _mk_engine(outlier_mode="delaunay")
    fused = make_stereo_frame_step(W, H, params, engine)
    staged = make_stereo_frame_step_staged(W, H, params, engine,
                                           sparse_filter="delaunay")
    hybrid = make_stereo_frame_step_staged(W, H, params, engine)
    r_fused = _run_seq(fused, left, right, engine, params, n=3)
    r_staged = _run_seq(staged, left, right, engine, params, n=3)
    r_hybrid = _run_seq(hybrid, left, right, engine, params, n=3)
    for rf, rs, rh in zip(r_fused, r_staged, r_hybrid):
        assert bool(rf.success) and bool(rs.success) and bool(rh.success)
        assert int(rf.n_matches) == int(rs.n_matches)
        np.testing.assert_allclose(np.asarray(rf.tr), np.asarray(rs.tr),
                                   atol=1e-5)
        # hybrid: same matches within a few %; Tr within the RANSAC noise
        # floor of this low-res test scene (a handful of differing matches
        # shifts the sample draw)
        assert abs(int(rh.n_matches) - int(rf.n_matches)) <= \
            0.05 * int(rf.n_matches) + 5
        np.testing.assert_allclose(np.asarray(rh.tr), np.asarray(rf.tr),
                                   atol=3e-2)


def test_fused_gain_estimation():
    left, right, poses = make_sequence(3, SCENE, step=0.3, baseline=BASE)
    # simulate a camera gain change on the second frame
    g = 1.15
    left2 = [left[0], np.clip(left[1].astype(np.float32) * g, 0, 255
                              ).astype(np.uint8)]
    right2 = [right[0], np.clip(right[1].astype(np.float32) * g, 0, 255
                                ).astype(np.uint8)]
    params = StereoParams(calib=CAL, base=BASE,
                          bucket=Bucketing(max_features=1000))
    engine = _mk_engine(outlier_mode="grid", compute_gain=True)
    step = make_stereo_frame_step(W, H, params, engine)
    results = _run_seq(step, left2, right2, engine, params, n=2)
    gain = float(results[0].gain)
    assert abs(gain - g) < 0.05, gain


def test_mono_staged_delaunay_matches_callback_mode():
    """Mono staged host-Delaunay pipeline (the reference's only executable
    is the mono SfM app with Delaunay filtering): sparse_filter="delaunay"
    must EQUAL the callback-fused Delaunay mode; the hybrid default stays
    close (sparse filter only shapes the prior ranges)."""
    from sfm_tpu.config import MonoParams
    from sfm_tpu.models.pipeline import (make_mono_frame_step,
                                         make_mono_frame_step_staged)

    left, _, poses = make_sequence(4, SCENE, step=0.5, baseline=BASE)
    params = MonoParams(calib=CAL, height=1.6,
                        bucket=Bucketing(max_features=1000))
    engine = _mk_engine(outlier_mode="delaunay")
    fused = make_mono_frame_step(W, H, params, engine)
    staged = make_mono_frame_step_staged(W, H, params, engine,
                                         sparse_filter="delaunay")
    hybrid = make_mono_frame_step_staged(W, H, params, engine)
    p = params.match
    det = lambda img: detect_features(
        jnp.asarray(img), w=W, h=H, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)

    def run(step):
        prev = det(left[0])
        key = jax.random.PRNGKey(0)
        out = []
        for i in range(1, 4):
            key, k = jax.random.split(key)
            prev, m, res = step(prev, jnp.asarray(left[i]), k)
            out.append(res)
        return out

    r_fused, r_staged, r_hybrid = run(fused), run(staged), run(hybrid)
    for rf, rs, rh in zip(r_fused, r_staged, r_hybrid):
        assert bool(rf.success) and bool(rs.success) and bool(rh.success)
        assert int(rf.n_matches) == int(rs.n_matches)
        np.testing.assert_allclose(np.asarray(rf.tr), np.asarray(rs.tr),
                                   atol=1e-5)
        assert abs(int(rh.n_matches) - int(rf.n_matches)) <= \
            0.05 * int(rf.n_matches) + 5


def test_mono_staged_refinement2_matches_callback_mode():
    """Staged mono at refinement=2 (subpixel parabolic fitting) must equal
    the callback-fused Delaunay mode, and in particular must compact the
    post-refine table back into the FULL max_matches capacity like
    _make_mono_step_core — not clip it to refine_window (ADVICE round-4:
    the staged tail's parabolic branch reintroduced the table-clip
    regression that commit 10462b0 fixed in the fused core)."""
    from sfm_tpu.config import MonoParams
    from sfm_tpu.models.pipeline import (make_mono_frame_step,
                                         make_mono_frame_step_staged)

    left, _, poses = make_sequence(4, SCENE, step=0.5, baseline=BASE)
    params = MonoParams(calib=CAL, height=1.6,
                        bucket=Bucketing(max_features=1000))
    params = replace(params, match=replace(params.match, refinement=2))
    engine = _mk_engine(outlier_mode="delaunay")
    fused = make_mono_frame_step(W, H, params, engine)
    staged = make_mono_frame_step_staged(W, H, params, engine,
                                         sparse_filter="delaunay")
    p = params.match
    det = lambda img: detect_features(
        jnp.asarray(img), w=W, h=H, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)

    def run(step):
        prev = det(left[0])
        key = jax.random.PRNGKey(0)
        out = []
        for i in range(1, 4):
            key, k = jax.random.split(key)
            prev, m, res = step(prev, jnp.asarray(left[i]), k)
            out.append((m, res))
        return out

    r_fused, r_staged = run(fused), run(staged)
    for (mf, rf), (ms, rs) in zip(r_fused, r_staged):
        assert bool(rf.success) and bool(rs.success)
        # the post-refine table keeps the full mono capacity in BOTH paths
        assert mf.valid.shape[0] == engine.max_matches
        assert ms.valid.shape[0] == engine.max_matches
        assert int(rf.n_matches) == int(rs.n_matches)
        np.testing.assert_allclose(np.asarray(rf.tr), np.asarray(rs.tr),
                                   atol=1e-5)


def test_mono_table_not_clipped_by_refine_window():
    """Mono flow tables are denser than stereo quad tables and must NOT be
    capacity-clipped to refine_window after bucketing (doing so measurably
    broke the ground-plane scale: scurve mono failures 30 -> 84 of 99,
    BASELINE.md round-4 note). With a tiny refine_window the match count
    must still exceed it."""
    from sfm_tpu.config import MonoParams
    from sfm_tpu.models.pipeline import make_mono_frame_step

    left, _, poses = make_sequence(3, SCENE, step=0.5, baseline=BASE)
    params = MonoParams(calib=CAL, height=1.6,
                        bucket=Bucketing(max_features=1000))
    engine = EngineConfig(max_features_dense=1024, max_features_sparse=256,
                          max_matches=1024, refine_window=64,
                          outlier_mode="grid")
    step = make_mono_frame_step(W, H, params, engine)
    p = params.match
    det = lambda img: detect_features(
        jnp.asarray(img), w=W, h=H, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)
    prev = det(left[0])
    key = jax.random.PRNGKey(0)
    prev, m, res = step(prev, jnp.asarray(left[1]), key)
    assert int(m.count) > 64, "mono table clipped to refine_window"
    assert m.valid.shape[0] == engine.max_matches
    # (success itself is not asserted: a 64-match refine window legitimately
    # degrades coordinates — the point here is capacity, not accuracy)


def test_odd_capacity_engine_config_runs():
    """Odd (non-power-of-two) EngineConfig capacities must run green: the
    Pallas kernels auto-pad to whole tiles/blocks instead of asserting
    divisibility (VERDICT r4 item 7)."""
    left, right, poses = make_sequence(3, SCENE, step=0.5, baseline=BASE)
    params = StereoParams(calib=CAL, base=BASE,
                          bucket=Bucketing(max_features=1000))
    engine = EngineConfig(max_features_dense=700, max_features_sparse=130,
                          max_matches=500, refine_window=300,
                          outlier_mode="knnw")
    step = make_stereo_frame_step(W, H, params, engine)
    results = _run_seq(step, left, right, engine, params, n=3)
    for i, res in enumerate(results, 1):
        assert bool(res.success), i
        gt = poses[i] @ np.linalg.inv(poses[i - 1])
        from sfm_tpu.ops.se3 import transformation_vector_to_matrix

        est = np.asarray(transformation_vector_to_matrix(res.tr))
        assert np.linalg.norm(est[:3, 3] - gt[:3, 3]) < 0.1, (i, est[:3, 3])


def test_feature_overflow_graceful_degradation(rng):
    """Texture-dense input driving feature/match counts past every cap must
    degrade gracefully (counts clamp to capacity, no NaN/crash), mirroring
    the reference's fixed-capacity behavior under bucketing. Uses tiny caps
    + a high-frequency noise texture so every table saturates."""
    from sfm_tpu.config import MonoParams
    from sfm_tpu.models.pipeline import make_mono_frame_step

    # checkerboard-noise world: far more interest points than the caps
    left, right, poses = make_sequence(3, SCENE, step=0.5, baseline=BASE)
    noisy = [np.clip(f.astype(np.int32)
                     + rng.randint(-70, 70, f.shape), 0, 255
                     ).astype(np.uint8) for f in left]
    params = MonoParams(calib=CAL, height=1.6,
                        bucket=Bucketing(max_features=1000))
    engine = EngineConfig(max_features_dense=96, max_features_sparse=48,
                          max_matches=80, refine_window=80,
                          outlier_mode="grid")
    step = make_mono_frame_step(W, H, params, engine)
    p = params.match
    det = lambda img: detect_features(
        jnp.asarray(img), w=W, h=H, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)
    prev = det(noisy[0])
    assert int(prev.dense.count) == engine.max_features_dense, \
        "test premise: the dense feature table must saturate"
    key = jax.random.PRNGKey(0)
    for i in range(1, 3):
        key, k = jax.random.split(key)
        prev, m, res = step(prev, jnp.asarray(noisy[i]), k)
        # graceful degradation: everything bounded and finite, no crash
        assert int(m.count) <= engine.max_matches
        assert int(prev.dense.count) == engine.max_features_dense
        assert np.all(np.isfinite(np.asarray(res.tr)))
        assert 0 <= int(res.n_inliers) <= int(res.n_matches) <= \
            engine.max_matches
