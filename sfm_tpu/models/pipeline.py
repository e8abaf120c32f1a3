"""Fully-fused on-device frame pipelines.

The Matcher/VO classes interleave host steps (Delaunay outlier removal) with
jitted stages — reference-faithful, but each host round-trip costs tunnel
latency and blocks batching. This module provides the *pure* pipeline: ONE
jitted function per frame step. Outlier filtering follows
EngineConfig.outlier_mode: "grid" keeps everything on-device (radius-support
voting), "delaunay" runs the reference-faithful host filter via
pure_callback while staying a single dispatch. Uses:

  * single-chip speed-of-light execution (bench fast path, grid mode),
  * vmap over a batch of sequences (data parallelism across a mesh; grid
    mode only — callbacks don't shard),
  * the multi-chip dry run.

Refinement honors MatcherParams.refinement (1 = pixel relocate_minimum,
2 = subpixel parabolic fitting, failures dropped — matcher.cpp:1379-1585),
and EngineConfig.compute_gain adds the getGain ratio to the result.

Structure mirrors Matcher::matchFeatures + VisualOdometry*::process
(matcher.cpp:183-241, viso_mono.cpp:33-39, viso_stereo.cpp:33-40).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import EngineConfig, MonoParams, StereoParams
from ..ops.matching import (Matches, bucket_matches, compact_matches,
                            compute_prior_statistics)
from ..ops.nms import FeatureSet
from ..ops.outliers import (delaunay_mask_callback, grid_consistency_mask,
                            knn_consistency_mask)
from ..ops.refine import (parabolic_fitting_prefix, relocate_minimum_prefix,
                          small_ref_descriptors)
from .matcher import FrameFeatures, detect_features, match_flow, match_quad, match_stereo
from .matcher import _gain_means
from .mono import MonoResult, mono_estimate_motion
from .stereo import StereoResult, stereo_estimate_motion


def _outliers(m: Matches, method: int, flow_tol: float, disp_tol: float,
              cap: int, mode: str = "grid",
              engine: EngineConfig = None, limit: int = None) -> Matches:
    """Outlier filtering inside the fused step: "knn" = on-device kNN-graph
    voting (Delaunay analog, default winner config), "grid" = on-device
    radius-disc support, "delaunay" = reference-faithful host callback
    (matcher.cpp:1207-1377 via pure_callback — stays one dispatch per frame,
    two host round-trips).

    `limit`: static upper bound on the VALID match count (tables are
    compacted, so valid entries are a prefix). The sparse pass can never
    exceed the sparse feature capacity, so its [N, N] vote runs on a
    [limit, limit] slice — 16x less work at the default capacities."""
    e = engine or EngineConfig()
    n = m.u1c.shape[0]
    sl = (lambda a: a[:limit]) if (limit and limit < n) else (lambda a: a)
    flow_u, flow_v = m.u1c - m.u1p, m.v1c - m.v1p
    disp = (m.u1c - m.u2c) if method == 1 else (m.u1p - m.u2p)
    if mode == "delaunay":
        keep = delaunay_mask_callback(m.u1c, m.v1c, m.valid, flow_u, flow_v,
                                      disp, method, flow_tol, disp_tol)
    elif mode in ("knn", "knnw"):
        keep = knn_consistency_mask(
            sl(m.u1c), sl(m.v1c), sl(m.valid), sl(flow_u), sl(flow_v),
            sl(disp), method, flow_tol, disp_tol, k=e.outlier_knn_k,
            min_support=e.outlier_min_support, weighted=(mode == "knnw"))
    else:
        keep = grid_consistency_mask(
            sl(m.u1c), sl(m.v1c), sl(m.valid), sl(flow_u), sl(flow_v),
            sl(disp), method, flow_tol, disp_tol,
            radius=e.outlier_grid_radius,
            min_support=e.outlier_min_support)
    if keep.shape[0] != n:
        keep = jnp.concatenate(
            [keep, jnp.zeros((n - keep.shape[0],), bool)])
    return compact_matches(m._replace(valid=keep), cap)


def _grid_outliers(m: Matches, method: int, flow_tol: float, disp_tol: float,
                   cap: int) -> Matches:
    return _outliers(m, method, flow_tol, disp_tol, cap, "grid")


def make_mono_frame_step(w: int, h: int, params: MonoParams,
                         engine: EngineConfig):
    """Returns a jitted pure function:

        (prev: FrameFeatures, img [h,w] u8, key) ->
            (cur: FrameFeatures, matches: Matches, result: MonoResult)

    The caller threads `cur` back in as `prev` for the next frame (the
    matcher ring buffer, matcher.cpp:108-155, becomes explicit state).
    """
    return jax.jit(_make_mono_step_core(w, h, params, engine))


def _make_mono_step_core(w: int, h: int, params: MonoParams,
                         engine: EngineConfig):
    p = params.match
    radius = p.match_radius / 2 if p.half_resolution else p.match_radius
    nbu = -(-w // p.match_binsize)
    nbv = -(-h // p.match_binsize)
    kw = dict(w=w, h=h, binsize=p.match_binsize, nbu=nbu, nbv=nbv,
              radius=float(radius), disp_tol=float(p.match_disp_tolerance),
              cap=engine.max_matches)
    calib = jnp.asarray([params.calib.f, params.calib.cu, params.calib.cv],
                        jnp.float32)

    mode = engine.outlier_mode

    def step(prev: FrameFeatures, img, key):
        cur = detect_features(
            img, w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
            multi_stage=p.multi_stage, half_resolution=p.half_resolution,
            cap_sparse=engine.max_features_sparse,
            cap_dense=engine.max_features_dense)
        k_bucket, k_ransac = jax.random.split(key)

        m1 = match_flow(prev.sparse, cur.sparse, None, use_rt=False, **kw)
        m1 = _outliers(m1, 0, p.outlier_flow_tolerance,
                       p.outlier_disp_tolerance, engine.max_matches, mode,
                       engine, limit=engine.max_features_sparse)
        rt = compute_prior_statistics(
            m1, method=0, n_bins_u=nbu, n_bins_v=nbv,
            binsize=p.match_binsize, match_radius=float(radius))
        m2 = match_flow(prev.dense, cur.dense, rt, use_rt=True, **kw)

        def refine(m2, rw):
            if p.refinement == 2:
                u1p, v1p, ok = parabolic_fitting_prefix(
                    cur.du_full, cur.dv_full, prev.du_full, prev.dv_full,
                    m2.u1c, m2.v1c, m2.u1p, m2.v1p,
                    jnp.float32(w), jnp.float32(h), window=rw, count=m2.count)
                return compact_matches(
                    m2._replace(u1p=u1p, v1p=v1p, valid=m2.valid & ok),
                    engine.max_matches)
            u1p, v1p = relocate_minimum_prefix(
                cur.du_full, cur.dv_full, prev.du_full, prev.dv_full,
                m2.u1c, m2.v1c, m2.u1p, m2.v1p,
                jnp.float32(w), jnp.float32(h), window=rw, count=m2.count)
            return m2._replace(u1p=u1p, v1p=v1p)

        if p.refinement > 0 and engine.refine_pre_filter:
            # reference stage order: refine BEFORE the second outlier
            # filter (matcher.cpp:229-232)
            m2 = refine(m2, engine.max_matches)
        m2 = _outliers(m2, 0, p.outlier_flow_tolerance,
                       p.outlier_disp_tolerance, engine.max_matches, mode,
                       engine)
        # MONO keeps the FULL max_matches post-bucket table: flow matching
        # is far denser than the stereo quad closure and measurably
        # saturates a refine_window-sized table (scurve: count pinned at
        # 2048 and mono failures 30 -> 84 of 99 when clipped — BASELINE.md
        # round-4 note). The stereo core's smaller table is safe because
        # quad counts stay well under the window (~1069 at bench).
        m2 = bucket_matches(m2, k_bucket, params.bucket.max_features,
                            params.bucket.bucket_width,
                            params.bucket.bucket_height, engine.max_matches)
        # fast path refines AFTER filtering/bucketing (fewer matches to
        # patch-gather; the +-2 px moves are well inside the 5 px outlier
        # tolerances, so filter results are equivalent in practice — pinned
        # by tests/test_sequence_and_placement.py).
        # MONO refines the FULL table, not just the refine_window prefix:
        # flow tables run past the window (scurve ~2756 > 2048) and the
        # uncovered tail enters the estimator with half-res-quantized
        # coordinates — measured scurve mono 9.28±0.53 -> 8.52±0.18 t_err
        # with full coverage (round-5; same mechanism as the round-3
        # w1024 fork one level up)
        if p.refinement > 0 and not engine.refine_pre_filter:
            m2 = refine(m2, engine.max_matches)
        res = mono_estimate_motion(
            m2, k_ransac, calib, jnp.float32(params.height),
            jnp.float32(params.pitch), jnp.float32(params.inlier_threshold),
            jnp.float32(params.motion_threshold),
            ransac_iters=params.ransac_iters)
        if engine.compute_gain:
            res = res._replace(gain=_gain_means(
                prev.img, cur.img, m2.u1p, m2.v1p, m2.u1c, m2.v1c,
                m2.valid & res.inliers, w=w, h=h))
        return cur, m2, res

    return step


def make_mono_sequence_fn(w: int, h: int, params: MonoParams,
                          engine: EngineConfig):
    """One-dispatch N-frame mono pipeline (lax.scan over the frame axis).

    (prev: FrameFeatures, imgs [N,h,w] u8, key) ->
        (last: FrameFeatures, trs [N,6], success [N], n_matches [N],
         n_inliers [N])

    Per-frame dispatch costs ~ms of host/tunnel latency each; scanning runs
    the whole (inherently sequential) frame chain on-device.
    """
    step = _make_mono_step_core(w, h, params, engine)

    def seq(prev: FrameFeatures, imgs, key):
        n = imgs.shape[0]
        # fori_loop + leading-axis dynamic slice (layout-preserving) instead
        # of lax.scan xs (transposed slice materialization — see the stereo
        # sequence note)
        acc0 = (jnp.zeros((n, 6), jnp.float32), jnp.zeros((n,), bool),
                jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32))

        def body(i, carry):
            prev_, acc = carry
            img = jax.lax.dynamic_index_in_dim(imgs, i, keepdims=False)
            cur, _, res = step(prev_, img, jax.random.fold_in(key, i))
            trs, suc, nm, ni = acc
            acc = (trs.at[i].set(res.tr), suc.at[i].set(res.success),
                   nm.at[i].set(res.n_matches), ni.at[i].set(res.n_inliers))
            return (cur, acc)

        last, ys = jax.lax.fori_loop(0, n, body, (prev, acc0))
        return (last,) + ys

    return jax.jit(seq)


def make_mono_frame_step_staged(w: int, h: int, params: MonoParams,
                                engine: EngineConfig,
                                sparse_filter: str = "knnw"):
    """Reference-faithful Delaunay outlier mode for MONO on runtimes
    WITHOUT host callbacks (the mono SfM app is the reference's only
    executable pipeline, main.cpp:94-122, and it filters with Delaunay):
    detect + sparse match (+ on-device sparse filter by default) + dense
    match in one dispatch, ONE host hop for the exact final Delaunay, then
    the jitted bucket/refine/estimate tail. sparse_filter="delaunay" adds
    the second exact hop (mirrors the stereo variant).

    Same signature/results as make_mono_frame_step with
    outlier_mode="delaunay".
    """
    import numpy as np

    from ..ops.outliers import delaunay_support_mask

    p = params.match
    radius = p.match_radius / 2 if p.half_resolution else p.match_radius
    nbu = -(-w // p.match_binsize)
    nbv = -(-h // p.match_binsize)
    kw = dict(w=w, h=h, binsize=p.match_binsize, nbu=nbu, nbv=nbv,
              radius=float(radius), disp_tol=float(p.match_disp_tolerance),
              cap=engine.max_matches)
    calib = jnp.asarray([params.calib.f, params.calib.cu, params.calib.cv],
                        jnp.float32)

    def detect(img):
        return detect_features(
            img, w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
            multi_stage=p.multi_stage, half_resolution=p.half_resolution,
            cap_sparse=engine.max_features_sparse,
            cap_dense=engine.max_features_dense)

    def hostpack(m):
        # one device->host transfer per hop (see stereo staged note)
        return jnp.stack([m.u1c, m.v1c, m.valid.astype(jnp.float32),
                          m.u1c - m.u1p, m.v1c - m.v1p, m.u1p - m.u2p])

    @jax.jit
    def stage_a(prev, img):
        cur = detect(img)
        m1 = match_flow(prev.sparse, cur.sparse, None, use_rt=False, **kw)
        return cur, m1, hostpack(m1)

    @jax.jit
    def stage_ab(prev, img):
        cur = detect(img)
        m1 = match_flow(prev.sparse, cur.sparse, None, use_rt=False, **kw)
        m1 = _outliers(m1, 0, p.outlier_flow_tolerance,
                       p.outlier_disp_tolerance, engine.max_matches,
                       "knnw", engine, limit=engine.max_features_sparse)
        rt = compute_prior_statistics(
            m1, method=0, n_bins_u=nbu, n_bins_v=nbv,
            binsize=p.match_binsize, match_radius=float(radius))
        m2 = match_flow(prev.dense, cur.dense, rt, use_rt=True, **kw)
        return cur, m2, hostpack(m2)

    @jax.jit
    def stage_b(prev, cur, m1, keep1):
        m1 = compact_matches(m1._replace(valid=m1.valid & keep1),
                             engine.max_matches)
        rt = compute_prior_statistics(
            m1, method=0, n_bins_u=nbu, n_bins_v=nbv,
            binsize=p.match_binsize, match_radius=float(radius))
        m2 = match_flow(prev.dense, cur.dense, rt, use_rt=True, **kw)
        return m2, hostpack(m2)

    @jax.jit
    def tail(prev, cur, m2, keep2, key):
        k_bucket, k_ransac = jax.random.split(key)
        m2 = compact_matches(m2._replace(valid=m2.valid & keep2),
                             engine.max_matches)
        # mono keeps the full table AND refines all of it (see
        # _make_mono_step_core coverage note)
        m2 = bucket_matches(m2, k_bucket, params.bucket.max_features,
                            params.bucket.bucket_width,
                            params.bucket.bucket_height, engine.max_matches)
        if p.refinement > 0:
            wf, hf = jnp.float32(w), jnp.float32(h)
            if p.refinement == 2:
                u1p, v1p, ok = parabolic_fitting_prefix(
                    cur.du_full, cur.dv_full, prev.du_full, prev.dv_full,
                    m2.u1c, m2.v1c, m2.u1p, m2.v1p, wf, hf,
                    window=engine.max_matches, count=m2.count)
                # mono compacts back into the FULL max_matches table, like
                # _make_mono_step_core (clipping reintroduces the scurve
                # mono table-clip regression, BASELINE.md round-4)
                m2 = compact_matches(
                    m2._replace(u1p=u1p, v1p=v1p, valid=m2.valid & ok),
                    engine.max_matches)
            else:
                u1p, v1p = relocate_minimum_prefix(
                    cur.du_full, cur.dv_full, prev.du_full, prev.dv_full,
                    m2.u1c, m2.v1c, m2.u1p, m2.v1p, wf, hf,
                    window=engine.max_matches, count=m2.count)
                m2 = m2._replace(u1p=u1p, v1p=v1p)
        res = mono_estimate_motion(
            m2, k_ransac, calib, jnp.float32(params.height),
            jnp.float32(params.pitch), jnp.float32(params.inlier_threshold),
            jnp.float32(params.motion_threshold),
            ransac_iters=params.ransac_iters)
        if engine.compute_gain:
            res = res._replace(gain=_gain_means(
                prev.img, cur.img, m2.u1p, m2.v1p, m2.u1c, m2.v1c,
                m2.valid & res.inliers, w=w, h=h))
        return m2, res

    def host_mask(pack):
        pk = np.asarray(pack)  # ONE device->host transfer
        return jnp.asarray(delaunay_support_mask(
            pk[0], pk[1], pk[2] > 0.5, pk[3], pk[4], pk[5], 0,
            float(p.outlier_flow_tolerance),
            float(p.outlier_disp_tolerance)))

    def step(prev, img, key):
        if sparse_filter == "knnw":
            cur, m2, pack2 = stage_ab(prev, img)
        else:
            cur, m1, pack1 = stage_a(prev, img)
            keep1 = host_mask(pack1)
            m2, pack2 = stage_b(prev, cur, m1, keep1)
        keep2 = host_mask(pack2)
        m2f, res = tail(prev, cur, m2, keep2, key)
        return cur, m2f, res

    return step


def make_mono_sfm_step(w: int, h: int, params: MonoParams,
                       engine: EngineConfig, recon_params=None):
    """Full monocular SfM frame step — VO + pose integration + mapping — as
    ONE jitted program (the fused equivalent of StructureFromMotion.update,
    sfm.hh:46-77 + reconstruction.cpp:50-146):

        (prev: FrameFeatures, recon: ReconState, tr_total [4,4], img, key) ->
            (prev_next, recon_next, tr_total_next, res: MonoResult,
             points [T,3], point_valid [T])

    Failure semantics match the reference: on VO failure the pose chain and
    reconstruction state are left untouched and prev_next keeps the OLD
    keyframe (the replace=true ring-buffer path, sfm.hh:70-76).
    Emitted points are in the CURRENT camera frame; transform by tr_total on
    the host to accumulate a global map.
    """
    from ..config import ReconstructionParams
    from ..ops.se3 import se3_inverse, transformation_vector_to_matrix
    from .reconstruction import recon_update

    rp = recon_params or ReconstructionParams()
    core = _make_mono_step_core(w, h, params, engine)
    K = jnp.asarray([[params.calib.f, 0.0, params.calib.cu],
                     [0.0, params.calib.f, params.calib.cv],
                     [0.0, 0.0, 1.0]], jnp.float32)
    import math

    cp, sp = math.cos(rp.cam_pitch), math.sin(rp.cam_pitch)
    tr_cam_road = jnp.asarray(
        [[1.0, 0.0, 0.0, 0.0],
         [0.0, cp, -sp, -rp.cam_height],
         [0.0, sp, cp, 0.0],
         [0.0, 0.0, 0.0, 1.0]], jnp.float32)

    def step(prev: FrameFeatures, recon, tr_total, img, key):
        cur, m, res = core(prev, img, key)
        tr_delta = transformation_vector_to_matrix(res.tr)
        tr_total_new = jnp.where(
            res.success, tr_total @ se3_inverse(tr_delta), tr_total)
        recon_new, pts, pt_valid = recon_update(
            recon, m, tr_delta, K, tr_cam_road,
            jnp.float32(rp.max_dist), jnp.float32(rp.min_angle),
            feat_cap=engine.max_features_dense,
            point_type=rp.point_type,
            min_track_length=rp.min_track_length)
        keep_new = res.success
        recon_out = jax.tree.map(
            lambda new, old: jnp.where(keep_new, new, old), recon_new, recon)
        prev_next = jax.tree.map(
            lambda c, p: jnp.where(keep_new, c, p), cur, prev)
        pt_valid = pt_valid & keep_new
        return prev_next, recon_out, tr_total_new, res, pts, pt_valid

    return jax.jit(step)


def make_stereo_sfm_step(w: int, h: int, params: StereoParams,
                         engine: EngineConfig, recon_params=None):
    """Full STEREO SfM frame step — quad-match VO + pose integration +
    mapping — as ONE jitted program (metric-scale counterpart of
    make_mono_sfm_step; the reference's SfM driver is mono-only, sfm.hh:24-44,
    but its Reconstruction consumes exactly these matches,
    reconstruction.cpp:50-146):

        (prev_l, prev_r: FrameFeatures, recon: ReconState, tr_total [4,4],
         tr_prior [4,4], I1, I2, key) ->
            (prev_l', prev_r', recon', tr_total', tr_prior', res, points,
             point_valid)

    Failure semantics as in make_mono_sfm_step: state untouched, old
    keyframe kept, prior Tr reused (viso.h:83-86, sfm.hh:70-76).
    """
    import math

    from ..config import ReconstructionParams
    from ..ops.se3 import se3_inverse, transformation_vector_to_matrix
    from .reconstruction import recon_update

    rp = recon_params or ReconstructionParams()
    core = _make_stereo_step_core(w, h, params, engine)
    K = jnp.asarray([[params.calib.f, 0.0, params.calib.cu],
                     [0.0, params.calib.f, params.calib.cv],
                     [0.0, 0.0, 1.0]], jnp.float32)
    cp, sp = math.cos(rp.cam_pitch), math.sin(rp.cam_pitch)
    tr_cam_road = jnp.asarray(
        [[1.0, 0.0, 0.0, 0.0],
         [0.0, cp, -sp, -rp.cam_height],
         [0.0, sp, cp, 0.0],
         [0.0, 0.0, 0.0, 1.0]], jnp.float32)

    def step(prev_l, prev_r, recon, tr_total, tr_prior, I1, I2, key):
        cur_l, cur_r, m, res = core(prev_l, prev_r, I1, I2, tr_prior, key)
        tr_delta = transformation_vector_to_matrix(res.tr)
        tr_total_new = jnp.where(
            res.success, tr_total @ se3_inverse(tr_delta), tr_total)
        tr_prior_new = jnp.where(res.success, tr_delta, tr_prior)
        recon_new, pts, pt_valid = recon_update(
            recon, m, tr_delta, K, tr_cam_road,
            jnp.float32(rp.max_dist), jnp.float32(rp.min_angle),
            feat_cap=engine.max_features_dense,
            point_type=rp.point_type,
            min_track_length=rp.min_track_length)
        keep_new = res.success
        recon_out = jax.tree.map(
            lambda new, old: jnp.where(keep_new, new, old), recon_new, recon)
        prev_l_next = jax.tree.map(
            lambda c, p: jnp.where(keep_new, c, p), cur_l, prev_l)
        prev_r_next = jax.tree.map(
            lambda c, p: jnp.where(keep_new, c, p), cur_r, prev_r)
        pt_valid = pt_valid & keep_new
        return (prev_l_next, prev_r_next, recon_out, tr_total_new,
                tr_prior_new, res, pts, pt_valid)

    return jax.jit(step)


def make_stereo_sequence_fn(w: int, h: int, params: StereoParams,
                            engine: EngineConfig):
    """One-dispatch N-frame stereo pipeline (lax.scan over the frame axis).

    (prev_l, prev_r: FrameFeatures, tr_prior0 [4,4], imgs_l [N,h,w],
     imgs_r [N,h,w], key) ->
        (last_l, last_r, tr_prior [4,4], trs [N,6], success [N],
         n_matches [N], n_inliers [N])

    Threads the previous frame's estimated motion as the quad-matching
    prediction prior, like the reference keeps Tr_delta across process()
    calls (viso_stereo.cpp:33-40; kept unchanged on failure, viso.h:83-86).
    The prior is part of the carry interface so callers can chain chunks.
    """
    step = _make_stereo_step_core(w, h, params, engine)
    from ..ops.se3 import transformation_vector_to_matrix

    def seq(prev_l: FrameFeatures, prev_r: FrameFeatures, tr_prior0,
            imgs_l, imgs_r, key):
        n = imgs_l.shape[0]
        # fori_loop + dynamic_index instead of lax.scan over the image axis:
        # scan materializes each xs slice in a transposed layout, adding a
        # full-image relayout copy per frame (~30% of the step — bench.py
        # round-4 note); a leading-axis dynamic slice is layout-preserving
        acc0 = (jnp.zeros((n, 6), jnp.float32), jnp.zeros((n,), bool),
                jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32))

        def body(i, carry):
            pl_, pr_, tr_prior, acc = carry
            il = jax.lax.dynamic_index_in_dim(imgs_l, i, keepdims=False)
            ir = jax.lax.dynamic_index_in_dim(imgs_r, i, keepdims=False)
            cl, cr, _, res = step(pl_, pr_, il, ir, tr_prior,
                                  jax.random.fold_in(key, i))
            tr_next = jnp.where(res.success,
                                transformation_vector_to_matrix(res.tr),
                                tr_prior)
            trs, suc, nm, ni = acc
            acc = (trs.at[i].set(res.tr), suc.at[i].set(res.success),
                   nm.at[i].set(res.n_matches), ni.at[i].set(res.n_inliers))
            return (cl, cr, tr_next, acc)

        last_l, last_r, trp, ys = jax.lax.fori_loop(
            0, n, body, (prev_l, prev_r, tr_prior0, acc0))
        return (last_l, last_r, trp) + ys

    return jax.jit(seq)


def make_stereo_match_step(w: int, h: int, params, engine: EngineConfig):
    """Fused single-dispatch STEREO-ONLY matching (method=1): the pipeline
    equivalent of Matcher.match_features(1) (reference matcher.cpp:1045-1084
    closure inside matchFeatures, matcher.cpp:183-241).

        (I1, I2) -> (cur_l: FrameFeatures, cur_r: FrameFeatures,
                     matches: Matches)

    No temporal state: method=1 matches the CURRENT left/right pair only.
    Stage order is the reference's (two-pass sparse->dense, refinement
    before the second outlier pass). `params` is a MatcherParams (pure
    matching has no VO parameters).
    """
    p = params
    radius = p.match_radius / 2 if p.half_resolution else p.match_radius
    nbu = -(-w // p.match_binsize)
    nbv = -(-h // p.match_binsize)
    kw = dict(w=w, h=h, binsize=p.match_binsize, nbu=nbu, nbv=nbv,
              radius=float(radius), disp_tol=float(p.match_disp_tolerance),
              cap=engine.max_matches)
    mode = engine.outlier_mode

    def detect(img):
        return detect_features(
            img, w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
            multi_stage=p.multi_stage, half_resolution=p.half_resolution,
            cap_sparse=engine.max_features_sparse,
            cap_dense=engine.max_features_dense)

    def step(I1, I2):
        cur_l = detect(I1)
        cur_r = detect(I2)
        if p.multi_stage:
            m1 = match_stereo(cur_l.sparse, cur_r.sparse, None,
                              use_rt=False, **kw)
            m1 = _outliers(m1, 1, p.outlier_flow_tolerance,
                           p.outlier_disp_tolerance, engine.max_matches,
                           mode, engine, limit=engine.max_features_sparse)
            rt = compute_prior_statistics(
                m1, method=1, n_bins_u=nbu, n_bins_v=nbv,
                binsize=p.match_binsize, match_radius=float(radius))
            m2 = match_stereo(cur_l.dense, cur_r.dense, rt, use_rt=True, **kw)
        else:
            m2 = match_stereo(cur_l.dense, cur_r.dense, None,
                              use_rt=False, **kw)
        if p.refinement > 0:
            # method=1 refines the right-image coordinate u2c/v2c on the
            # full-res gradients (matcher.cpp:1516-1527 target selection)
            wf, hf = jnp.float32(w), jnp.float32(h)
            if p.refinement == 2:
                u2c, v2c, ok = parabolic_fitting_prefix(
                    cur_l.du_full, cur_l.dv_full, cur_r.du_full,
                    cur_r.dv_full, m2.u1c, m2.v1c, m2.u2c, m2.v2c, wf, hf,
                    count=m2.count)
                m2 = compact_matches(
                    m2._replace(u2c=u2c, v2c=v2c, valid=m2.valid & ok),
                    engine.max_matches)
            else:
                u2c, v2c = relocate_minimum_prefix(
                    cur_l.du_full, cur_l.dv_full, cur_r.du_full,
                    cur_r.dv_full, m2.u1c, m2.v1c, m2.u2c, m2.v2c, wf, hf,
                    count=m2.count)
                m2 = m2._replace(u2c=u2c, v2c=v2c)
        m2 = _outliers(m2, 1, p.outlier_flow_tolerance,
                       p.outlier_disp_tolerance, engine.max_matches, mode,
                       engine)
        return cur_l, cur_r, m2

    return jax.jit(step)


def make_stereo_frame_step_staged(w: int, h: int, params: StereoParams,
                                  engine: EngineConfig,
                                  sparse_filter: str = "knnw"):
    """Reference-faithful Delaunay outlier mode for runtimes WITHOUT host
    callbacks (the axon PJRT tunnel rejects pure_callback): the final
    (result-determining) outlier filter is the exact host Delaunay; the
    SPARSE-pass filter — which only shapes the dense pass's search-range
    prior table — runs on device as the knnw analog by default, merging the
    first two stages into one dispatch: 2 dispatches + 1 host hop per frame.
    Pass sparse_filter="delaunay" for the fully-exact two-hop variant
    (3 dispatches + 2 hops; the class-path Matcher is exact everywhere and
    is what the reference parity suite pins).

    Same signature/results as make_stereo_frame_step with
    outlier_mode="delaunay".
    """
    import numpy as np

    from ..ops.outliers import delaunay_support_mask

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

    def detect(img):
        return detect_features(
            img, w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
            multi_stage=p.multi_stage, half_resolution=p.half_resolution,
            cap_sparse=engine.max_features_sparse,
            cap_dense=engine.max_features_dense)

    def hostpack(m):
        # everything the host Delaunay filter needs as ONE array: each
        # np.asarray of a separate device buffer is a synchronous tunnel
        # round trip (6 arrays x 2 hops was the entire 3 fps of this mode)
        return jnp.stack([m.u1c, m.v1c, m.valid.astype(jnp.float32),
                          m.u1c - m.u1p, m.v1c - m.v1p, m.u1p - m.u2p])

    @jax.jit
    def stage_a(prev_l, prev_r, I1, I2, tr_prior):
        cur_l = detect(I1)
        cur_r = detect(I2)
        m1 = match_quad(prev_l.sparse, prev_r.sparse, cur_l.sparse,
                        cur_r.sparse, None, tr_prior, calib4,
                        use_rt=False, use_tr=True, **kw)
        return cur_l, cur_r, m1, hostpack(m1)

    @jax.jit
    def stage_ab(prev_l, prev_r, I1, I2, tr_prior):
        # merged: detect + sparse match + ON-DEVICE sparse filter + dense
        # match in one dispatch (the sparse filter only feeds the range
        # prior table; the exact Delaunay still decides the final set)
        cur_l = detect(I1)
        cur_r = detect(I2)
        m1 = match_quad(prev_l.sparse, prev_r.sparse, cur_l.sparse,
                        cur_r.sparse, None, tr_prior, calib4,
                        use_rt=False, use_tr=True, **kw)
        m1 = _outliers(m1, 2, p.outlier_flow_tolerance,
                       p.outlier_disp_tolerance, engine.max_matches,
                       "knnw", engine, limit=engine.max_features_sparse)
        rt = compute_prior_statistics(
            m1, method=2, n_bins_u=nbu, n_bins_v=nbv,
            binsize=p.match_binsize, match_radius=float(radius))
        m2 = match_quad(prev_l.dense, prev_r.dense, cur_l.dense,
                        cur_r.dense, rt, tr_prior, calib4,
                        use_rt=True, use_tr=True, **kw)
        return cur_l, cur_r, m2, hostpack(m2)

    @jax.jit
    def stage_b(prev_l, prev_r, cur_l, cur_r, m1, keep1, tr_prior):
        m1 = compact_matches(m1._replace(valid=m1.valid & keep1),
                             engine.max_matches)
        rt = compute_prior_statistics(
            m1, method=2, n_bins_u=nbu, n_bins_v=nbv,
            binsize=p.match_binsize, match_radius=float(radius))
        m2 = match_quad(prev_l.dense, prev_r.dense, cur_l.dense,
                        cur_r.dense, rt, tr_prior, calib4,
                        use_rt=True, use_tr=True, **kw)
        return m2, hostpack(m2)

    # stage C == the tail of the fused step (bucket/refine/estimate); reuse
    # the fused core on pre-filtered matches by marking outliers invalid
    core_tail = _make_stereo_tail(w, h, params, engine, calib4, kw)

    def host_mask(pack):
        pk = np.asarray(pack)  # ONE device->host transfer
        return jnp.asarray(delaunay_support_mask(
            pk[0], pk[1], pk[2] > 0.5, pk[3], pk[4], pk[5], 2,
            float(p.outlier_flow_tolerance),
            float(p.outlier_disp_tolerance)))

    def step(prev_l, prev_r, I1, I2, tr_prior, key):
        if sparse_filter == "knnw":
            cur_l, cur_r, m2, pack2 = stage_ab(prev_l, prev_r, I1, I2,
                                               tr_prior)
        else:
            cur_l, cur_r, m1, pack1 = stage_a(prev_l, prev_r, I1, I2,
                                              tr_prior)
            keep1 = host_mask(pack1)
            m2, pack2 = stage_b(prev_l, prev_r, cur_l, cur_r, m1, keep1,
                                tr_prior)
        keep2 = host_mask(pack2)
        m2f, res = core_tail(prev_l, prev_r, cur_l, cur_r, m2, keep2, key)
        return cur_l, cur_r, m2f, res

    return step


def _make_stereo_tail(w, h, params, engine, calib4, kw):
    """Jitted bucket+refine+estimate tail shared by the staged pipeline."""
    p = params.match

    @jax.jit
    def tail(prev_l, prev_r, cur_l, cur_r, m2, keep2, key):
        k_bucket, k_ransac = jax.random.split(key)
        m2 = compact_matches(m2._replace(valid=m2.valid & keep2),
                             engine.max_matches)
        # post-bucket table capacity = refine_window (see stereo core note)
        m2 = bucket_matches(m2, k_bucket, params.bucket.max_features,
                            params.bucket.bucket_width,
                            params.bucket.bucket_height,
                            min(engine.refine_window, engine.max_matches))
        if p.refinement > 0:
            rw = min(engine.refine_window, engine.max_matches)
            ref = small_ref_descriptors(cur_l.du_full, cur_l.dv_full,
                                        m2.u1c[:rw], m2.v1c[:rw], count=m2.count)
            wf, hf = jnp.float32(w), jnp.float32(h)
            if p.refinement == 2:
                u1p, v1p, ok1 = parabolic_fitting_prefix(
                    cur_l.du_full, cur_l.dv_full, prev_l.du_full,
                    prev_l.dv_full, m2.u1c, m2.v1c, m2.u1p, m2.v1p,
                    wf, hf, window=rw, ref=ref, count=m2.count)
                u2c, v2c, ok2 = parabolic_fitting_prefix(
                    cur_l.du_full, cur_l.dv_full, cur_r.du_full,
                    cur_r.dv_full, m2.u1c, m2.v1c, m2.u2c, m2.v2c,
                    wf, hf, window=rw, ref=ref, count=m2.count)
                u2p, v2p, ok3 = parabolic_fitting_prefix(
                    cur_l.du_full, cur_l.dv_full, prev_r.du_full,
                    prev_r.dv_full, m2.u1c, m2.v1c, m2.u2p, m2.v2p,
                    wf, hf, window=rw, ref=ref, count=m2.count)
                m2 = compact_matches(
                    m2._replace(u1p=u1p, v1p=v1p, u2c=u2c, v2c=v2c,
                                u2p=u2p, v2p=v2p,
                                valid=m2.valid & ok1 & ok2 & ok3),
                    engine.max_matches)
            else:
                u1p, v1p = relocate_minimum_prefix(
                    cur_l.du_full, cur_l.dv_full, prev_l.du_full,
                    prev_l.dv_full, m2.u1c, m2.v1c, m2.u1p, m2.v1p,
                    wf, hf, window=rw, ref=ref, count=m2.count)
                u2c, v2c = relocate_minimum_prefix(
                    cur_l.du_full, cur_l.dv_full, cur_r.du_full,
                    cur_r.dv_full, m2.u1c, m2.v1c, m2.u2c, m2.v2c,
                    wf, hf, window=rw, ref=ref, count=m2.count)
                u2p, v2p = relocate_minimum_prefix(
                    cur_l.du_full, cur_l.dv_full, prev_r.du_full,
                    prev_r.dv_full, m2.u1c, m2.v1c, m2.u2p, m2.v2p,
                    wf, hf, window=rw, ref=ref, count=m2.count)
                m2 = m2._replace(u1p=u1p, v1p=v1p, u2c=u2c, v2c=v2c,
                                 u2p=u2p, v2p=v2p)
        res = stereo_estimate_motion(
            m2, k_ransac, calib4, jnp.float32(params.inlier_threshold),
            ransac_iters=params.ransac_iters,
            reweighting=params.reweighting)
        if engine.compute_gain:
            res = res._replace(gain=_gain_means(
                prev_l.img, cur_l.img, m2.u1p, m2.v1p, m2.u1c, m2.v1c,
                m2.valid & res.inliers, w=w, h=h))
        return m2, res

    return tail


def make_stereo_frame_step(w: int, h: int, params: StereoParams,
                           engine: EngineConfig):
    """Jitted pure quad-matching stereo step:

        (prev_l, prev_r: FrameFeatures, I1, I2, tr_prior [4,4], use_prior
         (traced bool folded via where), key) ->
            (cur_l, cur_r, matches, result: StereoResult)
    """
    return jax.jit(_make_stereo_step_core(w, h, params, engine))


def _make_stereo_step_core(w: int, h: int, params: StereoParams,
                           engine: EngineConfig):
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

    def detect(img):
        return detect_features(
            img, w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
            multi_stage=p.multi_stage, half_resolution=p.half_resolution,
            cap_sparse=engine.max_features_sparse,
            cap_dense=engine.max_features_dense)

    mode = engine.outlier_mode

    def detect_pair(I1, I2):
        if not engine.batched_detect:
            return detect(I1), detect(I2)
        # one batched detect program for both images: the fused filter
        # kernel runs as a 2-step grid and NMS/descriptor work is batched
        # (halves the detect-stage op count the scheduler must interleave)
        curs = jax.vmap(detect)(jnp.stack([I1, I2]))
        cur_l = jax.tree.map(lambda x: x[0], curs)
        cur_r = jax.tree.map(lambda x: x[1], curs)
        return cur_l, cur_r

    def step(prev_l: FrameFeatures, prev_r: FrameFeatures, I1, I2, tr_prior,
             key):
        cur_l, cur_r = detect_pair(I1, I2)
        k_bucket, k_ransac = jax.random.split(key)

        m1 = match_quad(prev_l.sparse, prev_r.sparse, cur_l.sparse,
                        cur_r.sparse, None, tr_prior, calib4,
                        use_rt=False, use_tr=True, **kw)
        m1 = _outliers(m1, 2, p.outlier_flow_tolerance,
                       p.outlier_disp_tolerance, engine.max_matches, mode,
                       engine, limit=engine.max_features_sparse)
        rt = compute_prior_statistics(
            m1, method=2, n_bins_u=nbu, n_bins_v=nbv,
            binsize=p.match_binsize, match_radius=float(radius))
        m2 = match_quad(prev_l.dense, prev_r.dense, cur_l.dense, cur_r.dense,
                        rt, tr_prior, calib4, use_rt=True, use_tr=True, **kw)

        def refine(m2, rw):
            # all three relocations share the same reference descriptor
            # (cur-left at u1c/v1c); extract it once. NOTE: keeping these as
            # FOUR separate patch-kernel launches is the measured optimum —
            # both a fully-fused relocate kernel (in-kernel SAD surface) and
            # a one-launch segmented extraction benched SLOWER (146.5/146.8
            # vs 151.5 fps): small launches overlap surrounding fusions,
            # one long kernel serializes (BASELINE.md round-4 ledger)
            wf, hf = jnp.float32(w), jnp.float32(h)
            ref = small_ref_descriptors(cur_l.du_full, cur_l.dv_full,
                                        m2.u1c[:rw], m2.v1c[:rw],
                                        count=m2.count)
            if p.refinement == 2:
                u1p, v1p, ok1 = parabolic_fitting_prefix(
                    cur_l.du_full, cur_l.dv_full, prev_l.du_full,
                    prev_l.dv_full, m2.u1c, m2.v1c, m2.u1p, m2.v1p,
                    wf, hf, window=rw, ref=ref, count=m2.count)
                u2c, v2c, ok2 = parabolic_fitting_prefix(
                    cur_l.du_full, cur_l.dv_full, cur_r.du_full,
                    cur_r.dv_full, m2.u1c, m2.v1c, m2.u2c, m2.v2c,
                    wf, hf, window=rw, ref=ref, count=m2.count)
                u2p, v2p, ok3 = parabolic_fitting_prefix(
                    cur_l.du_full, cur_l.dv_full, prev_r.du_full,
                    prev_r.dv_full, m2.u1c, m2.v1c, m2.u2p, m2.v2p,
                    wf, hf, window=rw, ref=ref, count=m2.count)
                return compact_matches(
                    m2._replace(u1p=u1p, v1p=v1p, u2c=u2c, v2c=v2c,
                                u2p=u2p, v2p=v2p,
                                valid=m2.valid & ok1 & ok2 & ok3),
                    engine.max_matches)
            u1p, v1p = relocate_minimum_prefix(
                cur_l.du_full, cur_l.dv_full, prev_l.du_full,
                prev_l.dv_full, m2.u1c, m2.v1c, m2.u1p, m2.v1p,
                wf, hf, window=rw, ref=ref, count=m2.count)
            u2c, v2c = relocate_minimum_prefix(
                cur_l.du_full, cur_l.dv_full, cur_r.du_full,
                cur_r.dv_full, m2.u1c, m2.v1c, m2.u2c, m2.v2c,
                wf, hf, window=rw, ref=ref, count=m2.count)
            u2p, v2p = relocate_minimum_prefix(
                cur_l.du_full, cur_l.dv_full, prev_r.du_full,
                prev_r.dv_full, m2.u1c, m2.v1c, m2.u2p, m2.v2p,
                wf, hf, window=rw, ref=ref, count=m2.count)
            return m2._replace(u1p=u1p, v1p=v1p, u2c=u2c, v2c=v2c,
                               u2p=u2p, v2p=v2p)

        if p.refinement > 0 and engine.refine_pre_filter:
            # reference stage order: refine every dense-pass match BEFORE
            # the second outlier filter (matcher.cpp:229-232)
            m2 = refine(m2, engine.max_matches)
        m2 = _outliers(m2, 2, p.outlier_flow_tolerance,
                       p.outlier_disp_tolerance, engine.max_matches, mode,
                       engine)
        # bucketing compacts into a refine_window-capacity table: the window
        # must cover every post-filter match anyway (config.py note), and the
        # smaller static table halves the row work of refinement + the whole
        # estimate stage (RANSAC scoring, final GN)
        cap_pb = min(engine.refine_window, engine.max_matches)
        m2 = bucket_matches(m2, k_bucket, params.bucket.max_features,
                            params.bucket.bucket_width,
                            params.bucket.bucket_height, cap_pb)
        # fast path refines AFTER filtering/bucketing (see mono note)
        if p.refinement > 0 and not engine.refine_pre_filter:
            m2 = refine(m2, cap_pb)
        res = stereo_estimate_motion(
            m2, k_ransac, calib4, jnp.float32(params.inlier_threshold),
            ransac_iters=params.ransac_iters,
            reweighting=params.reweighting)
        if engine.compute_gain:
            res = res._replace(gain=_gain_means(
                prev_l.img, cur_l.img, m2.u1p, m2.v1p, m2.u1c, m2.v1c,
                m2.valid & res.inliers, w=w, h=h))
        return cur_l, cur_r, m2, res

    return step
