"""Matcher: feature detection + circular matching pipeline.

TPU-native equivalent of the reference Matcher class (viso/matcher.{h,cpp}):
ring buffer of (previous, current) frame features, two-pass sparse->dense
matching with per-bin search-range priors, circle closure for flow / stereo /
quad methods, Delaunay outlier removal, refinement, bucketing, and gain
estimation.

Host/device split: feature detection and each matching pass are single jitted
programs over fixed-capacity arrays; Delaunay outlier removal round-trips to
the host (see ops/outliers.py) unless EngineConfig.outlier_mode="grid".
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, MatcherParams
from ..ops import filters
from ..ops.descriptors import compute_descriptors
from ..ops.matching import (
    Matches,
    RangeTable,
    bucket_matches,
    compact_matches,
    compute_prior_statistics,
    dedup_by_pixel,
    empty_matches,
    sad_argmin,
)
from ..ops.nms import MARGIN, FeatureSet, nms_features, sparse_nms_n
from ..ops.outliers import (delaunay_support_mask, grid_consistency_mask,
                            knn_consistency_mask)
from ..ops.refine import parabolic_fitting, relocate_minimum


@jax.jit
def _compact_with_mask(m: Matches, keep) -> Matches:
    """Jitted mask+compact (keeps the host path to one dispatch instead of
    ~40 eager ops, which matters over the TPU tunnel)."""
    return compact_matches(m._replace(valid=keep), m.valid.shape[0])


@functools.partial(jax.jit, static_argnames=("method",))
def _delaunay_hostpack(m: Matches, method: int):
    """Everything the host Delaunay filter reads, as ONE array — each
    np.asarray of a separate device buffer costs a synchronous tunnel
    round trip."""
    disp = (m.u1c - m.u2c) if method == 1 else (m.u1p - m.u2p)
    return jnp.stack([m.u1c, m.v1c, m.valid.astype(jnp.float32),
                      m.u1c - m.u1p, m.v1c - m.v1p, disp])


class FrameFeatures(NamedTuple):
    """Features + gradients for one image of one frame."""

    sparse: FeatureSet   # 1st-pass features, full-resolution coords
    dense: FeatureSet    # 2nd-pass features, full-resolution coords
    du_full: jnp.ndarray  # full-res Sobel x-gradient (uint8)
    dv_full: jnp.ndarray  # full-res Sobel y-gradient (uint8)
    img: jnp.ndarray      # original image (uint8), for gain estimation


@functools.partial(
    jax.jit,
    static_argnames=("w", "h", "nms_n", "nms_tau", "multi_stage",
                     "half_resolution", "cap_sparse", "cap_dense"),
)
def detect_features(
    img: jnp.ndarray,
    *,
    w: int,
    h: int,
    nms_n: int,
    nms_tau: int,
    multi_stage: int,
    half_resolution: int,
    cap_sparse: int,
    cap_dense: int,
) -> FrameFeatures:
    """computeFeatures equivalent (matcher.cpp:649-732): filter the matching-
    resolution image, run sparse+dense NMS, gather descriptors, scale
    coordinates to full resolution."""
    if half_resolution:
        wm, hm = w // 2, h // 2
        img_m = filters.half_resolution(img, hm, wm)
        s = 2
    else:
        wm, hm = w, h
        img_m = img
        s = 1

    if jax.default_backend() == "tpu":
        # one fused VMEM pass per image (exact integer parity with the jnp
        # filters; computeFeatures as a single kernel, matcher.cpp:649-732)
        from ..ops.pallas_kernels import detect_filters_pallas

        du_m, dv_m, f1, f2 = detect_filters_pallas(img_m,
                                                   with_blob_checker=True)
        du_full, dv_full = (detect_filters_pallas(img, with_blob_checker=False)
                            if half_resolution else (du_m, dv_m))
    else:
        du_m, dv_m = filters.sobel5x5(img_m)
        du_full, dv_full = (filters.sobel5x5(img) if half_resolution
                            else (du_m, dv_m))
        f1 = filters.blob5x5(img_m)
        f2 = filters.checkerboard5x5(img_m)

    def detect(n, cap):
        fs = nms_features(f1, f2, w=wm, h=hm, n=n, tau=nms_tau, cap=cap)
        desc = compute_descriptors(du_m, dv_m, fs.u, fs.v)
        return fs._replace(u=fs.u * s, v=fs.v * s, desc=desc)

    if multi_stage:
        sparse = detect(sparse_nms_n(nms_n), cap_sparse)
    else:
        from ..ops.nms import empty_feature_set

        sparse = empty_feature_set(cap_sparse)
    dense = detect(nms_n, cap_dense)
    return FrameFeatures(sparse, dense, du_full, dv_full, img)


# ---------------------------------------------------------------------------
# Matching passes (flow / stereo / quad circle closures)
# ---------------------------------------------------------------------------

def _bin_of(u, v, binsize, nbu, nbv):
    bu = jnp.clip(jnp.floor(u.astype(jnp.float32) / binsize).astype(jnp.int32), 0, nbu - 1)
    bv = jnp.clip(jnp.floor(v.astype(jnp.float32) / binsize).astype(jnp.int32), 0, nbv - 1)
    return bv * nbu + bu


def _bounds(u_src, v_src, stat_bin, rt: Optional[RangeTable], stage: int,
            flow: bool, radius: float, disp_tol: float):
    """Search bounds for one pass (matcher.cpp:907-928)."""
    u = u_src.astype(jnp.float32)
    v = v_src.astype(jnp.float32)
    if rt is None:
        u_min, u_max = u - radius, u + radius
        v_min, v_max = v - radius, v + radius
    else:
        if jax.default_backend() == "tpu":
            # [N] gathers from the range table serialize on TPU; fetch all
            # four bounds with one one-hot matmul over the (small) bin table
            nb = rt.u_min.shape[0]
            oh = (stat_bin[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, nb), 1)).astype(jnp.float32)
            tab = jnp.stack([rt.u_min[:, stage], rt.u_max[:, stage],
                             rt.v_min[:, stage], rt.v_max[:, stage]], axis=1)
            out = jnp.einsum("nb,bc->nc", oh, tab,
                             preferred_element_type=jnp.float32)
            u_min = u + out[:, 0]
            u_max = u + out[:, 1]
            v_min = v + out[:, 2]
            v_max = v + out[:, 3]
        else:
            u_min = u + rt.u_min[stat_bin, stage]
            u_max = u + rt.u_max[stat_bin, stage]
            v_min = v + rt.v_min[stat_bin, stage]
            v_max = v + rt.v_max[stat_bin, stage]
    if not flow:
        v_min, v_max = v - disp_tol, v + disp_tol
    return u_min, u_max, v_min, v_max


def _pass(src: FeatureSet, dst: FeatureSet, stat_bin, rt, stage, flow,
          radius, disp_tol, t_u=None, t_v=None, row_count=None):
    """row_count: valid-prefix length of the ROW space. For gathered source
    sets (rows aligned to the closure's base table, not prefix-compacted in
    their own right) pass the base table's count — src.count would be the
    gather SOURCE's count, which is the wrong axis."""
    n = src.u.shape[0]
    if t_u is None:
        t_u = jnp.full((n,), -1.0, jnp.float32)
        t_v = jnp.full((n,), -1.0, jnp.float32)
    u_min, u_max, v_min, v_max = _bounds(src.u, src.v, stat_bin, rt, stage,
                                         flow, radius, disp_tol)
    idx, cost = sad_argmin(
        src.desc.astype(jnp.float32), src.cls,
        u_min, u_max, v_min, v_max, t_u, t_v,
        dst.desc.astype(jnp.float32),
        dst.u.astype(jnp.float32), dst.v.astype(jnp.float32),
        dst.cls, dst.valid, valid1=src.valid,
        count1=row_count, count2=dst.count,
    )
    return idx


def _gather_feats(fs: FeatureSet, idx) -> FeatureSet:
    """Row-gather of the feature table by match indices.

    On TPU, XLA lowers the [N, 32] descriptor gather to a serialized SMEM
    loop; a one-hot matmul does the same permutation on the MXU in one pass
    (values <= 8160 are exact in f32)."""
    if jax.default_backend() == "tpu":
        n = fs.u.shape[0]
        onehot = (idx[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, n), 1)).astype(jnp.float32)  # [M, N]
        payload = jnp.concatenate([
            fs.desc.astype(jnp.float32),
            fs.u[:, None].astype(jnp.float32),
            fs.v[:, None].astype(jnp.float32),
            fs.val[:, None].astype(jnp.float32),
            fs.cls[:, None].astype(jnp.float32),
            fs.valid[:, None].astype(jnp.float32),
        ], axis=1)  # [N, 37]
        out = jnp.einsum("mn,nc->mc", onehot, payload,
                         preferred_element_type=jnp.float32)
        return FeatureSet(
            u=out[:, 32].astype(jnp.int32),
            v=out[:, 33].astype(jnp.int32),
            val=out[:, 34].astype(jnp.int32),
            cls=out[:, 35].astype(jnp.int32),
            valid=out[:, 36] > 0.5,
            count=fs.count,
            desc=out[:, :32],  # f32; downstream casts are no-ops
        )
    return FeatureSet(
        u=fs.u[idx], v=fs.v[idx], val=fs.val[idx], cls=fs.cls[idx],
        valid=fs.valid[idx], count=fs.count, desc=fs.desc[idx],
    )


@functools.partial(jax.jit, static_argnames=(
    "w", "h", "binsize", "nbu", "nbv", "radius", "disp_tol", "cap", "use_rt"))
def match_flow(
    prev: FeatureSet, cur: FeatureSet, rt: Optional[RangeTable],
    *, w: int, h: int, binsize: int, nbu: int, nbv: int,
    radius: float, disp_tol: float, cap: int, use_rt: bool,
) -> Matches:
    """Flow circle closure (matcher.cpp:1006-1041)."""
    rt = rt if use_rt else None
    n = cur.u.shape[0]
    stat_bin = _bin_of(cur.u, cur.v, binsize, nbu, nbv)
    i1p = _pass(cur, prev, stat_bin, rt, 0, True, radius, disp_tol,
                row_count=cur.count)
    prev_sel = _gather_feats(prev, i1p)
    i1c2 = _pass(prev_sel, cur, stat_bin, rt, 1, True, radius, disp_tol,
                 row_count=cur.count)
    ar = jnp.arange(n, dtype=jnp.int32)
    closed = (i1c2 == ar) & cur.valid & prev_sel.valid
    keep = dedup_by_pixel(closed, cur.u.astype(jnp.float32),
                          cur.v.astype(jnp.float32), w, h)
    f = lambda x: x.astype(jnp.float32)
    neg1f = jnp.full((n,), -1.0, jnp.float32)
    neg1i = jnp.full((n,), -1, jnp.int32)
    m = Matches(
        u1p=f(prev_sel.u), v1p=f(prev_sel.v), i1p=i1p,
        u2p=neg1f, v2p=neg1f, i2p=neg1i,
        u1c=f(cur.u), v1c=f(cur.v), i1c=ar,
        u2c=neg1f, v2c=neg1f, i2c=neg1i,
        valid=keep, count=jnp.sum(keep.astype(jnp.int32)),
    )
    return compact_matches(m, cap)


@functools.partial(jax.jit, static_argnames=(
    "w", "h", "binsize", "nbu", "nbv", "radius", "disp_tol", "cap", "use_rt"))
def match_stereo(
    left: FeatureSet, right: FeatureSet, rt: Optional[RangeTable],
    *, w: int, h: int, binsize: int, nbu: int, nbv: int,
    radius: float, disp_tol: float, cap: int, use_rt: bool,
) -> Matches:
    """Stereo circle closure (matcher.cpp:1045-1084)."""
    rt = rt if use_rt else None
    n = left.u.shape[0]
    stat_bin = _bin_of(left.u, left.v, binsize, nbu, nbv)
    i2c = _pass(left, right, stat_bin, rt, 0, False, radius, disp_tol,
                row_count=left.count)
    right_sel = _gather_feats(right, i2c)
    i1c2 = _pass(right_sel, left, stat_bin, rt, 1, False, radius, disp_tol,
                 row_count=left.count)
    ar = jnp.arange(n, dtype=jnp.int32)
    closed = (i1c2 == ar) & left.valid & right_sel.valid
    closed &= left.u >= right_sel.u  # positive disparity (matcher.cpp:1075)
    keep = dedup_by_pixel(closed, left.u.astype(jnp.float32),
                          left.v.astype(jnp.float32), w, h)
    f = lambda x: x.astype(jnp.float32)
    neg1f = jnp.full((n,), -1.0, jnp.float32)
    neg1i = jnp.full((n,), -1, jnp.int32)
    m = Matches(
        u1p=neg1f, v1p=neg1f, i1p=neg1i,
        u2p=neg1f, v2p=neg1f, i2p=neg1i,
        u1c=f(left.u), v1c=f(left.v), i1c=ar,
        u2c=f(right_sel.u), v2c=f(right_sel.v), i2c=i2c,
        valid=keep, count=jnp.sum(keep.astype(jnp.int32)),
    )
    return compact_matches(m, cap)


@functools.partial(jax.jit, static_argnames=(
    "w", "h", "binsize", "nbu", "nbv", "radius", "disp_tol", "cap", "use_rt",
    "use_tr"))
def match_quad(
    p1: FeatureSet, p2: FeatureSet, c1: FeatureSet, c2: FeatureSet,
    rt: Optional[RangeTable], tr: Optional[jnp.ndarray],
    calib: Optional[jnp.ndarray],
    *, w: int, h: int, binsize: int, nbu: int, nbv: int,
    radius: float, disp_tol: float, cap: int, use_rt: bool, use_tr: bool,
) -> Matches:
    """Quad circle closure prev-left -> prev-right -> cur-right -> cur-left ->
    prev-left (matcher.cpp:1088-1153), with Tr_delta match prediction
    (matcher.cpp:1114-1131)."""
    rt = rt if use_rt else None
    n = p1.u.shape[0]
    ar = jnp.arange(n, dtype=jnp.int32)
    stat_bin = _bin_of(p1.u, p1.v, binsize, nbu, nbv)

    i2p = _pass(p1, p2, stat_bin, rt, 0, False, radius, disp_tol,
                row_count=p1.count)
    p2_sel = _gather_feats(p2, i2p)

    if use_tr:
        fl, cu, cv, base = calib[0], calib[1], calib[2], calib[3]
        u1p = p1.u.astype(jnp.float32)
        v1p = p1.v.astype(jnp.float32)
        u2p = p2_sel.u.astype(jnp.float32)
        d = jnp.maximum(u1p - u2p, 1.0)
        x1p = (u1p - cu) * base / d
        y1p = (v1p - cv) * base / d
        z1p = fl * base / d
        x2c = tr[0, 0] * x1p + tr[0, 1] * y1p + tr[0, 2] * z1p + tr[0, 3] - base
        y2c = tr[1, 0] * x1p + tr[1, 1] * y1p + tr[1, 2] * z1p + tr[1, 3]
        z2c = tr[2, 0] * x1p + tr[2, 1] * y1p + tr[2, 2] * z1p + tr[2, 3]
        t_u2c = fl * x2c / z2c + cu
        t_v2c = fl * y2c / z2c + cv
        i2c = _pass(p2_sel, c2, stat_bin, rt, 1, True, radius, disp_tol,
                    t_u=t_u2c, t_v=t_v2c, row_count=p1.count)
    else:
        i2c = _pass(p2_sel, c2, stat_bin, rt, 1, True, radius, disp_tol,
                    row_count=p1.count)
    c2_sel = _gather_feats(c2, i2c)

    i1c = _pass(c2_sel, c1, stat_bin, rt, 2, False, radius, disp_tol,
                row_count=p1.count)
    c1_sel = _gather_feats(c1, i1c)

    if use_tr:
        i1p2 = _pass(c1_sel, p1, stat_bin, rt, 3, True, radius, disp_tol,
                     t_u=p1.u.astype(jnp.float32),
                     t_v=p1.v.astype(jnp.float32), row_count=p1.count)
    else:
        i1p2 = _pass(c1_sel, p1, stat_bin, rt, 3, True, radius, disp_tol,
                     row_count=p1.count)

    closed = (i1p2 == ar) & p1.valid & p2_sel.valid & c2_sel.valid & c1_sel.valid
    closed &= (p1.u >= p2_sel.u) & (c1_sel.u >= c2_sel.u)  # matcher.cpp:1146
    f = lambda x: x.astype(jnp.float32)
    m = Matches(
        u1p=f(p1.u), v1p=f(p1.v), i1p=ar,
        u2p=f(p2_sel.u), v2p=f(p2_sel.v), i2p=i2p,
        u1c=f(c1_sel.u), v1c=f(c1_sel.v), i1c=i1c,
        u2c=f(c2_sel.u), v2c=f(c2_sel.v), i2c=i2c,
        valid=closed, count=jnp.sum(closed.astype(jnp.int32)),
    )
    return compact_matches(m, cap)


# ---------------------------------------------------------------------------
# Gain estimation
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("w", "h"))
def _gain_means(img_p, img_c, u1p, v1p, u1c, v1c, sel, *, w: int, h: int):
    """Mean intensity in +-3 windows around matched points (matcher.cpp:286-324)."""

    def window_mean(img, u, v):
        ii = jnp.pad(filters.integral_image(img[:h, :w]), ((1, 0), (1, 0)))
        u0 = jnp.clip(u.astype(jnp.int32) - 3, 0, w - 1)
        u1 = jnp.clip(u.astype(jnp.int32) + 3, 0, w - 1)
        v0 = jnp.clip(v.astype(jnp.int32) - 3, 0, h - 1)
        v1 = jnp.clip(v.astype(jnp.int32) + 3, 0, h - 1)
        s = (ii[v1 + 1, u1 + 1] - ii[v0, u1 + 1] - ii[v1 + 1, u0] + ii[v0, u0])
        area = (u1 - u0 + 1) * (v1 - v0 + 1)
        return s.astype(jnp.float32) / area.astype(jnp.float32)

    mp = window_mean(img_p, u1p, v1p)
    mc = window_mean(img_c, u1c, v1c)
    ok = sel & (mp > 10.0)
    num = jnp.sum(ok.astype(jnp.float32))
    gain = jnp.sum(jnp.where(ok, mc / jnp.maximum(mp, 1e-6), 0.0))
    return jnp.where(num > 0, gain / num, 1.0)


# ---------------------------------------------------------------------------
# Matcher orchestration
# ---------------------------------------------------------------------------

class Matcher:
    """Ring-buffer matcher (reference viso/matcher.h:37-246).

    push_back() detects features for the incoming frame; match_features()
    runs the two-pass pipeline and leaves results in .matches.
    """

    def __init__(self, params: MatcherParams, engine: EngineConfig,
                 dims: tuple[int, int]):
        self.p = params
        self.e = engine
        self.w, self.h = int(dims[0]), int(dims[1])
        # half-resolution halves the match radius (matcher.cpp:58-60)
        self.radius = params.match_radius / 2 if params.half_resolution else params.match_radius
        self.nbu = -(-self.w // params.match_binsize)
        self.nbv = -(-self.h // params.match_binsize)
        self.prev: Optional[FrameFeatures] = None
        self.cur: Optional[FrameFeatures] = None
        self.prev_r: Optional[FrameFeatures] = None
        self.cur_r: Optional[FrameFeatures] = None
        self.matches: Matches = empty_matches(engine.max_matches)
        self._matches1: Matches = empty_matches(engine.max_matches)

    # -- frame ingestion ----------------------------------------------------
    def _detect(self, img) -> FrameFeatures:
        img = jnp.asarray(img, jnp.uint8)
        return detect_features(
            img, w=self.w, h=self.h, nms_n=self.p.nms_n, nms_tau=self.p.nms_tau,
            multi_stage=self.p.multi_stage, half_resolution=self.p.half_resolution,
            cap_sparse=self.e.max_features_sparse, cap_dense=self.e.max_features_dense,
        )

    def push_back(self, I1, I2=None, replace: bool = False):
        """Ring-buffer rotate + feature computation (matcher.cpp:95-181)."""
        if not replace:
            self.prev, self.prev_r = self.cur, self.cur_r
        self.cur = self._detect(I1)
        self.cur_r = self._detect(I2) if I2 is not None else None

    # -- outlier removal ----------------------------------------------------
    def _remove_outliers(self, m: Matches, method: int) -> Matches:
        if self.e.outlier_mode in ("grid", "knn", "knnw"):
            flow_u, flow_v = m.u1c - m.u1p, m.v1c - m.v1p
            disp = (m.u1c - m.u2c) if method == 1 else (m.u1p - m.u2p)
            if self.e.outlier_mode in ("knn", "knnw"):
                keep = knn_consistency_mask(
                    m.u1c, m.v1c, m.valid, flow_u, flow_v, disp, method,
                    float(self.p.outlier_flow_tolerance),
                    float(self.p.outlier_disp_tolerance),
                    k=self.e.outlier_knn_k,
                    min_support=self.e.outlier_min_support,
                    weighted=(self.e.outlier_mode == "knnw"))
            else:
                keep = grid_consistency_mask(
                    m.u1c, m.v1c, m.valid, flow_u, flow_v, disp, method,
                    float(self.p.outlier_flow_tolerance),
                    float(self.p.outlier_disp_tolerance),
                    radius=self.e.outlier_grid_radius,
                    min_support=self.e.outlier_min_support)
            return _compact_with_mask(m, keep)
        pk = np.asarray(_delaunay_hostpack(m, method))  # one transfer
        keep = delaunay_support_mask(
            pk[0], pk[1], pk[2] > 0.5, pk[3], pk[4], pk[5], method,
            float(self.p.outlier_flow_tolerance),
            float(self.p.outlier_disp_tolerance))
        return _compact_with_mask(m, jnp.asarray(keep))

    # -- refinement ---------------------------------------------------------
    def _refine(self, m: Matches, method: int) -> Matches:
        """matcher.cpp:1498-1585 (full-res gradients when half_resolution)."""
        c1, p1 = self.cur, self.prev
        c2, p2 = self.cur_r, self.prev_r
        wc = jnp.float32(self.w)
        hc = jnp.float32(self.h)
        ok = m.valid
        u1p, v1p, u2p, v2p = m.u1p, m.v1p, m.u2p, m.v2p
        u2c, v2c = m.u2c, m.v2c

        def run(du2, dv2, u2, v2):
            if self.p.refinement == 2:
                return parabolic_fitting(c1.du_full, c1.dv_full, du2, dv2,
                                         m.u1c, m.v1c, u2, v2, wc, hc)
            u2n, v2n = relocate_minimum(c1.du_full, c1.dv_full, du2, dv2,
                                        m.u1c, m.v1c, u2, v2, wc, hc)
            return u2n, v2n, jnp.ones_like(ok)

        if method in (0, 2):
            u1p, v1p, ok1 = run(p1.du_full, p1.dv_full, u1p, v1p)
            ok = ok & ok1
        if method in (1, 2):
            u2c, v2c, ok2 = run(c2.du_full, c2.dv_full, u2c, v2c)
            ok = ok & ok2
        if method == 2:
            u2p, v2p, ok3 = run(p2.du_full, p2.dv_full, u2p, v2p)
            ok = ok & ok3
        m = m._replace(u1p=u1p, v1p=v1p, u2p=u2p, v2p=v2p,
                       u2c=u2c, v2c=v2c)
        return _compact_with_mask(m, ok)

    # -- main entry ---------------------------------------------------------
    def match_features(self, method: int, tr_delta: Optional[np.ndarray] = None):
        """matchFeatures (matcher.cpp:183-241)."""
        kw = dict(w=self.w, h=self.h, binsize=self.p.match_binsize,
                  nbu=self.nbu, nbv=self.nbv, radius=float(self.radius),
                  disp_tol=float(self.p.match_disp_tolerance),
                  cap=self.e.max_matches)
        use_tr = tr_delta is not None
        tr = jnp.asarray(tr_delta, jnp.float32) if use_tr else None
        calib = jnp.asarray(
            [self.p.f, self.p.cu, self.p.cv, self.p.base], jnp.float32)

        def run(pass_feats, rt, use_rt):
            if method == 0:
                return match_flow(pass_feats(self.prev), pass_feats(self.cur),
                                  rt, use_rt=use_rt, **kw)
            if method == 1:
                return match_stereo(pass_feats(self.cur), pass_feats(self.cur_r),
                                    rt, use_rt=use_rt, **kw)
            return match_quad(pass_feats(self.prev), pass_feats(self.prev_r),
                              pass_feats(self.cur), pass_feats(self.cur_r),
                              rt, tr, calib, use_rt=use_rt, use_tr=use_tr, **kw)

        # sanity: required frames present (matcher.cpp:185-212)
        needed = {0: [self.prev, self.cur], 1: [self.cur, self.cur_r],
                  2: [self.prev, self.prev_r, self.cur, self.cur_r]}[method]
        if any(x is None for x in needed):
            self.matches = empty_matches(self.e.max_matches)
            return

        if self.p.multi_stage:
            m1 = run(lambda fr: fr.sparse, None, False)
            m1 = self._remove_outliers(m1, method)
            self._matches1 = m1
            rt = compute_prior_statistics(
                m1, method=method, n_bins_u=self.nbu, n_bins_v=self.nbv,
                binsize=self.p.match_binsize, match_radius=float(self.radius))
            m2 = run(lambda fr: fr.dense, rt, True)
        else:
            m2 = run(lambda fr: fr.dense, None, False)
        if self.p.refinement > 0:
            m2 = self._refine(m2, method)
        self.matches = self._remove_outliers(m2, method)

    def bucket_features(self, max_features: int, bucket_width: float,
                        bucket_height: float, key):
        self.matches = bucket_matches(
            self.matches, key, max_features, bucket_width, bucket_height,
            self.e.max_matches)

    def get_matches(self) -> Matches:
        return self.matches

    def get_gain(self, inlier_mask) -> float:
        """Camera gain ratio between frames (matcher.cpp:286-324).

        Exposed-but-never-applied, exactly like the reference: getGain has
        zero call sites in viso/, demo/, matlab/ or main.cpp — it exists for
        callers doing external exposure control, and is deliberately NOT fed
        back into SAD matching here either (decision recorded in ROADMAP.md).
        """
        if self.prev is None or self.cur is None:
            return 1.0
        m = self.matches
        sel = m.valid & jnp.asarray(inlier_mask, bool)
        return float(_gain_means(self.prev.img, self.cur.img,
                                 m.u1p, m.v1p, m.u1c, m.v1c, sel,
                                 w=self.w, h=self.h))
