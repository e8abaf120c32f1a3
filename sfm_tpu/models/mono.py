"""Monocular visual odometry: 8-point RANSAC + ground-plane scale.

TPU-native VisualOdometryMono (reference viso/viso_mono.{h,cpp}): the whole
estimateMotion (viso_mono.cpp:100-190) is ONE jitted program — Hartley
normalization, 2000-hypothesis batched RANSAC, F->E->(R,t) with chirality
triangulation, median-depth motion gate and kernel-density ground-plane scale
— producing (tr, success, inliers). The host only reads the success flag to
drive the replace/extrapolate logic (viso.h:83-86 contract).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, MonoParams
from ..ops import se3
from ..ops.epipolar import e_to_rt
from ..ops.linalg import masked_median, rank2_project
from ..ops.matching import Matches
from ..ops.plane import find_best_plane, plane_offsets
from ..ops.ransac import ransac_f
from .matcher import Matcher


class MonoResult(NamedTuple):
    tr: jnp.ndarray        # [6] rx ry rz tx ty tz
    success: jnp.ndarray   # [] bool
    inliers: jnp.ndarray   # [cap] bool (RANSAC Sampson inliers)
    n_inliers: jnp.ndarray
    n_matches: jnp.ndarray
    # frame-to-frame camera gain ratio (matcher.cpp:286-324); populated by
    # the fused pipeline when EngineConfig.compute_gain is set
    gain: jnp.ndarray = None


@functools.partial(jax.jit, static_argnames=("ransac_iters",))
def mono_estimate_motion(
    m: Matches,
    key,
    calib: jnp.ndarray,       # [f, cu, cv]
    height: jnp.ndarray,
    pitch: jnp.ndarray,
    inlier_threshold: jnp.ndarray,
    motion_threshold: jnp.ndarray,
    *,
    ransac_iters: int,
) -> MonoResult:
    valid = m.valid
    N = jnp.sum(valid.astype(jnp.int32))
    okN = N >= 10  # viso_mono.cpp:103-105
    cnt = jnp.maximum(N.astype(jnp.float32), 1.0)

    f, cu, cv = calib[0], calib[1], calib[2]
    K = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    K = K.at[0, 0].set(f).at[1, 1].set(f).at[0, 2].set(cu).at[1, 2].set(cv)

    # --- Hartley normalization (viso_mono.cpp:217-263) ---
    def msum(x):
        return jnp.sum(jnp.where(valid, x, 0.0))

    cpu_ = msum(m.u1p) / cnt
    cpv_ = msum(m.v1p) / cnt
    ccu_ = msum(m.u1c) / cnt
    ccv_ = msum(m.v1c) / cnt
    up = jnp.where(valid, m.u1p - cpu_, 0.0)
    vp = jnp.where(valid, m.v1p - cpv_, 0.0)
    uc = jnp.where(valid, m.u1c - ccu_, 0.0)
    vc = jnp.where(valid, m.v1c - ccv_, 0.0)
    sp_sum = msum(jnp.sqrt(up * up + vp * vp))
    sc_sum = msum(jnp.sqrt(uc * uc + vc * vc))
    ok_norm = (jnp.abs(sp_sum) >= 1e-10) & (jnp.abs(sc_sum) >= 1e-10)
    sp = jnp.sqrt(2.0) * cnt / jnp.maximum(sp_sum, 1e-10)
    sc = jnp.sqrt(2.0) * cnt / jnp.maximum(sc_sum, 1e-10)
    up, vp, uc, vc = up * sp, vp * sp, uc * sc, vc * sc
    Tp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    Tp = Tp.at[0, 0].set(sp).at[1, 1].set(sp).at[0, 2].set(-sp * cpu_).at[1, 2].set(-sp * cpv_)
    Tc = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    Tc = Tc.at[0, 0].set(sc).at[1, 1].set(sc).at[0, 2].set(-sc * ccu_).at[1, 2].set(-sc * ccv_)

    # --- RANSAC F (viso_mono.cpp:41-72) ---
    F, inl_mask, n_in, ok_ransac = ransac_f(
        key, up, vp, uc, vc, valid, ransac_iters, inlier_threshold)

    # --- denormalize, essential matrix (viso_mono.cpp:126-133) ---
    F = Tc.T @ F @ Tp
    E = K.T @ F @ K
    E = rank2_project(E)

    # --- R, t + chirality (viso_mono.cpp:135-137,347-431) ---
    X, R, t, n_front = e_to_rt(E, K, m.u1p, m.v1p, m.u1c, m.v1c, valid)
    ok_chieral = n_front > 0

    # --- positive-depth points, median gate (viso_mono.cpp:139-157) ---
    w = X[:, 3]
    Xn = X / jnp.where(jnp.abs(w) > 1e-30, w, 1e-30)[:, None]
    pos = valid & (Xn[:, 2] > 0)
    n_pos = jnp.sum(pos.astype(jnp.int32))
    ok_pos = n_pos >= 10
    dist = jnp.abs(Xn[:, 0]) + jnp.abs(Xn[:, 1]) + jnp.abs(Xn[:, 2])
    med = masked_median(dist, pos)
    ok_med = med <= motion_threshold

    # --- ground-plane scale (viso_mono.cpp:159-171) ---
    sigma = med / 50.0
    weight = 1.0 / (2.0 * sigma * sigma)
    threshold = med / motion_threshold
    d = plane_offsets(Xn, pitch)
    best_d, _ = find_best_plane(d, pos, threshold, weight)
    t = t * height / jnp.where(jnp.abs(best_d) > 1e-20, best_d, 1e-20)

    # --- angles + result (viso_mono.cpp:175-189) ---
    rx, ry, rz = se3.rotation_angles(R)
    tr = jnp.stack([rx, ry, rz, t[0], t[1], t[2]])
    success = (okN & ok_norm & ok_ransac & ok_chieral & ok_pos & ok_med
               & jnp.all(jnp.isfinite(tr)))
    # on failure return the identity motion vector instead of NaNs (degenerate
    # inputs propagate NaN through the normalization) — callers gate on
    # `success` for the stale-Tr contract (viso.h:83-86), but the returned
    # value itself must stay safe to feed through pose-chain arithmetic
    tr = jnp.where(success, tr, 0.0)
    return MonoResult(tr=tr, success=success, inliers=inl_mask,
                      n_inliers=n_in, n_matches=N)


class VisualOdometryMono:
    """Host-side driver matching the reference class API (viso_mono.h:27-87)."""

    def __init__(self, params: MonoParams, engine: Optional[EngineConfig] = None,
                 dims: tuple[int, int] = (0, 0), seed: int = 71):
        self.p = params
        self.e = engine or EngineConfig()
        self.matcher = Matcher(params.match, self.e, dims)
        self.Tr_delta = np.eye(4)
        self.Tr_valid = False
        self._key = jax.random.PRNGKey(seed)
        self._last: Optional[MonoResult] = None
        self._calib = jnp.asarray(
            [params.calib.f, params.calib.cu, params.calib.cv], jnp.float32)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def process(self, img, replace: bool = False) -> bool:
        """One frame (viso_mono.cpp:33-39). Returns False on motion failure."""
        self.matcher.push_back(img, replace=replace)
        self.matcher.match_features(0)
        self.matcher.bucket_features(
            self.p.bucket.max_features, self.p.bucket.bucket_width,
            self.p.bucket.bucket_height, self._next_key())
        return self.update_motion()

    def update_motion(self) -> bool:
        m = self.matcher.get_matches()
        res = mono_estimate_motion(
            m, self._next_key(), self._calib,
            jnp.float32(self.p.height), jnp.float32(self.p.pitch),
            jnp.float32(self.p.inlier_threshold),
            jnp.float32(self.p.motion_threshold),
            ransac_iters=self.p.ransac_iters)
        self._last = res
        if bool(res.success):
            self.Tr_delta = np.asarray(
                se3.transformation_vector_to_matrix(res.tr), np.float64)
            self.Tr_valid = True
            return True
        return False  # caller may extrapolate with the stale Tr (viso.h:83-86)

    # reference getters (viso.h:86-103)
    def get_motion(self) -> np.ndarray:
        return self.Tr_delta

    def get_matches(self) -> Matches:
        return self.matcher.get_matches()

    def get_number_of_matches(self) -> int:
        return int(self._last.n_matches) if self._last else 0

    def get_number_of_inliers(self) -> int:
        return int(self._last.n_inliers) if self._last else 0

    def get_inlier_mask(self) -> np.ndarray:
        return (np.asarray(self._last.inliers) if self._last
                else np.zeros(self.e.max_matches, bool))

    def get_gain(self, inlier_mask) -> float:
        return self.matcher.get_gain(inlier_mask)
