"""Stereo visual odometry: 3-point RANSAC + Gauss-Newton refinement.

TPU-native VisualOdometryStereo (reference viso/viso_stereo.{h,cpp}). The
whole estimateMotion (viso_stereo.cpp:42-145) runs as one jitted program:
stereo triangulation of previous-frame points, 200 GN hypotheses as a batch
axis, inlier counting as a fused [B, N] pass, final GN over the best inlier
set with the reference's convergence contract.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, StereoParams
from ..ops import se3
from ..ops.matching import Matches
from ..ops.ransac import draw_samples
from ..ops.stereo_gn import CONVERGED, FAILED, gn_solve, predict_observations
from .matcher import Matcher


class StereoResult(NamedTuple):
    tr: jnp.ndarray
    success: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    n_matches: jnp.ndarray
    # frame-to-frame camera gain ratio (matcher.cpp:286-324); populated by
    # the fused pipeline when EngineConfig.compute_gain is set
    gain: jnp.ndarray = None


@functools.partial(jax.jit, static_argnames=("ransac_iters", "reweighting"))
def stereo_estimate_motion(
    m: Matches,
    key,
    calib: jnp.ndarray,            # [f, cu, cv, base]
    inlier_threshold: jnp.ndarray,
    *,
    ransac_iters: int,
    reweighting: bool = True,
) -> StereoResult:
    valid = m.valid
    N = jnp.sum(valid.astype(jnp.int32))
    okN = N >= 6  # viso_stereo.cpp:56-58

    f, cu, cv, base = calib[0], calib[1], calib[2], calib[3]
    # previous-frame 3D from disparity (viso_stereo.cpp:70-75)
    d = jnp.maximum(m.u1p - m.u2p, 0.0001)
    X = (m.u1p - cu) * base / d
    Y = (m.v1p - cv) * base / d
    Z = f * base / d
    pts = jnp.stack([X, Y, Z], axis=-1)                    # [N, 3]
    obs = jnp.stack([m.u1c, m.v1c, m.u2c, m.v2c], axis=-1)  # [N, 4]

    # --- RANSAC over 3-point hypotheses (viso_stereo.cpp:86-112) ---
    samples = draw_samples(key, valid, ransac_iters, 3)     # [B, 3]
    pts_s = pts[samples]                                    # [B, 3, 3]
    obs_s = obs[samples]
    ones = jnp.ones(samples.shape, pts.dtype)
    tr0 = jnp.zeros((ransac_iters, 6), pts.dtype)
    tr_h, status_h = gn_solve(tr0, pts_s, obs_s, ones, calib, 21, 1e-6,
                              reweighting)

    pred = predict_observations(tr_h, pts[None], calib)     # [B, N, 4]
    err2 = jnp.sum((obs[None] - pred) ** 2, axis=-1)
    inl = (err2 < inlier_threshold * inlier_threshold) & valid[None, :]
    inl = inl & (status_h != FAILED)[:, None]
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    best = jnp.argmax(counts)
    best_mask = inl[best]
    n_in = counts[best]
    ok_in = n_in >= 6  # viso_stereo.cpp:115

    # --- final refinement on all inliers (viso_stereo.cpp:115-131) ---
    # reference eps is 1e-8 in double; in float32 GN steps bottom out near
    # 1e-7, so we use 1e-6 (still ~0.1 um / 0.1 urad — far below pixel noise)
    wmask = best_mask.astype(pts.dtype)
    tr_f, status_f = gn_solve(tr_h[best], pts, obs, wmask, calib, 101, 1e-6,
                              reweighting)
    ok_conv = status_f == CONVERGED

    success = okN & ok_in & ok_conv & jnp.all(jnp.isfinite(tr_f))
    # identity motion on failure (never NaN) — see the mono estimator note
    tr_f = jnp.where(success, tr_f, 0.0)
    return StereoResult(tr=tr_f, success=success, inliers=best_mask,
                        n_inliers=n_in, n_matches=N)


class VisualOdometryStereo:
    """Host-side driver matching the reference class API (viso_stereo.h:30-85)."""

    def __init__(self, params: StereoParams, engine: Optional[EngineConfig] = None,
                 dims: tuple[int, int] = (0, 0), seed: int = 71):
        self.p = params
        self.e = engine or EngineConfig()
        # stereo matcher gets intrinsics for quad match prediction
        # (viso_stereo.cpp:26-27)
        from ..config import replace as cfg_replace

        match = cfg_replace(params.match, f=params.calib.f, cu=params.calib.cu,
                            cv=params.calib.cv, base=params.base)
        self.matcher = Matcher(match, self.e, dims)
        self.Tr_delta = np.eye(4)
        self.Tr_valid = False
        self._key = jax.random.PRNGKey(seed)
        self._last: Optional[StereoResult] = None
        self._calib = jnp.asarray(
            [params.calib.f, params.calib.cu, params.calib.cv, params.base],
            jnp.float32)

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def process(self, I1, I2, replace: bool = False) -> bool:
        """One stereo frame (viso_stereo.cpp:33-40)."""
        self.matcher.push_back(I1, I2, replace=replace)
        tr_prior = self.Tr_delta if self.Tr_valid else None
        self.matcher.match_features(2, tr_delta=tr_prior)
        self.matcher.bucket_features(
            self.p.bucket.max_features, self.p.bucket.bucket_width,
            self.p.bucket.bucket_height, self._next_key())
        return self.update_motion()

    def update_motion(self) -> bool:
        m = self.matcher.get_matches()
        res = stereo_estimate_motion(
            m, self._next_key(), self._calib,
            jnp.float32(self.p.inlier_threshold),
            ransac_iters=self.p.ransac_iters,
            reweighting=self.p.reweighting)
        self._last = res
        if bool(res.success):
            self.Tr_delta = np.asarray(
                se3.transformation_vector_to_matrix(res.tr), np.float64)
            self.Tr_valid = True
            return True
        return False

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
