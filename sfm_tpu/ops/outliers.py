"""Outlier removal via Delaunay neighborhood consistency.

Reference (matcher.cpp:1207-1377): Delaunay-triangulate the current-left match
positions (Shewchuk's Triangle), then for every triangle edge check
flow/disparity consistency and give both endpoints a support vote; keep
matches with >= 4 support.

TPU-native split:
  * triangulation is inherently sequential/pointer-chasing -> stays on host
    (scipy.spatial.Delaunay / qhull, or the native C++ module when built);
  * support counting + filtering are array ops (numpy here since the
    triangle list already lives on host; the arrays are tiny).

An accelerator-resident alternative (`grid_consistency_mask`) approximates the
Delaunay graph with k-nearest-neighbor edges so multi-sequence batches can run
without host sync; enabled with EngineConfig.outlier_mode="grid".
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def delaunay_support_mask(
    u1c: np.ndarray,
    v1c: np.ndarray,
    valid: np.ndarray,
    flow_u: np.ndarray,
    flow_v: np.ndarray,
    disp: np.ndarray,
    method: int,
    flow_tol: float,
    disp_tol: float,
) -> np.ndarray:
    """Host-side outlier mask. Inputs are full-capacity numpy arrays.

    flow_u/v = u1c-u1p / v1c-v1p (methods 0,2); disp = u1c-u2c (method 1) or
    u1p-u2p (method 2). Returns bool mask over the capacity axis.
    """
    n = int(valid.sum())
    keep = np.zeros(valid.shape, bool)
    idx = np.nonzero(valid)[0]
    if n <= 3:
        # reference returns the input unchanged (matcher.cpp:1210-1211)
        return valid.copy()
    pts = np.stack([u1c[idx], v1c[idx]], 1).astype(np.float64)
    tri = None
    try:  # native Bowyer-Watson (sfm_tpu/native), ~2.5x faster than qhull
        from .. import native as native_mod

        tri = native_mod.delaunay(pts.astype(np.float32))
    except Exception:
        tri = None
    if tri is None:
        try:
            from scipy.spatial import Delaunay

            tri = Delaunay(pts, qhull_options="QJ").simplices
        except Exception:
            return valid.copy()

    support = np.zeros(n, np.int32)
    fu, fv, dp = flow_u[idx], flow_v[idx], disp[idx]
    p1, p2, p3 = tri[:, 0], tri[:, 1], tri[:, 2]
    for a, b in ((p1, p2), (p2, p3), (p1, p3)):
        if method == 0:
            ok = np.abs(fu[a] - fu[b]) + np.abs(fv[a] - fv[b]) < flow_tol
        elif method == 1:
            ok = np.abs(dp[a] - dp[b]) < disp_tol
        else:
            ok = (np.abs(dp[a] - dp[b]) < disp_tol) & (
                np.abs(fu[a] - fu[b]) + np.abs(fv[a] - fv[b]) < flow_tol)
        np.add.at(support, a, ok.astype(np.int32))
        np.add.at(support, b, ok.astype(np.int32))
    keep[idx[support >= 4]] = True
    return keep


@functools.partial(jax.jit, static_argnames=("method", "binsize", "grid_w",
                                             "grid_h"))
def grid_consistency_mask(
    u1c: jnp.ndarray,
    v1c: jnp.ndarray,
    valid: jnp.ndarray,
    flow_u: jnp.ndarray,
    flow_v: jnp.ndarray,
    disp: jnp.ndarray,
    method: int,
    flow_tol: float,
    disp_tol: float,
    binsize: int = 50,
    grid_w: int = 32,
    grid_h: int = 16,
) -> jnp.ndarray:
    """On-device O(N) approximation of the Delaunay support filter: each
    match must agree with the robust (trimmed-mean) local flow/disparity of
    its 3x3 spatial bin neighborhood.

    Two passes: a plain neighborhood mean, then a mean over the entries
    within 2x tolerance of the first estimate (rejecting outlier pull), then
    the final tolerance test — mirroring the edge-agreement semantics of
    matcher.cpp:1207-1377 without the O(N^2)/pointer-chasing triangulation.
    """
    n_bins = grid_w * grid_h
    bu = jnp.clip((u1c / binsize).astype(jnp.int32), 0, grid_w - 1)
    bv = jnp.clip((v1c / binsize).astype(jnp.int32), 0, grid_h - 1)

    stats = jnp.stack([flow_u, flow_v, disp], axis=1)  # [N, 3]
    statsz = jnp.where(valid[:, None], stats, 0.0)

    bid = jnp.where(valid, bv * grid_w + bu, n_bins)
    # one membership matrix serves both the scatter (bin sums) and the
    # gather (per-match bin lookup) as MXU matmuls — both TPU scatter-add
    # and 1-D gathers lower to sequential loops otherwise
    one_hot = (bid[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, n_bins), 1)).astype(jnp.float32)  # [N, n_bins]

    def neighborhood_mean(weight):
        """weight [N]: per-match inclusion; returns per-match 3x3-bin mean."""
        payload = jnp.concatenate(
            [statsz * weight[:, None], weight[:, None]], axis=1)  # [N, 4]
        sums = jnp.einsum("nb,nc->bc", one_hot, payload,
                          preferred_element_type=jnp.float32)  # [n_bins, 4]
        ssum2 = sums[:, :3].reshape(grid_h, grid_w, 3)
        scnt2 = sums[:, 3].reshape(grid_h, grid_w)
        # 3x3 box-sum via shifted adds (cheap, static)
        def box(x):
            acc = None
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    s = jnp.roll(x, (-dy, -dx), (0, 1))
                    # zero out wrapped rows/cols
                    if dy == -1:
                        s = s.at[-1:].set(0)
                    if dy == 1:
                        s = s.at[:1].set(0)
                    if dx == -1:
                        s = s.at[:, -1:].set(0)
                    if dx == 1:
                        s = s.at[:, :1].set(0)
                    acc = s if acc is None else acc + s
            return acc

        nsum = box(ssum2)
        ncnt = box(scnt2)
        mean = nsum / jnp.maximum(ncnt, 1.0)[..., None]
        table = jnp.concatenate([mean.reshape(n_bins, 3),
                                 ncnt.reshape(n_bins, 1)], axis=1)
        per_match = jnp.einsum("nb,bc->nc", one_hot, table,
                               preferred_element_type=jnp.float32)
        return per_match[:, :3], per_match[:, 3]

    ones = valid.astype(jnp.float32)
    mean1, _ = neighborhood_mean(ones)

    # trim: keep entries near the first-pass mean for the second pass
    close = ((jnp.abs(stats[:, 0] - mean1[:, 0]) +
              jnp.abs(stats[:, 1] - mean1[:, 1]) < 2 * flow_tol) &
             (jnp.abs(stats[:, 2] - mean1[:, 2]) < 2 * disp_tol))
    mean2, cnt2 = neighborhood_mean(ones * close.astype(jnp.float32))
    mean = jnp.where((cnt2 >= 3)[:, None], mean2, mean1)

    flow_err = (jnp.abs(stats[:, 0] - mean[:, 0]) +
                jnp.abs(stats[:, 1] - mean[:, 1]))
    disp_err = jnp.abs(stats[:, 2] - mean[:, 2])
    if method == 0:
        ok = flow_err < flow_tol
    elif method == 1:
        ok = disp_err < disp_tol
    else:
        ok = (flow_err < flow_tol) & (disp_err < disp_tol)
    return valid & ok
