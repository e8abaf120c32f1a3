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


def delaunay_mask_callback(
    u1c: jnp.ndarray,
    v1c: jnp.ndarray,
    valid: jnp.ndarray,
    flow_u: jnp.ndarray,
    flow_v: jnp.ndarray,
    disp: jnp.ndarray,
    method: int,
    flow_tol: float,
    disp_tol: float,
) -> jnp.ndarray:
    """Reference-faithful Delaunay support mask as a host callback, usable
    INSIDE jit (matcher.cpp:1207-1377 via pure_callback).

    Keeps the fused per-frame pipeline at one dispatch with two host
    round-trips per frame instead of ~10 (ROADMAP item 5). Not usable under
    shard_map; DP batches should stay on outlier_mode="grid" (it vmaps, but
    sequentially)."""

    def host(u, v, val, fu, fv, dp):
        return delaunay_support_mask(
            np.asarray(u), np.asarray(v), np.asarray(val), np.asarray(fu),
            np.asarray(fv), np.asarray(dp), method, flow_tol, disp_tol)

    return jax.pure_callback(
        host, jax.ShapeDtypeStruct(valid.shape, jnp.bool_),
        u1c, v1c, valid, flow_u, flow_v, disp, vmap_method="sequential")


def _pairwise_agreement(flow_u, flow_v, disp, method, flow_tol, disp_tol):
    """[N, N] bool: matches i, j agree on flow/disparity within tolerance —
    the edge-consistency predicate of matcher.cpp:1280-1359 applied to every
    pair (the graph that selects WHICH pairs vote differs per filter)."""
    fok = (jnp.abs(flow_u[:, None] - flow_u[None, :])
           + jnp.abs(flow_v[:, None] - flow_v[None, :])) < flow_tol
    dok = jnp.abs(disp[:, None] - disp[None, :]) < disp_tol
    if method == 0:
        return fok
    if method == 1:
        return dok
    return fok & dok


@functools.partial(jax.jit, static_argnames=("method", "min_support"))
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
    radius: float = 80.0,
    min_support: int = 4,
) -> jnp.ndarray:
    """On-device Delaunay-free support filter: keep a match iff at least
    `min_support` other valid matches within `radius` pixels agree on
    flow/disparity within the tolerances.

    This is the radius-neighborhood analog of the reference's Delaunay edge
    voting (matcher.cpp:1207-1377: each agreeing edge gives both endpoints a
    vote; keep support >= 4). Pairwise agreement — not agreement with a
    neighborhood MEAN — is essential: smooth flow gradients (the ground
    plane under forward motion) keep |Δflow| between nearby pairs inside the
    tolerance while deviating from a wide-window mean. An earlier
    trimmed-mean bin formulation rejected exactly those ground matches and
    biased the mono plane-scale peak 1.57x (vs the reference's 1.29x on the
    same scene); this formulation reproduces the Delaunay behavior (1.01x
    with radius=80 on that scene).

    One fused [N, N] VPU sweep (compare + reduce), same cost class as
    dedup_by_pixel.
    """
    du = u1c[:, None] - u1c[None, :]
    dv = v1c[:, None] - v1c[None, :]
    near = (du * du + dv * dv) < radius * radius
    agree = _pairwise_agreement(flow_u, flow_v, disp, method, flow_tol,
                                disp_tol)
    n = u1c.shape[0]
    ar = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ac = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    support = jnp.sum(
        (near & agree & valid[None, :] & (ar != ac)).astype(jnp.float32),
        axis=1)
    return valid & (support >= min_support)


@functools.partial(jax.jit,
                   static_argnames=("method", "k", "min_support", "weighted"))
def knn_consistency_mask(
    u1c: jnp.ndarray,
    v1c: jnp.ndarray,
    valid: jnp.ndarray,
    flow_u: jnp.ndarray,
    flow_v: jnp.ndarray,
    disp: jnp.ndarray,
    method: int,
    flow_tol: float,
    disp_tol: float,
    k: int = 8,
    min_support: int = 4,
    weighted: bool = False,
) -> jnp.ndarray:
    """On-device k-nearest-neighbor analog of the reference's Delaunay edge
    voting (matcher.cpp:1207-1377).

    The Delaunay graph connects each match to its ~6 Voronoi neighbors; an
    edge whose endpoints agree on flow/disparity gives both endpoints a vote
    (interior edges are visited once per adjacent triangle, i.e. counted
    twice), and matches with >= 4 votes survive. The symmetrized kNN graph
    (i-j is an edge iff j in kNN(i) or i in kNN(j)) is a close proxy for the
    Voronoi adjacency: like Delaunay — and unlike a fixed-radius disc — it
    adapts edge length to local density, so a wrong match must agree with
    its NEAREST neighbors specifically, not with any `min_support` matches
    in a wide disc. That locality is what rejects occlusion-boundary
    mismatches the radius filter admits (BASELINE.md pillars analysis).

    One [N, N] distance + agreement sweep plus a row-wise top_k; same cost
    class as grid_consistency_mask.
    """
    du = u1c[:, None] - u1c[None, :]
    dv = v1c[:, None] - v1c[None, :]
    d2 = du * du + dv * dv
    n = u1c.shape[0]
    ar = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ac = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    off_graph = (~valid[None, :]) | (~valid[:, None]) | (ar == ac)
    d2 = jnp.where(off_graph, jnp.inf, d2)
    # kth-smallest distance per row -> adjacency (ties admit extra neighbors,
    # harmless: ties in pixel distance are Delaunay-degenerate anyway).
    # On TPU, jax.lax.top_k inside a fused program lowers to a FULL
    # [N, N] (value, index) sort (~8 ms at N=4096 — measured 147 -> 42 fps);
    # approx_min_k is the hardware PartialReduce and only needs the values.
    # Its rare misses only RAISE the threshold (admit an extra neighbor),
    # which the vote tolerates; bench.py's kernel gate diffs it on device.
    if jax.default_backend() == "tpu":
        kth = jax.lax.approx_min_k(d2, k)[0][:, -1:]
    else:
        kth = -jax.lax.top_k(-d2, k)[0][:, -1:]
    adj = (d2 <= kth) & ~off_graph
    agree = _pairwise_agreement(flow_u, flow_v, disp, method, flow_tol,
                                disp_tol)
    if weighted:
        # Delaunay-faithful vote weighting: the reference visits each edge
        # once per adjacent triangle, so interior edges vote TWICE and hull
        # edges once (matcher.cpp:1260-1369). Mutual-kNN edges are the
        # interior analog (weight 2); one-way edges the hull analog (1).
        w = ((adj & adj.T).astype(jnp.float32) * 2.0
             + (adj ^ adj.T).astype(jnp.float32))
        support = jnp.sum(w * agree.astype(jnp.float32), axis=1)
    else:
        edge = adj | adj.T
        support = jnp.sum((edge & agree).astype(jnp.float32), axis=1)
    return valid & (support >= min_support)
