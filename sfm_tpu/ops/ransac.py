"""Hypothesis-batched RANSAC for the 8-point fundamental matrix.

The reference loops 2000 sequential iterations of {draw 8, SVD an 8x9 system,
count Sampson inliers} (viso_mono.cpp:41-72); its OpenCL port batches the
inlier scoring on-device (viso_mono_cl.cpp:153-194 + plane_and_inliers.cl).
Here the hypothesis axis is a *batch dimension*: all samples are drawn at
once, all F's come out of one batched Jacobi solve, and inlier counting is a
single [hypotheses x matches] fused pass — the structural equivalent of the
find_inliers/sum/update_best_inliers kernel chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .linalg import rank2_project, smallest_right_singular_vector


def draw_samples(key, valid: jnp.ndarray, iters: int, k: int) -> jnp.ndarray:
    """[iters, k] distinct uniform indices of valid entries (replaces the
    fixed-seed Fisher-Yates prefix of viso.cpp:86-102 with a counter-based
    PRNG, same uniform-k-subset distribution).

    PRECONDITION: valid entries form a prefix (all match tables are
    compacted). Sequential sampling without replacement, vectorized over the
    hypothesis axis: draw r_j uniform in [0, count-j), then bump r_j past
    each previously chosen index in ascending order — exactly uniform over
    distinct k-subsets, and O(iters * k^2) elementwise work (k <= 8), far
    cheaper than a top_k over [iters, n]. If count < k (callers gate on
    >= 10 matches, viso_mono.cpp:103), indices clip into [0, count-1] and
    duplicates are unavoidable."""
    count = jnp.sum(valid.astype(jnp.int32))
    u = jax.random.uniform(key, (iters, k))
    chosen = jnp.zeros((iters, k), jnp.int32)
    for j in range(k):
        span = jnp.maximum(count - j, 1).astype(jnp.float32)
        r = jnp.minimum((u[:, j] * span).astype(jnp.int32),
                        jnp.maximum(count - j - 1, 0))
        if j:
            prev = jnp.sort(chosen[:, :j], axis=1)
            for t in range(j):
                r = r + (r >= prev[:, t]).astype(jnp.int32)
        chosen = chosen.at[:, j].set(r)
    return jnp.clip(chosen, 0, jnp.maximum(count - 1, 0))


def fundamental_from_samples(u1p, v1p, u1c, v1c, sample_idx) -> jnp.ndarray:
    """Batched 8-point algorithm (viso_mono.cpp:265-296).

    sample_idx: [B, 8]. Returns F [B, 3, 3] with rank-2 enforced.
    """
    up = u1p[sample_idx]
    vp = v1p[sample_idx]
    uc = u1c[sample_idx]
    vc = v1c[sample_idx]
    ones = jnp.ones_like(up)
    A = jnp.stack([uc * up, uc * vp, uc, vc * up, vc * vp, vc, up, vp, ones],
                  axis=-1)  # [B, 8, 9]
    f = smallest_right_singular_vector(A)
    F = f.reshape(f.shape[:-1] + (3, 3))
    return rank2_project(F)


def fundamental_from_mask(u1p, v1p, u1c, v1c, mask) -> jnp.ndarray:
    """8-point refit over all masked matches (viso_mono.cpp:66-69)."""
    ones = jnp.ones_like(u1p)
    A = jnp.stack([u1c * u1p, u1c * v1p, u1c, v1c * u1p, v1c * v1p, v1c,
                   u1p, v1p, ones], axis=-1)  # [N, 9]
    A = jnp.where(mask[:, None], A, 0.0)
    f = smallest_right_singular_vector(A)
    return rank2_project(f.reshape(3, 3))


def sampson_distance(F: jnp.ndarray, u1p, v1p, u1c, v1c) -> jnp.ndarray:
    """|x2' F x1|^2 / (||Fx1||_uv^2 + ||F'x2||_uv^2) (viso_mono.cpp:298-345).

    F: [..., 3, 3]; points [N]. Returns [..., N].
    """
    x1 = jnp.stack([u1p, v1p, jnp.ones_like(u1p)], axis=-1)  # [N, 3]
    x2 = jnp.stack([u1c, v1c, jnp.ones_like(u1c)], axis=-1)
    Fx1 = jnp.einsum("...ij,nj->...ni", F, x1)    # [..., N, 3]
    Ftx2 = jnp.einsum("...ji,nj->...ni", F, x2)
    x2tFx1 = jnp.einsum("ni,...ni->...n", x2, Fx1)
    denom = (Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 +
             Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2)
    return x2tFx1 ** 2 / jnp.maximum(denom, 1e-30)


def ransac_f(key, u1p, v1p, u1c, v1c, valid, iters: int, thresh: float):
    """Full RANSAC loop (viso_mono.cpp:41-72) as one batched program.

    Returns (F_refit [3,3], inlier_mask [N], n_inliers, ok).
    ok=False when the best hypothesis has < 10 inliers
    (viso_mono.cpp:61-64)."""
    samples = draw_samples(key, valid, iters, 8)
    F = fundamental_from_samples(u1p, v1p, u1c, v1c, samples)  # [B,3,3]
    d = sampson_distance(F, u1p, v1p, u1c, v1c)                # [B,N]
    inl = (jnp.abs(d) < thresh) & valid[None, :]
    counts = jnp.sum(inl.astype(jnp.int32), axis=1)
    best = jnp.argmax(counts)  # first max wins, like sequential > comparison
    best_mask = inl[best]
    n_in = counts[best]
    ok = n_in >= 10
    F_refit = fundamental_from_mask(u1p, v1p, u1c, v1c, best_mask)
    return F_refit, best_mask, n_in, ok
