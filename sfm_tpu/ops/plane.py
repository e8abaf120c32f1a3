"""Ground-plane scale recovery: kernel-density scoring of plane offsets.

Reference findBestPlane (viso_mono.cpp:74-98) / plane_calc_sums OpenCL kernel
(plane_and_inliers.cl:142-162): for every candidate point i with plane offset
d_i > threshold, score sum_j exp(-(d_i-d_j)^2 * w) over ALL points j and keep
the best-scoring offset. O(N^2) with a transcendental — a natural fused
one-pass kernel on TPU; at our N (<= 4096) the jnp [N, N] formulation already
saturates the VPU, so the Pallas variant lives in ops/pallas_kernels.py and
is enabled on TPU only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def plane_offsets(X: jnp.ndarray, pitch: float | jnp.ndarray):
    """d = [cos(-pitch), sin(-pitch)] . (y, z) (viso_mono.cpp:76-79).

    X: [N, >=3] points (x, y, z, ...). Returns [N]."""
    n0 = jnp.cos(-pitch)
    n1 = jnp.sin(-pitch)
    return n0 * X[:, 1] + n1 * X[:, 2]


def find_best_plane(d: jnp.ndarray, valid: jnp.ndarray,
                    threshold: jnp.ndarray, weight: jnp.ndarray):
    """Returns (best_d, best_sum). Candidates need d > threshold; scores sum
    over all valid points. Ties keep the first index (strict >,
    viso_mono.cpp:91-94); if no candidate scores, index 0 is returned like
    the reference's best_idx=0 init."""
    if jax.default_backend() == "tpu":
        from .pallas_kernels import plane_sums_pallas

        sums = plane_sums_pallas(d, valid, weight)
    else:
        diff = d[:, None] - d[None, :]
        k = jnp.exp(-diff * diff * weight)
        k = jnp.where(valid[None, :], k, 0.0)
        sums = jnp.sum(k, axis=1)
    cand = valid & (d > threshold)
    sums = jnp.where(cand, sums, 0.0)
    best = jnp.argmax(sums)
    return d[best], sums[best]
