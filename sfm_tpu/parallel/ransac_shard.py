"""Hypothesis-parallel RANSAC across the device mesh.

The reference's OpenCL path batches RANSAC hypothesis scoring on one device
(viso_mono_cl.cpp:153-194, 2048 hypotheses/batch on FPGA). On TPU the
hypothesis axis is already a batch dimension (ops/ransac.py); here it is
additionally SHARDED across mesh devices: each chip scores its slice of
hypotheses against the full (replicated) match set, and the arg-best
reduction rides ICI collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ransac import (fundamental_from_mask, fundamental_from_samples,
                          sampson_distance)


def make_sharded_ransac_f(mesh: Mesh, iters: int, thresh: float,
                          axis: str = "hyp"):
    """Returns jitted fn (key, u1p, v1p, u1c, v1c, valid) ->
    (F [3,3], inlier_mask [N], n_inliers, ok), with the hypothesis axis
    sharded over `axis`."""

    nshards = mesh.shape[axis]
    assert iters % nshards == 0, "iters must divide evenly over the mesh axis"

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False)
    def run(samples, u1p, v1p, u1c, v1c, valid):
        # local hypothesis slice
        F = fundamental_from_samples(u1p, v1p, u1c, v1c, samples)
        d = sampson_distance(F, u1p, v1p, u1c, v1c)
        inl = (jnp.abs(d) < thresh) & valid[None, :]
        counts = jnp.sum(inl.astype(jnp.int32), axis=1)
        lbest = jnp.argmax(counts)
        lcount = counts[lbest]
        lmask = inl[lbest]
        # global arg-best: prefer lower shard index on ties (matches the
        # sequential first-wins semantics)
        me = jax.lax.axis_index(axis)
        key = lcount * nshards + (nshards - 1 - me)
        best_key = jax.lax.pmax(key, axis)
        winner = key == best_key
        best_mask = jax.lax.psum(
            jnp.where(winner, lmask.astype(jnp.int32), 0), axis) > 0
        best_count = jax.lax.pmax(lcount, axis)
        F_refit = fundamental_from_mask(u1p, v1p, u1c, v1c, best_mask)
        return F_refit, best_mask, best_count, best_count >= 10

    @jax.jit
    def ransac(key, u1p, v1p, u1c, v1c, valid):
        from ..ops.ransac import draw_samples

        samples = draw_samples(key, valid, iters, 8)
        samples = jax.lax.with_sharding_constraint(
            samples, NamedSharding(mesh, P(axis)))
        return run(samples, u1p, v1p, u1c, v1c, valid)

    return ransac
