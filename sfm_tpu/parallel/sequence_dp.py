"""Data parallelism over image sequences.

The reference processes one sequence in one process; the TPU framework scales
throughput by running B independent sequences as a batch, sharded across the
mesh (SURVEY.md §2 parallelism mapping: "DP over sequences/frames"). The
per-frame step is the pure fused pipeline (models/pipeline.py) vmapped over
the sequence axis; XLA partitions it with zero cross-sequence communication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig, MonoParams
from .mesh import make_mesh


def make_dp_mono_step(mesh: Mesh, w: int, h: int, params: MonoParams,
                      engine: EngineConfig, axis: str = "data"):
    """Batched mono VO frame step, batch axis sharded over `axis`.

    Signature: (prev: FrameFeatures[B,...], imgs [B,h,w] u8, keys [B,2])
        -> (cur, matches, MonoResult) all batched.
    """
    from ..models.pipeline import make_mono_frame_step

    step = make_mono_frame_step(w, h, params, engine)
    vstep = jax.vmap(step)

    batch_sharding = NamedSharding(mesh, P(axis))

    def shard_batched(tree):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), tree)

    @jax.jit
    def dp_step(prev, imgs, keys):
        out = vstep(prev, imgs, keys)
        return shard_batched(out)

    return dp_step


def init_batched_features(w: int, h: int, params: MonoParams,
                          engine: EngineConfig, imgs):
    """Detect features for the first frame of each sequence (batched)."""
    from ..models.matcher import detect_features

    p = params.match
    f = functools.partial(
        detect_features, w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
        multi_stage=p.multi_stage, half_resolution=p.half_resolution,
        cap_sparse=engine.max_features_sparse,
        cap_dense=engine.max_features_dense)
    return jax.vmap(f)(imgs)
