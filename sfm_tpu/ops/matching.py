"""Feature matching engine: masked SAD-argmin passes, prior search-range
statistics, circle closure, pixel dedup, bucketing.

TPU-native redesign of the reference matcher loops:
  * ``findMatch`` (matcher.cpp:892-963) — a per-feature scan over candidate
    bins with SIMD SAD — becomes one data-parallel *pass*: every source row
    scores every candidate feature, masked by search range + class, and takes
    a first-occurrence argmin. Default winner index 0 and the 1e7 cost cutoff
    reproduce the reference's ``min_ind=0`` / ``min_cost=10000000`` init.
  * ``matching`` (matcher.cpp:965-1205) — the flow/stereo/quad circle
    closures — become 2 or 4 chained passes with index gathers in between.
  * ``computePriorStatistics`` (matcher.cpp:734-868) becomes scatter-min/max
    into a [bins, stages, 4] range table.
  * bucketing (matcher.cpp:243-284) becomes a segmented random ranking.

Bin indexing in the reference only prunes the candidate scan; the exact
accept test is the coordinate-range check (matcher.cpp:943), which is what we
implement, so results are bin-free. Tie-breaking differs only in candidate
*scan order* for exactly-equal SAD costs (we use smallest feature index).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

BIG = jnp.float32(1e9)
MIN_COST_INIT = 10000000.0  # matcher.cpp:899


class Matches(NamedTuple):
    """Fixed-capacity match table (mirrors Matcher::p_match, matcher.h:86-100).

    Invalid entries have valid=False; u/v are float32 full-resolution pixels.
    """

    u1p: jnp.ndarray
    v1p: jnp.ndarray
    i1p: jnp.ndarray
    u2p: jnp.ndarray
    v2p: jnp.ndarray
    i2p: jnp.ndarray
    u1c: jnp.ndarray
    v1c: jnp.ndarray
    i1c: jnp.ndarray
    u2c: jnp.ndarray
    v2c: jnp.ndarray
    i2c: jnp.ndarray
    valid: jnp.ndarray
    count: jnp.ndarray


def empty_matches(cap: int) -> Matches:
    f = jnp.full((cap,), -1.0, jnp.float32)
    i = jnp.full((cap,), -1, jnp.int32)
    return Matches(f, f, i, f, f, i, f, f, i, f, f, i,
                   jnp.zeros((cap,), bool), jnp.zeros((), jnp.int32))


def cumsum_matmul(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of a 1-D int/float array via two-level
    triangular matmuls (XLA lowers 1-D cumsum to a sequential loop on TPU;
    the MXU does it in one pass — exact in f32 for sums < 2^24)."""
    n = x.shape[0]
    B = 128
    rows = -(-n // B)
    xp = jnp.pad(x.astype(jnp.float32), (0, rows * B - n)).reshape(rows, B)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
           <= jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)).astype(jnp.float32)
    within = jnp.einsum("rb,bc->rc", xp, tri,
                        preferred_element_type=jnp.float32)  # row-wise cumsum
    row_tot = within[:, -1]
    tri_r = (jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
             < jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)).astype(jnp.float32)
    offsets = jnp.einsum("r,rc->c", row_tot, tri_r,
                         preferred_element_type=jnp.float32)  # exclusive
    out = (within + offsets[:, None]).reshape(-1)[:n]
    return out.astype(x.dtype if jnp.issubdtype(x.dtype, jnp.integer) else x.dtype)


def compaction_gather_indices(ok: jnp.ndarray, cap: int):
    """(src [cap], count): src[s] = index of the s-th valid entry.

    Gather-side stream compaction: scatter-based packing lowers to a
    sequential SMEM loop on TPU (the dominant cost in early profiles);
    searchsorted over the cumulative count is dense VPU work."""
    n = ok.shape[0]
    if jax.default_backend() == "tpu":
        c = cumsum_matmul(ok.astype(jnp.int32))
    else:
        c = jnp.cumsum(ok.astype(jnp.int32))
    count = jnp.minimum(c[n - 1], cap)
    slots = jnp.arange(cap, dtype=jnp.int32)
    # compare_all = one [cap, n] VPU sweep; for big n the quadratic sweep
    # outgrows the unrolled binary search (log n small gathers)
    method = "compare_all" if n <= 8192 else "scan_unrolled"
    src = jnp.searchsorted(c, slots + 1, method=method)
    return jnp.clip(src, 0, n - 1).astype(jnp.int32), count


def compact_matches(m: Matches, cap: int) -> Matches:
    """Pack valid entries to the front (deterministic, index order).

    On TPU the 12 per-field [cap] gathers are replaced by one one-hot
    permutation matmul on the MXU (1-D gathers serialize on TPU; exact,
    since each output row receives exactly one payload row)."""
    src, count = compaction_gather_indices(m.valid, cap)
    slots = jnp.arange(cap, dtype=jnp.int32)
    live = slots < count

    fields = [m.u1p, m.v1p, m.i1p, m.u2p, m.v2p, m.i2p,
              m.u1c, m.v1c, m.i1c, m.u2c, m.v2c, m.i2c]
    fills = [-1.0, -1.0, -1, -1.0, -1.0, -1,
             -1.0, -1.0, -1, -1.0, -1.0, -1]

    if jax.default_backend() == "tpu":
        n = m.valid.shape[0]
        payload = jnp.stack([f.astype(jnp.float32) for f in fields], 1)
        onehot = (src[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, n), 1)).astype(jnp.float32)
        out = jnp.einsum("cn,nf->cf", onehot, payload,
                         preferred_element_type=jnp.float32)
        packed = [jnp.where(live, out[:, i].astype(f.dtype), fill)
                  for i, (f, fill) in enumerate(zip(fields, fills))]
    else:
        packed = [jnp.where(live, f[src], fill)
                  for f, fill in zip(fields, fills)]
    return Matches(*packed, valid=live, count=count)


# ---------------------------------------------------------------------------
# SAD argmin pass
# ---------------------------------------------------------------------------

def _sad_block(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Sum of absolute differences between descriptor rows: [M, N] float32.

    d1: [M, 32] float32, d2: [N, 32] float32 (u8 values, exact in f32).
    Structural equivalent of the 32-byte SIMD SAD (simd.hh:413-445).
    """
    return jnp.abs(d1[:, None, :] - d2[None, :, :]).sum(-1)


@functools.partial(jax.jit, static_argnames=("chunk",))
def sad_argmin_pass(
    d1: jnp.ndarray,        # [N1, 32] f32 source descriptors
    c1: jnp.ndarray,        # [N1] i32 source classes
    u_min: jnp.ndarray,     # [N1] f32 absolute search bounds
    u_max: jnp.ndarray,
    v_min: jnp.ndarray,
    v_max: jnp.ndarray,
    t_u: jnp.ndarray,       # [N1] f32 prior target (or -1: disabled)
    t_v: jnp.ndarray,
    d2: jnp.ndarray,        # [N2, 32] f32 candidate descriptors
    u2: jnp.ndarray,        # [N2] f32 candidate coords
    v2: jnp.ndarray,
    c2: jnp.ndarray,        # [N2] i32
    valid2: jnp.ndarray,    # [N2] bool
    chunk: int = 512,
):
    """One directed matching pass; returns (best_idx [N1] i32, best_cost [N1] f32).

    Cost = SAD + 4 * euclidean distance to the prior target when the target
    is enabled (matcher.cpp:946-953). Candidates outside the range/class or
    invalid get +inf; if nothing beats MIN_COST_INIT the winner index is 0
    (matcher.cpp:898-899 semantics).
    """
    N1 = d1.shape[0]
    n_chunks = (N1 + chunk - 1) // chunk
    pad = n_chunks * chunk - N1

    def _pad(x):
        return jnp.pad(x, (0, pad)) if pad else x

    d1p = jnp.pad(d1, ((0, pad), (0, 0))) if pad else d1
    args = [_pad(a) for a in (c1, u_min, u_max, v_min, v_max, t_u, t_v)]
    c1p, u_min_p, u_max_p, v_min_p, v_max_p, t_u_p, t_v_p = args

    def body(carry, xs):
        d1c, c1c, umn, umx, vmn, vmx, tu, tv = xs
        cost = _sad_block(d1c, d2)  # [chunk, N2]
        use_t = (tu >= 0) & (tv >= 0)
        dist = jnp.sqrt((u2[None, :] - tu[:, None]) ** 2 +
                        (v2[None, :] - tv[:, None]) ** 2)
        cost = cost + jnp.where(use_t[:, None], 4.0 * dist, 0.0)
        mask = (
            valid2[None, :]
            & (c2[None, :] == c1c[:, None])
            & (u2[None, :] >= umn[:, None]) & (u2[None, :] <= umx[:, None])
            & (v2[None, :] >= vmn[:, None]) & (v2[None, :] <= vmx[:, None])
        )
        cost = jnp.where(mask, cost, BIG)
        idx = jnp.argmin(cost, axis=1).astype(jnp.int32)
        best = jnp.min(cost, axis=1)
        idx = jnp.where(best < MIN_COST_INIT, idx, 0)
        return carry, (idx, best)

    xs = tuple(
        a.reshape((n_chunks, chunk) + a.shape[1:])
        for a in (d1p, c1p, u_min_p, u_max_p, v_min_p, v_max_p, t_u_p, t_v_p)
    )
    _, (idx, best) = jax.lax.scan(body, None, xs)
    return idx.reshape(-1)[:N1], best.reshape(-1)[:N1]


def sad_argmin(d1, c1, u_min, u_max, v_min, v_max, t_u, t_v,
               d2, u2, v2, c2, valid2, valid1=None, count1=None, count2=None):
    """Backend dispatcher: fused Pallas kernel on TPU (one HBM pass, no
    [N1, N2] materialization, tile skipping + count gating), jnp scan
    elsewhere. count1/count2: valid-prefix lengths (tables are compacted)."""
    if jax.default_backend() == "tpu":
        from .pallas_kernels import sad_argmin_pallas

        return sad_argmin_pallas(d1, c1, u_min, u_max, v_min, v_max, t_u, t_v,
                                 d2, u2, v2, c2, valid2, valid1=valid1,
                                 count1=count1, count2=count2)
    return sad_argmin_pass(d1, c1, u_min, u_max, v_min, v_max, t_u, t_v,
                           d2, u2, v2, c2, valid2)


# ---------------------------------------------------------------------------
# Search-range construction
# ---------------------------------------------------------------------------

class RangeTable(NamedTuple):
    """Per-bin search ranges for stages 0..3 (Matcher::range, matcher.h:151-157)."""

    u_min: jnp.ndarray  # [n_bins, n_stages]
    u_max: jnp.ndarray
    v_min: jnp.ndarray
    v_max: jnp.ndarray


def full_range_table(n_bins: int, n_stages: int, match_radius: float) -> RangeTable:
    r = jnp.full((n_bins, n_stages), float(match_radius), jnp.float32)
    return RangeTable(-r, r, -r, r)


@functools.partial(jax.jit, static_argnames=("method", "n_bins_u", "n_bins_v", "binsize", "match_radius"))
def compute_prior_statistics(
    m: Matches,
    *,
    method: int,
    n_bins_u: int,
    n_bins_v: int,
    binsize: int,
    match_radius: float,
) -> RangeTable:
    """Per-bin displacement min/max over a 3x3 bin neighborhood
    (matcher.cpp:734-868), with the 20x20 minimum range floor."""
    n_stages = 4 if method == 2 else 2
    n_bins = n_bins_u * n_bins_v

    if method == 0:
        deltas = [(m.u1p - m.u1c, m.v1p - m.v1c), (m.u1c - m.u1p, m.v1c - m.v1p)]
        ref_u, ref_v = m.u1c, m.v1c
    elif method == 1:
        z = jnp.zeros_like(m.u1c)
        deltas = [(m.u2c - m.u1c, z), (m.u1c - m.u2c, z)]
        ref_u, ref_v = m.u1c, m.v1c
    else:  # quad (matcher.cpp:778-785)
        z = jnp.zeros_like(m.u1c)
        deltas = [
            (m.u2p - m.u1p, z),
            (m.u2c - m.u2p, m.v2c - m.v2p),
            (m.u1c - m.u2c, z),
            (m.u1p - m.u1c, m.v1p - m.v1c),
        ]
        ref_u, ref_v = m.u1p, m.v1p

    # centers intentionally unclipped: the reference clips the *ends* of the
    # [center-1, center+1] neighborhood (matcher.cpp:793-803), so off-grid
    # centers contribute to fewer bins, not shifted ones
    bu = jnp.floor(ref_u / binsize).astype(jnp.int32)
    bv = jnp.floor(ref_v / binsize).astype(jnp.int32)

    big = jnp.float32(1e6)
    valid = m.valid
    du_stack = jnp.stack([d[0] for d in deltas], -1)  # [cap, S]
    dv_stack = jnp.stack([d[1] for d in deltas], -1)

    # Per-bin min/max via a [bins, cap] membership mask + masked reduce (TPU
    # read-modify-write scatters serialize; this is dense VPU work), then the
    # reference's clipped +-1-bin accumulation (matcher.cpp:793-809) becomes
    # a 3x3 neighborhood min/max on a 1-padded bin grid. Off-grid centers
    # clip to the pad ring, which reproduces the reference's end-clipping
    # (a far-off center still feeds the nearest edge bin).
    gu = n_bins_u + 2
    gv = n_bins_v + 2
    bu_e = jnp.clip(bu, -1, n_bins_u) + 1
    bv_e = jnp.clip(bv, -1, n_bins_v) + 1
    bid = jnp.where(valid, bv_e * gu + bu_e, gv * gu)
    member = bid[None, :] == jax.lax.broadcasted_iota(
        jnp.int32, (gv * gu, 1), 0)  # [gv*gu, cap]

    def bin_reduce(vals, mode):
        fill = big if mode == "min" else -big
        masked = jnp.where(member[:, :, None], vals[None, :, :], fill)
        red = (jnp.min if mode == "min" else jnp.max)(masked, axis=1)
        return red.reshape(gv, gu, n_stages)

    dmin_b = bin_reduce(du_stack, "min")
    dmax_b = bin_reduce(du_stack, "max")
    vmin_b = bin_reduce(dv_stack, "min")
    vmax_b = bin_reduce(dv_stack, "max")
    cnt_b = jnp.sum(member, axis=1).reshape(gv, gu).astype(jnp.float32)

    def neigh(x, mode):
        acc = None
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s = jnp.roll(x, (dy, dx), (0, 1))
                if acc is None:
                    acc = s
                elif mode == "min":
                    acc = jnp.minimum(acc, s)
                elif mode == "max":
                    acc = jnp.maximum(acc, s)
                else:
                    acc = acc + s
        return acc[1:-1, 1:-1]  # interior = real bins; pad ring absorbs wrap

    dmin = neigh(dmin_b, "min").reshape(n_bins, n_stages)
    dmax = neigh(dmax_b, "max").reshape(n_bins, n_stages)
    vmin = neigh(vmin_b, "min").reshape(n_bins, n_stages)
    vmax = neigh(vmax_b, "max").reshape(n_bins, n_stages)
    cnt = neigh(cnt_b, "sum").reshape(n_bins)

    has_obs = (cnt > 0)[:, None]
    r = jnp.float32(match_radius)
    dmin = jnp.where(has_obs, dmin, -r)
    dmax = jnp.where(has_obs, dmax, r)
    vmin = jnp.where(has_obs, vmin, -r)
    vmax = jnp.where(has_obs, vmax, r)

    # bound minimum search range to 20x20 (matcher.cpp:845-854)
    def floor20(lo, hi):
        d = hi - lo
        pad = jnp.ceil((20.0 - d) / 2.0)
        grow = d < 20
        return jnp.where(grow, lo - pad, lo), jnp.where(grow, hi + pad, hi)

    dmin, dmax = floor20(dmin, dmax)
    vmin, vmax = floor20(vmin, vmax)
    return RangeTable(dmin, dmax, vmin, vmax)


def lookup_ranges(rt: RangeTable, stat_bin: jnp.ndarray, stage: int):
    """Absolute-range bounds offsets for each row's stat bin."""
    return (rt.u_min[stat_bin, stage], rt.u_max[stat_bin, stage],
            rt.v_min[stat_bin, stage], rt.v_max[stat_bin, stage])


# ---------------------------------------------------------------------------
# Pixel dedup + bucketing
# ---------------------------------------------------------------------------

def dedup_by_pixel(keep: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, w: int, h: int):
    """First match (smallest row index) claims each integer pixel
    (matcher.cpp:1036-1039 M array semantics).

    Pairwise formulation: both a scatter-min over a [w*h] owner array and a
    sort are slow lowering paths on TPU; an [N, N] equality sweep is ~16M
    VPU lane-ops and fuses into one pass."""
    n = keep.shape[0]
    ar = jnp.arange(n, dtype=jnp.int32)
    key = jnp.clip(v.astype(jnp.int32), 0, h - 1) * w + jnp.clip(
        u.astype(jnp.int32), 0, w - 1)
    key = jnp.where(keep, key, -1 - ar)  # invalid: unique negative keys
    dup = jnp.any((key[:, None] == key[None, :]) & (ar[None, :] < ar[:, None]),
                  axis=1)
    return keep & ~dup


@functools.partial(jax.jit, static_argnames=("cap", "max_features"))
def bucket_matches(
    m: Matches,
    key: jnp.ndarray,
    max_features: int,
    bucket_width: float,
    bucket_height: float,
    cap: int,
) -> Matches:
    """Keep <= max_features random matches per (bucket_width x bucket_height)
    bucket of (u1c, v1c) (matcher.cpp:243-284).

    The reference shuffles each bucket with the global rand() and emits
    bucket-major; we use a counter-based PRNG key for determinism and emit in
    index order (downstream consumers are order-insensitive: RANSAC draws by
    PRNG, GN/reconstruction key on indices).

    Sort-free: the random rank within each bucket is computed with one dense
    [n, n] compare+reduce on the VPU (a lexsort + 12 per-field permutation
    gathers measured slower: 1-D gathers serialize on TPU).
    """
    n = m.u1c.shape[0]
    if max_features >= n:
        # keeps every match (the CLI/bench "disable bucketing" setting,
        # main.cpp:71); only emission order differs
        return compact_matches(m, cap)
    # bucket ids (cols from max coordinate, matcher.cpp:246-255)
    u_max = jnp.max(jnp.where(m.valid, m.u1c, 0.0))
    cols = jnp.floor(u_max / bucket_width).astype(jnp.int32) + 1
    bu = jnp.floor(m.u1c / bucket_width).astype(jnp.int32)
    bv = jnp.floor(m.v1c / bucket_height).astype(jnp.int32)
    bid = jnp.where(m.valid, bv * cols + bu, jnp.int32(2 ** 30))

    r = jax.random.uniform(key, (n,))
    ar = jnp.arange(n, dtype=jnp.int32)
    # rank of row i inside its bucket = count of same-bucket valid rows with
    # a strictly smaller (random, index) key
    same = bid[None, :] == bid[:, None]
    smaller = (r[None, :] < r[:, None]) | (
        (r[None, :] == r[:, None]) & (ar[None, :] < ar[:, None]))
    rank = jnp.sum(
        (same & smaller & m.valid[None, :]).astype(jnp.float32), axis=1)
    keep = m.valid & (rank < max_features)
    return compact_matches(
        m._replace(valid=keep, count=jnp.sum(keep.astype(jnp.int32))), cap)
