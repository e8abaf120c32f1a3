"""Matching engine golden tests vs numpy brute force."""

import numpy as np
import jax
import jax.numpy as jnp

from sfm_tpu.ops import matching
from sfm_tpu.ops.matching import Matches, RangeTable


def brute_force_pass(d1, c1, umin, umax, vmin, vmax, tu, tv, d2, u2, v2, c2,
                     valid2):
    """Literal findMatch semantics (matcher.cpp:892-963), index-order scan."""
    n1, n2 = d1.shape[0], d2.shape[0]
    out = np.zeros(n1, np.int32)
    for i in range(n1):
        best, best_cost = 0, 1e7
        for j in range(n2):
            if not valid2[j] or c2[j] != c1[i]:
                continue
            if not (umin[i] <= u2[j] <= umax[i] and vmin[i] <= v2[j] <= vmax[i]):
                continue
            cost = float(np.abs(d1[i] - d2[j]).sum())
            if tu[i] >= 0 and tv[i] >= 0:
                cost += 4.0 * np.sqrt((u2[j] - tu[i]) ** 2 + (v2[j] - tv[i]) ** 2)
            if cost < best_cost:
                best, best_cost = j, cost
        out[i] = best
    return out


def test_sad_argmin_pass_matches_bruteforce(rng):
    n1, n2 = 100, 150
    d1 = rng.randint(0, 256, (n1, 32)).astype(np.float32)
    d2 = rng.randint(0, 256, (n2, 32)).astype(np.float32)
    c1 = rng.randint(0, 4, n1).astype(np.int32)
    c2 = rng.randint(0, 4, n2).astype(np.int32)
    u2 = rng.randint(0, 200, n2).astype(np.float32)
    v2 = rng.randint(0, 100, n2).astype(np.float32)
    valid2 = rng.rand(n2) > 0.1
    u1 = rng.randint(0, 200, n1).astype(np.float32)
    v1 = rng.randint(0, 100, n1).astype(np.float32)
    umin, umax = u1 - 50, u1 + 50
    vmin, vmax = v1 - 30, v1 + 30
    tu = np.where(rng.rand(n1) > 0.5, u1, -1.0).astype(np.float32)
    tv = np.where(tu >= 0, v1, -1.0).astype(np.float32)

    idx, cost = matching.sad_argmin_pass(
        jnp.asarray(d1), jnp.asarray(c1),
        jnp.asarray(umin), jnp.asarray(umax), jnp.asarray(vmin),
        jnp.asarray(vmax), jnp.asarray(tu), jnp.asarray(tv),
        jnp.asarray(d2), jnp.asarray(u2), jnp.asarray(v2), jnp.asarray(c2),
        jnp.asarray(valid2), chunk=32)
    ref = brute_force_pass(d1, c1, umin, umax, vmin, vmax, tu, tv, d2, u2, v2,
                           c2, valid2)
    np.testing.assert_array_equal(np.asarray(idx), ref)


def _mk_matches(rng, cap, n, w=400, h=200):
    m = matching.empty_matches(cap)
    u1c = rng.randint(0, w, n).astype(np.float32)
    v1c = rng.randint(0, h, n).astype(np.float32)
    flow = rng.randint(-20, 20, (n, 2)).astype(np.float32)
    dispp = rng.randint(1, 30, n).astype(np.float32)
    dispc = rng.randint(1, 30, n).astype(np.float32)
    valid = np.zeros(cap, bool)
    valid[:n] = True

    def pad(x, fill=-1.0):
        out = np.full(cap, fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    return m._replace(
        u1c=pad(u1c), v1c=pad(v1c),
        u1p=pad(u1c - flow[:, 0]), v1p=pad(v1c - flow[:, 1]),
        u2c=pad(u1c - dispc), v2c=pad(v1c),
        u2p=pad(u1c - flow[:, 0] - dispp), v2p=pad(v1c - flow[:, 1]),
        valid=jnp.asarray(valid), count=jnp.int32(n))


def prior_stats_oracle(m, method, nbu, nbv, binsize, radius):
    """Literal computePriorStatistics (matcher.cpp:734-868)."""
    n_stages = 4 if method == 2 else 2
    n = int(m.count)
    u1p, v1p = np.asarray(m.u1p)[:n], np.asarray(m.v1p)[:n]
    u1c, v1c = np.asarray(m.u1c)[:n], np.asarray(m.v1c)[:n]
    u2p, v2p = np.asarray(m.u2p)[:n], np.asarray(m.v2p)[:n]
    u2c, v2c = np.asarray(m.u2c)[:n], np.asarray(m.v2c)[:n]
    accu = [[] for _ in range(nbu * nbv)]
    for i in range(n):
        if method == 0:
            dd = [u1p[i] - u1c[i], v1p[i] - v1c[i], u1c[i] - u1p[i],
                  v1c[i] - v1p[i], 0, 0, 0, 0]
            ru, rv = u1c[i], v1c[i]
        elif method == 1:
            dd = [u2c[i] - u1c[i], 0, u1c[i] - u2c[i], 0, 0, 0, 0, 0]
            ru, rv = u1c[i], v1c[i]
        else:
            dd = [u2p[i] - u1p[i], 0, u2c[i] - u2p[i], v2c[i] - v2p[i],
                  u1c[i] - u2c[i], 0, u1p[i] - u1c[i], v1p[i] - v1c[i]]
            ru, rv = u1p[i], v1p[i]
        ub0 = min(max(int(np.floor(ru / binsize)) - 1, 0), nbu - 1)
        ub1 = min(max(int(np.floor(ru / binsize)) + 1, 0), nbu - 1)
        vb0 = min(max(int(np.floor(rv / binsize)) - 1, 0), nbv - 1)
        vb1 = min(max(int(np.floor(rv / binsize)) + 1, 0), nbv - 1)
        for vb in range(vb0, vb1 + 1):
            for ub in range(ub0, ub1 + 1):
                accu[vb * nbu + ub].append(dd)
    out = np.zeros((nbu * nbv, n_stages, 4), np.float32)
    for b in range(nbu * nbv):
        if accu[b]:
            arr = np.array(accu[b])
            dmin = arr.min(0)
            dmax = arr.max(0)
        else:
            dmin = np.full(8, -radius)
            dmax = np.full(8, radius)
        for s in range(n_stages):
            lo_u, hi_u = dmin[2 * s], dmax[2 * s]
            lo_v, hi_v = dmin[2 * s + 1], dmax[2 * s + 1]
            if hi_u - lo_u < 20:
                pad = np.ceil((20 - (hi_u - lo_u)) / 2)
                lo_u, hi_u = lo_u - pad, hi_u + pad
            if hi_v - lo_v < 20:
                pad = np.ceil((20 - (hi_v - lo_v)) / 2)
                lo_v, hi_v = lo_v - pad, hi_v + pad
            out[b, s] = [lo_u, hi_u, lo_v, hi_v]
    return out


def test_prior_statistics(rng):
    for method in (0, 1, 2):
        m = _mk_matches(rng, 256, 120)
        nbu, nbv, binsize = 8, 4, 50
        rt = matching.compute_prior_statistics(
            m, method=method, n_bins_u=nbu, n_bins_v=nbv, binsize=binsize,
            match_radius=100.0)
        ref = prior_stats_oracle(m, method, nbu, nbv, binsize, 100.0)
        got = np.stack([np.asarray(rt.u_min), np.asarray(rt.u_max),
                        np.asarray(rt.v_min), np.asarray(rt.v_max)], axis=-1)
        np.testing.assert_allclose(got, ref, atol=1e-4)


def test_dedup_by_pixel():
    keep = jnp.asarray([True, True, True, False])
    u = jnp.asarray([5.0, 5.0, 7.0, 5.0])
    v = jnp.asarray([3.0, 3.0, 3.0, 3.0])
    out = np.asarray(matching.dedup_by_pixel(keep, u, v, 10, 10))
    np.testing.assert_array_equal(out, [True, False, True, False])


def test_bucketing(rng):
    cap, n = 512, 300
    m = _mk_matches(rng, cap, n)
    key = jax.random.PRNGKey(0)
    out = matching.bucket_matches(m, key, 2, 50.0, 50.0, cap)
    k = int(out.count)
    assert 0 < k <= n
    # at most 2 per bucket
    bu = np.floor(np.asarray(out.u1c)[:k] / 50).astype(int)
    bv = np.floor(np.asarray(out.v1c)[:k] / 50).astype(int)
    from collections import Counter

    counts = Counter(zip(bu.tolist(), bv.tolist()))
    assert max(counts.values()) <= 2
    # deterministic given key
    out2 = matching.bucket_matches(m, key, 2, 50.0, 50.0, cap)
    np.testing.assert_array_equal(np.asarray(out.u1c), np.asarray(out2.u1c))
    # all emitted matches are real input matches
    in_set = set(zip(np.asarray(m.u1c)[:n].tolist(),
                     np.asarray(m.v1c)[:n].tolist()))
    for i in range(k):
        assert (float(out.u1c[i]), float(out.v1c[i])) in in_set


def test_bucketing_small_cap_keeps_all_when_under(rng):
    """bucket_matches with cap < table size (the post-bucket refine_window
    table): all surviving matches fit and are compacted to the prefix."""
    cap_in, n = 512, 200
    m = _mk_matches(rng, cap_in, n)
    key = jax.random.PRNGKey(1)
    out = matching.bucket_matches(m, key, 2, 50.0, 50.0, 256)
    assert out.u1c.shape[0] == 256
    k = int(out.count)
    assert 0 < k <= n
    v = np.asarray(out.valid)
    assert v[:k].all() and not v[k:].any()  # compacted prefix
    in_set = set(zip(np.asarray(m.u1c)[:n].tolist(),
                     np.asarray(m.v1c)[:n].tolist()))
    for i in range(k):
        assert (float(out.u1c[i]), float(out.v1c[i])) in in_set
