"""Pallas kernels vs their jnp reference implementations (interpret mode on
CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.ops import matching
from sfm_tpu.ops.pallas_kernels import plane_sums_pallas, sad_argmin_pallas


def test_sad_argmin_pallas_matches_jnp(rng):
    n1, n2 = 128, 256
    d1 = jnp.asarray(rng.randint(0, 256, (n1, 32)), jnp.float32)
    d2 = jnp.asarray(rng.randint(0, 256, (n2, 32)), jnp.float32)
    c1 = jnp.asarray(rng.randint(0, 4, n1), jnp.int32)
    c2 = jnp.asarray(rng.randint(0, 4, n2), jnp.int32)
    u1 = jnp.asarray(rng.randint(0, 300, n1), jnp.float32)
    v1 = jnp.asarray(rng.randint(0, 150, n1), jnp.float32)
    u2 = jnp.asarray(rng.randint(0, 300, n2), jnp.float32)
    v2 = jnp.asarray(rng.randint(0, 150, n2), jnp.float32)
    valid2 = jnp.asarray(rng.rand(n2) > 0.2)
    t_u = jnp.where(jnp.asarray(rng.rand(n1) > 0.5), u1, -1.0)
    t_v = jnp.where(t_u >= 0, v1, -1.0)
    args = (d1, c1, u1 - 60, u1 + 60, v1 - 40, v1 + 40, t_u, t_v,
            d2, u2, v2, c2, valid2)

    idx_ref, cost_ref = matching.sad_argmin_pass(*args, chunk=64)
    idx_pl, cost_pl = sad_argmin_pallas(*args, tm=64, tn=64)
    np.testing.assert_array_equal(np.asarray(idx_pl), np.asarray(idx_ref))
    sel = np.asarray(cost_ref) < 1e7
    np.testing.assert_allclose(np.asarray(cost_pl)[sel],
                               np.asarray(cost_ref)[sel], rtol=1e-6)


def test_plane_sums_pallas_matches_jnp(rng):
    n = 256
    d = jnp.asarray(rng.uniform(0, 3, n), jnp.float32)
    valid = jnp.asarray(rng.rand(n) > 0.3)
    w = 7.5
    got = plane_sums_pallas(d, valid, w, tm=64, tn=64)
    diff = d[:, None] - d[None, :]
    ref = jnp.sum(jnp.where(valid[None, :], jnp.exp(-diff * diff * w), 0.0), axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5)



def test_sad_argmin_count_gated(rng):
    """Count gating (interpret): rows < count1 match the oracle, rows in
    tiles wholly beyond count1 keep the no-match init."""
    from sfm_tpu.ops import matching
    from sfm_tpu.ops.pallas_kernels import sad_argmin_pallas

    n1, n2 = 128, 128
    cnt1, cnt2 = 70, 90
    d1 = jnp.asarray(rng.randint(0, 256, (n1, 32)), jnp.float32)
    d2 = jnp.asarray(rng.randint(0, 256, (n2, 32)), jnp.float32)
    c1 = jnp.asarray(rng.randint(0, 4, n1), jnp.int32)
    c2 = jnp.asarray(rng.randint(0, 4, n2), jnp.int32)
    u1 = jnp.asarray(rng.randint(0, 300, n1), jnp.float32)
    v1 = jnp.asarray(rng.randint(0, 150, n1), jnp.float32)
    u2 = jnp.asarray(rng.randint(0, 300, n2), jnp.float32)
    v2 = jnp.asarray(rng.randint(0, 150, n2), jnp.float32)
    valid2 = jnp.arange(n2) < cnt2
    neg = jnp.full(n1, -1.0, jnp.float32)
    args = (d1, c1, u1 - 80, u1 + 80, v1 - 60, v1 + 60, neg, neg,
            d2, u2, v2, c2, valid2)
    idx_ref, cost_ref = matching.sad_argmin_pass(*args, chunk=64)
    idx_g, cost_g = sad_argmin_pallas(
        *args, count1=jnp.int32(cnt1), count2=jnp.int32(cnt2), tm=32, tn=64)
    np.testing.assert_array_equal(np.asarray(idx_g)[:cnt1],
                                  np.asarray(idx_ref)[:cnt1])
    sel = np.asarray(cost_ref)[:cnt1] < 1e7
    np.testing.assert_allclose(np.asarray(cost_g)[:cnt1][sel],
                               np.asarray(cost_ref)[:cnt1][sel], rtol=1e-6)
    tail0 = (cnt1 + 31) // 32 * 32
    assert np.all(np.asarray(cost_g)[tail0:] >= 1e7)
    assert np.all(np.asarray(idx_g)[tail0:] == 0)


def test_extract_patches_count_gated(rng):
    """Prefix blocks exact, dead blocks zeroed (interpret)."""
    import jax.numpy as jnp2

    from sfm_tpu.ops.pallas_kernels import PATCH, extract_patches_pallas

    H, W = 64, 256
    M, cnt, blk = 64, 30, 16
    du = jnp2.asarray(rng.randint(0, 256, (H, W)), jnp2.float32)
    dv = jnp2.asarray(rng.randint(0, 256, (H, W)), jnp2.float32)
    u0 = jnp2.asarray(rng.randint(0, W, M), jnp2.int32)
    v0 = jnp2.asarray(rng.randint(0, H, M), jnp2.int32)
    full_u, full_v = extract_patches_pallas(du, dv, u0, v0, block=blk)
    g_u, g_v = extract_patches_pallas(du, dv, u0, v0, jnp2.int32(cnt),
                                      block=blk)
    np.testing.assert_array_equal(np.asarray(g_u)[:cnt],
                                  np.asarray(full_u)[:cnt])
    np.testing.assert_array_equal(np.asarray(g_v)[:cnt],
                                  np.asarray(full_v)[:cnt])
    live = (cnt + blk - 1) // blk * blk
    assert np.all(np.asarray(g_u)[live:] == 0.0)
    assert np.all(np.asarray(g_v)[live:] == 0.0)


def test_sad_argmin_pallas_odd_capacity(rng):
    """Non-power-of-two table capacities auto-pad instead of asserting
    (VERDICT r4 item 7): results equal the jnp oracle for every real row."""
    n1, n2 = 120, 200  # neither divisible by the 64-tile
    d1 = jnp.asarray(rng.randint(0, 256, (n1, 32)), jnp.float32)
    d2 = jnp.asarray(rng.randint(0, 256, (n2, 32)), jnp.float32)
    c1 = jnp.asarray(rng.randint(0, 4, n1), jnp.int32)
    c2 = jnp.asarray(rng.randint(0, 4, n2), jnp.int32)
    u1 = jnp.asarray(rng.randint(0, 300, n1), jnp.float32)
    v1 = jnp.asarray(rng.randint(0, 150, n1), jnp.float32)
    u2 = jnp.asarray(rng.randint(0, 300, n2), jnp.float32)
    v2 = jnp.asarray(rng.randint(0, 150, n2), jnp.float32)
    valid2 = jnp.asarray(rng.rand(n2) > 0.2)
    neg = jnp.full(n1, -1.0, jnp.float32)
    args = (d1, c1, u1 - 60, u1 + 60, v1 - 40, v1 + 40, neg, neg,
            d2, u2, v2, c2, valid2)
    idx_ref, cost_ref = matching.sad_argmin_pass(*args, chunk=64)
    idx_pl, cost_pl = sad_argmin_pallas(*args, tm=64, tn=64)
    assert idx_pl.shape == (n1,) and cost_pl.shape == (n1,)
    np.testing.assert_array_equal(np.asarray(idx_pl), np.asarray(idx_ref))
    sel = np.asarray(cost_ref) < 1e7
    np.testing.assert_allclose(np.asarray(cost_pl)[sel],
                               np.asarray(cost_ref)[sel], rtol=1e-6)


def test_extract_patches_odd_capacity(rng):
    """Odd match capacity auto-pads to whole blocks; real rows exact."""
    from sfm_tpu.ops.pallas_kernels import extract_patches_pallas

    H, W = 64, 256
    M, blk = 77, 32
    du = jnp.asarray(rng.randint(0, 256, (H, W)), jnp.float32)
    dv = jnp.asarray(rng.randint(0, 256, (H, W)), jnp.float32)
    u0 = jnp.asarray(rng.randint(0, W - 16, M), jnp.int32)
    v0 = jnp.asarray(rng.randint(0, H - 16, M), jnp.int32)
    pu, pv = extract_patches_pallas(du, dv, u0, v0, block=blk)
    assert pu.shape[0] == M and pv.shape[0] == M
    un, vn = np.asarray(u0), np.asarray(v0)
    dun, dvn = np.asarray(du), np.asarray(dv)
    for j in [0, 13, 76]:
        np.testing.assert_array_equal(
            np.asarray(pu)[j], dun[vn[j]:vn[j] + 16, un[j]:un[j] + 16])
        np.testing.assert_array_equal(
            np.asarray(pv)[j], dvn[vn[j]:vn[j] + 16, un[j]:un[j] + 16])


def test_plane_sums_odd_capacity(rng):
    n = 100
    d = jnp.asarray(rng.uniform(0, 3, n), jnp.float32)
    valid = jnp.asarray(rng.rand(n) > 0.3)
    w = 7.5
    got = plane_sums_pallas(d, valid, w, tm=64, tn=64)
    assert got.shape == (n,)
    diff = d[:, None] - d[None, :]
    ref = jnp.sum(jnp.where(valid[None, :], jnp.exp(-diff * diff * w), 0.0),
                  axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5)


def test_nms_emission_ascending_u():
    """Perf guard for the SAD tile-skip precondition: sad_argmin_pallas's
    tile-skip assumes features are emitted x-block-major, so the compacted
    prefix's u coordinates must be non-decreasing at block granularity
    (ops/pallas_kernels.py tile-skip note). If the NMS emission order ever
    changes, the kernel stays correct but silently loses its skip — this
    test trips instead."""
    from sfm_tpu.ops.filters import blob5x5, checkerboard5x5
    from sfm_tpu.ops.nms import MARGIN, nms_features
    from sfm_tpu.utils.synthetic import SceneConfig, make_sequence

    W, H, n = 320, 160, 3
    left, _ = make_sequence(1, SceneConfig(width=W, height=H, f=166.0,
                                           cu=160.0, cv=80.0))
    img = jnp.asarray(left[0])
    fs = nms_features(blob5x5(img), checkerboard5x5(img),
                      w=W, h=H, n=n, tau=50, cap=2048)
    cnt = int(fs.count)
    assert cnt > 50
    u = np.asarray(fs.u)[:cnt]
    bs = n + 1
    start = n + MARGIN
    ublk = (u - start) // bs
    assert np.all(np.diff(ublk) >= 0), \
        "NMS emission is no longer x-block-major ascending; the " \
        "sad_argmin_pallas tile-skip precondition is broken"
