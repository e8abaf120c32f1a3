"""On-device Pallas kernel validation (VERDICT round-1 item 7).

The unit suite runs the kernels in interpret mode on CPU; this script runs
them COMPILED on the real TPU and diffs against the jnp oracles, including
the edge cases interpret mode can paper over:

  * sad_argmin_pallas: all-invalid candidate tiles (tile-skip + init path),
    disjoint search windows (every tile skipped), first-index tie-breaks on
    duplicated descriptors, full-range windows.
  * extract_patches_pallas: windows at (0,0), the right/bottom borders
    (reads landing in the alignment padding), and interior positions, vs a
    zero-padded numpy window oracle.
  * plane_sums_pallas: all-invalid mask (exact zeros), single valid entry,
    dense random case.

Exits non-zero on any mismatch; writes benchmarks/tpu_kernel_check.json.

Usage: python benchmarks/tpu_kernel_check.py   (needs the TPU backend)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import sfm_tpu  # noqa: F401  (matmul precision + cache config)
from sfm_tpu.ops import matching
from sfm_tpu.ops.pallas_kernels import (PATCH, extract_patches_pallas,
                                        plane_sums_pallas, sad_argmin_pallas)

rng = np.random.RandomState(0)
results = {}


def check(name, cond):
    ok = bool(cond)
    results[name] = ok
    print(f"{'PASS' if ok else 'FAIL'}  {name}", flush=True)
    return ok


def sad_cases():
    n1, n2 = 256, 512
    d1 = jnp.asarray(rng.randint(0, 256, (n1, 32)), jnp.float32)
    d2 = jnp.asarray(rng.randint(0, 256, (n2, 32)), jnp.float32)
    c1 = jnp.asarray(rng.randint(0, 4, n1), jnp.int32)
    c2 = jnp.asarray(rng.randint(0, 4, n2), jnp.int32)
    u1 = jnp.asarray(rng.randint(0, 1240, n1), jnp.float32)
    v1 = jnp.asarray(rng.randint(0, 375, n1), jnp.float32)
    u2 = jnp.asarray(rng.randint(0, 1240, n2), jnp.float32)
    v2 = jnp.asarray(rng.randint(0, 375, n2), jnp.float32)
    t_u = jnp.where(jnp.asarray(rng.rand(n1) > 0.5), u1, -1.0)
    t_v = jnp.where(t_u >= 0, v1, -1.0)

    def both(valid2, lo, hi, tag, d2_=None):
        args = (d1, c1, u1 + lo, u1 + hi, v1 - 200, v1 + 200, t_u, t_v,
                d2_ if d2_ is not None else d2, u2, v2, c2, valid2)
        idx_ref, cost_ref = matching.sad_argmin_pass(*args, chunk=64)
        idx_pl, cost_pl = sad_argmin_pallas(*args, tm=128, tn=128)
        same_idx = np.array_equal(np.asarray(idx_pl), np.asarray(idx_ref))
        sel = np.asarray(cost_ref) < 1e7
        same_cost = np.allclose(np.asarray(cost_pl)[sel],
                                np.asarray(cost_ref)[sel], rtol=1e-6)
        # rows with no feasible candidate must carry the init cost
        same_init = np.array_equal(np.asarray(cost_pl) >= 1e7, ~sel)
        check(f"sad_argmin/{tag}", same_idx and same_cost and same_init)

    both(jnp.ones(n2, bool), -120, 120, "dense")
    both(jnp.zeros(n2, bool), -120, 120, "all_invalid")
    both(jnp.ones(n2, bool), 5000, 6000, "disjoint_windows")
    # duplicate descriptors force cost ties -> first-index tie-break
    d2_dup = jnp.tile(d2[:64], (8, 1))
    both(jnp.ones(n2, bool), -3000, 3000, "tie_break_duplicates", d2_=d2_dup)

    # count gating: prefix-compacted tables; rows < count1 must match the
    # oracle run on the same (masked) inputs, rows >= count1 keep the
    # no-match init
    cnt1, cnt2 = 180, 300
    valid2g = jnp.arange(n2) < cnt2
    args = (d1, c1, u1 - 120, u1 + 120, v1 - 200, v1 + 200, t_u, t_v,
            d2, u2, v2, c2, valid2g)
    idx_ref, cost_ref = matching.sad_argmin_pass(*args, chunk=64)
    idx_g, cost_g = sad_argmin_pallas(
        *args, count1=jnp.int32(cnt1), count2=jnp.int32(cnt2), tm=64, tn=128)
    same_prefix = (np.array_equal(np.asarray(idx_g)[:cnt1],
                                  np.asarray(idx_ref)[:cnt1])
                   and np.allclose(
                       np.asarray(cost_g)[:cnt1][np.asarray(cost_ref)[:cnt1] < 1e7],
                       np.asarray(cost_ref)[:cnt1][np.asarray(cost_ref)[:cnt1] < 1e7],
                       rtol=1e-6))
    # rows in tiles wholly beyond count1 (tile rows of 64) keep the init
    tail0 = (cnt1 + 63) // 64 * 64
    tail_init = (np.all(np.asarray(cost_g)[tail0:] >= 1e7)
                 and np.all(np.asarray(idx_g)[tail0:] == 0))
    check("sad_argmin/count_gated", same_prefix and tail_init)

    # odd (non-tile-divisible) capacities: the kernel auto-pads to whole
    # tiles (round-5); real rows must still equal the oracle on device
    n1o, n2o = 200, 300
    argo = (d1[:n1o], c1[:n1o], u1[:n1o] - 120, u1[:n1o] + 120,
            v1[:n1o] - 200, v1[:n1o] + 200, t_u[:n1o], t_v[:n1o],
            d2[:n2o], u2[:n2o], v2[:n2o], c2[:n2o],
            jnp.ones(n2o, bool))
    idx_ref, cost_ref = matching.sad_argmin_pass(*argo, chunk=64)
    idx_o, cost_o = sad_argmin_pallas(*argo, tm=128, tn=128)
    sel = np.asarray(cost_ref) < 1e7
    check("sad_argmin/odd_capacity",
          idx_o.shape == (n1o,)
          and np.array_equal(np.asarray(idx_o), np.asarray(idx_ref))
          and np.allclose(np.asarray(cost_o)[sel],
                          np.asarray(cost_ref)[sel], rtol=1e-6))


def patch_cases():
    H, W = 376, 1241
    du = rng.randint(0, 256, (H, W)).astype(np.float32)
    dv = rng.randint(0, 256, (H, W)).astype(np.float32)
    M = 1024
    u0 = rng.randint(0, W, M)
    v0 = rng.randint(0, H, M)
    # force border coverage
    u0[:4] = [0, W - 1, W - PATCH, 127]
    v0[:4] = [0, H - 1, H - PATCH, 7]
    pdu, pdv = extract_patches_pallas(
        jnp.asarray(du), jnp.asarray(dv), jnp.asarray(u0), jnp.asarray(v0))
    # oracle: zero-padded window extraction with the same clipping
    dup = np.pad(du, ((0, PATCH + 8), (0, PATCH + 256)))
    dvp = np.pad(dv, ((0, PATCH + 8), (0, PATCH + 256)))
    uc = np.clip(u0, 0, W - 1)
    vc = np.clip(v0, 0, H - 1)
    ref_u = np.stack([dup[v:v + PATCH, u:u + PATCH]
                      for u, v in zip(uc, vc)])
    ref_v = np.stack([dvp[v:v + PATCH, u:u + PATCH]
                      for u, v in zip(uc, vc)])
    check("extract_patches/borders",
          np.array_equal(np.asarray(pdu), ref_u)
          and np.array_equal(np.asarray(pdv), ref_v))
    # odd match capacity auto-pads to whole blocks (round-5)
    Mo = 777
    odu, odv = extract_patches_pallas(
        jnp.asarray(du), jnp.asarray(dv), jnp.asarray(u0[:Mo]),
        jnp.asarray(v0[:Mo]))
    check("extract_patches/odd_capacity",
          odu.shape[0] == Mo
          and np.array_equal(np.asarray(odu), ref_u[:Mo])
          and np.array_equal(np.asarray(odv), ref_v[:Mo]))
    # count gating: prefix blocks exact, fully-dead blocks zeroed
    cnt = 700  # covers blocks 0..2 fully, block 2 partially at block=256
    gdu, gdv = extract_patches_pallas(
        jnp.asarray(du), jnp.asarray(dv), jnp.asarray(u0), jnp.asarray(v0),
        jnp.int32(cnt), block=256)
    live = (cnt + 255) // 256 * 256  # whole blocks containing live rows
    check("extract_patches/count_prefix",
          np.array_equal(np.asarray(gdu)[:cnt], ref_u[:cnt])
          and np.array_equal(np.asarray(gdv)[:cnt], ref_v[:cnt]))
    check("extract_patches/count_tail_zero",
          np.all(np.asarray(gdu)[live:] == 0.0)
          and np.all(np.asarray(gdv)[live:] == 0.0))


def plane_cases():
    n = 1024
    d = jnp.asarray(rng.uniform(0, 3, n), jnp.float32)
    w = 7.5

    def oracle(valid):
        diff = np.asarray(d)[:, None] - np.asarray(d)[None, :]
        return np.sum(np.where(np.asarray(valid)[None, :],
                               np.exp(-diff * diff * w), 0.0), axis=1)

    dense = jnp.asarray(rng.rand(n) > 0.3)
    got = plane_sums_pallas(d, dense, w, tm=256, tn=256)
    check("plane_sums/dense",
          np.allclose(np.asarray(got), oracle(dense), rtol=3e-5))

    none = jnp.zeros(n, bool)
    got0 = plane_sums_pallas(d, none, w, tm=256, tn=256)
    check("plane_sums/all_invalid", np.all(np.asarray(got0) == 0.0))

    one = jnp.zeros(n, bool).at[17].set(True)
    got1 = plane_sums_pallas(d, one, w, tm=256, tn=256)
    check("plane_sums/single_valid",
          np.allclose(np.asarray(got1), oracle(one), rtol=3e-5))


def run_all():
    """Run every oracle diff; returns (ok, results) and writes the JSON
    record. Called by bench.py as a standing gate before timing."""
    global rng
    rng = np.random.RandomState(0)
    results.clear()
    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()})", flush=True)
    results["backend"] = backend
    results["compiled_not_interpret"] = backend == "tpu"
    if backend != "tpu":
        print("WARNING: not on TPU — kernels run in interpret mode; this "
              "script only certifies on-device behavior on the TPU backend.",
              flush=True)
    sad_cases()
    patch_cases()
    plane_cases()
    knn_cases()
    detect_filter_cases()
    ok = all(v for k, v in results.items() if isinstance(v, bool))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tpu_kernel_check.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(("ALL KERNELS MATCH ORACLES ON DEVICE" if ok else "FAILURES") +
          f" -> {path}", flush=True)
    return ok, dict(results)


def knn_cases():
    """knn_consistency_mask on TPU uses approx_min_k for the kth-distance
    threshold (full top_k lowers to an 8 ms sort). Approx misses can only
    RAISE the threshold, so the device mask must be a SUPERSET of the exact
    oracle's with a small admission excess."""
    from sfm_tpu.ops.outliers import knn_consistency_mask

    n = 2048
    u = jnp.asarray(rng.uniform(0, 1240, n), jnp.float32)
    v = jnp.asarray(rng.uniform(0, 375, n), jnp.float32)
    valid = jnp.asarray(rng.rand(n) > 0.3)
    fu = jnp.asarray(np.where(rng.rand(n) > 0.1, 10.0,
                              rng.uniform(-40, 40, n)), jnp.float32)
    fv = jnp.zeros(n, jnp.float32)
    dp = jnp.asarray(rng.uniform(4, 6, n), jnp.float32)

    def oracle(k, min_support, weighted):
        uu, vv = np.asarray(u), np.asarray(v)
        val = np.asarray(valid)
        d2 = (uu[:, None] - uu[None, :]) ** 2 + (vv[:, None] - vv[None, :]) ** 2
        off = ~val[None, :] | ~val[:, None] | np.eye(n, dtype=bool)
        d2 = np.where(off, np.inf, d2)
        kth = np.sort(d2, axis=1)[:, k - 1:k]
        adj = (d2 <= kth) & ~off
        agree = (np.abs(np.asarray(fu)[:, None] - np.asarray(fu)[None, :])
                 + np.abs(np.asarray(fv)[:, None]
                          - np.asarray(fv)[None, :])) < 5.0
        agree &= np.abs(np.asarray(dp)[:, None] - np.asarray(dp)[None, :]) < 5.0
        if weighted:
            support = np.sum(((adj & adj.T) * 2.0 + (adj ^ adj.T)) * agree, 1)
        else:
            support = np.sum((adj | adj.T) & agree, axis=1)
        return val & (support >= min_support)

    for weighted, ms, tag in ((False, 2, "knn_s2"), (True, 4, "knnw_s4")):
        got = np.asarray(knn_consistency_mask(
            u, v, valid, fu, fv, dp, 2, 5.0, 5.0, k=8, min_support=ms,
            weighted=weighted))
        ref = oracle(8, ms, weighted)
        superset = bool((got | ~ref)[np.asarray(valid)].all())
        excess = float((got & ~ref).sum() / max(ref.sum(), 1))
        check(f"knn_mask/{tag}_superset", superset)
        check(f"knn_mask/{tag}_excess<5%", excess < 0.05)


def detect_filter_cases():
    """detect_filters_pallas must match the jnp filters EXACTLY (integer
    semantics, reference filter.cpp:316-365) inside the valid region — at
    both the full-res shape and the half-res shape the default
    half_resolution detect path runs through the same kernel."""
    from sfm_tpu.ops import filters
    from sfm_tpu.ops.pallas_kernels import detect_filters_pallas

    for H, W, tag in ((376, 1241, "full"), (188, 620, "half")):
        img = jnp.asarray(rng.randint(0, 256, (H, W)), jnp.uint8)
        du, dv, blob, chk = detect_filters_pallas(img, with_blob_checker=True)
        rdu, rdv = filters.sobel5x5(img)
        m = 4
        crop = lambda a: np.asarray(a)[m:-m, m:-m]
        check(f"detect_filters/{tag}/sobel_du",
              np.array_equal(crop(du), crop(rdu)))
        check(f"detect_filters/{tag}/sobel_dv",
              np.array_equal(crop(dv), crop(rdv)))
        check(f"detect_filters/{tag}/blob",
              np.array_equal(crop(blob), crop(filters.blob5x5(img))))
        check(f"detect_filters/{tag}/checker",
              np.array_equal(crop(chk), crop(filters.checkerboard5x5(img))))


def main():
    ok, _ = run_all()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
