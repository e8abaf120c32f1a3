"""TRUE multi-process distributed dryrun (2 processes x 4 CPU devices).

All other multichip evidence in this repo is single-process virtual meshes;
this launches 2 OS processes over localhost with jax.distributed.initialize
(the same mechanism a real 2-host TPU pod uses, with gRPC standing in for
DCN) and proves the cross-process code path:

  * the global 8-device mesh assembles across the process boundary,
  * landmark-sharded Schur BA (one psum of S/rhs/chi2 per step) produces the
    SAME chi2 and camera update as the single-process unsharded step,
  * hypothesis-sharded RANSAC arg-best (pmax/psum over the boundary) returns
    the known all-inlier answer.

This fills the comm-backend slot of SURVEY §2.5 (the reference's only
host<->device boundary is opencl_wrapper.cpp:59-104; it has no multi-process
anything). Usage:

    python benchmarks/multiproc_dryrun.py            # parent: spawn + check
    python benchmarks/multiproc_dryrun.py worker I N # internal

Writes benchmarks/multiproc_dryrun.json.
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
PORT = 39117
N_PROC = 2
LOCAL_DEVICES = 4


def worker(pid: int, n_proc: int):
    # distributed init MUST run before anything creates a backend (library
    # imports may touch jax.devices()), and CPU collectives need gloo.
    # The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so
    # override the live config too (as tests/conftest.py does).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, os.path.join(HERE, ".."))
    from sfm_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(f"127.0.0.1:{PORT}", n_proc, pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sfm_tpu.parallel.ba import (ba_step_local, make_distributed_ba_step,
                                     synthetic_problem)
    from sfm_tpu.parallel.mesh import make_mesh
    from sfm_tpu.parallel.ransac_shard import make_sharded_ransac_f

    assert jax.process_count() == n_proc, jax.process_count()
    n_dev = len(jax.devices())
    assert n_dev == n_proc * LOCAL_DEVICES, n_dev

    mesh = make_mesh({"data": n_dev})
    spec_l = NamedSharding(mesh, P("data"))
    spec_r = NamedSharding(mesh, P())

    def to_global(arr, sharding):
        arr = np.asarray(arr)
        return jax.make_array_from_callback(arr.shape, sharding,
                                            lambda idx: arr[idx])

    # --- landmark-sharded Schur BA across the process boundary ---
    prob, _, _ = synthetic_problem(4, 32 * n_dev, 3)  # deterministic seed 0
    intr = (500.0, 320.0, 160.0)
    gprob = prob._replace(
        cam_tr=to_global(prob.cam_tr, spec_r),
        points=to_global(prob.points, spec_l),
        obs_uv=to_global(prob.obs_uv, spec_l),
        obs_cam=to_global(prob.obs_cam, spec_l),
        obs_mask=to_global(prob.obs_mask, spec_l),
        point_valid=to_global(prob.point_valid, spec_l))
    ba_step = make_distributed_ba_step(mesh, intr, axis="data")
    new_prob, chi2 = ba_step(gprob)
    jax.block_until_ready(chi2)
    chi2 = float(chi2)  # out_spec P(): replicated, readable on any process

    # single-process reference on this process's local devices
    ref_prob, ref_chi2 = jax.jit(lambda pr: ba_step_local(
        pr, jnp.asarray(intr, jnp.float32), jnp.float32(1e-3)))(prob)
    ref_chi2 = float(ref_chi2)
    np.testing.assert_allclose(chi2, ref_chi2, rtol=1e-5)
    cam_new = np.asarray(new_prob.cam_tr)  # replicated output
    np.testing.assert_allclose(cam_new, np.asarray(ref_prob.cam_tr),
                               atol=5e-4)

    # --- hypothesis-sharded RANSAC arg-best across the boundary ---
    rng = np.random.RandomState(0)
    n_pts = 64
    u1p = rng.uniform(-1, 1, n_pts).astype(np.float32)
    v1p = rng.uniform(-1, 1, n_pts).astype(np.float32)
    args = [to_global(a, spec_r) for a in
            (u1p, v1p, u1p + 0.01, v1p, np.ones(n_pts, bool))]
    ransac = make_sharded_ransac_f(mesh, iters=16 * n_dev, thresh=1e-4,
                                   axis="data")
    key = to_global(np.asarray(jax.random.PRNGKey(1)), spec_r)
    F, mask, n_in, ok = ransac(key, *args)
    jax.block_until_ready(F)
    assert int(n_in) == n_pts and bool(np.asarray(mask).all()) and bool(ok)

    # --- data-parallel mono VO step across the process boundary ---
    # (VERDICT r4 item 6: the DP VO step was previously verified multi-device
    # only on a single-process virtual mesh). B = one sequence per global
    # device; the full fused frame step runs sharded over both processes and
    # the small result fields are all-gathered (replicated) for comparison
    # against the unsharded local vmapped step.
    from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                                MonoParams)
    from sfm_tpu.models.pipeline import make_mono_frame_step
    from sfm_tpu.parallel.sequence_dp import init_batched_features
    from sfm_tpu.utils.synthetic import SceneConfig, make_sequence

    w, h = 224, 128
    vo_params = MonoParams(
        calib=Calibration(f=112.0, cu=112.0, cv=64.0), height=1.6,
        ransac_iters=256, bucket=Bucketing(max_features=1000))
    vo_engine = EngineConfig(max_features_dense=384, max_features_sparse=96,
                             max_matches=384, outlier_mode="grid")
    B = n_dev
    frames0, frames1 = [], []
    for b in range(B):
        cfg = SceneConfig(width=w, height=h, f=112.0, cu=112.0, cv=64.0,
                          wall_dist=5.0, seed=7 + b)
        fr, _ = make_sequence(2, cfg, step=0.7)
        frames0.append(fr[0])
        frames1.append(fr[1])
    imgs0 = np.stack(frames0).astype(np.uint8)
    imgs1 = np.stack(frames1).astype(np.uint8)
    prev_local = init_batched_features(w, h, vo_params, vo_engine,
                                       jnp.asarray(imgs0))
    prev_g = jax.tree.map(lambda x: to_global(x, spec_l), prev_local)
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(0), B))
    vo_step = make_mono_frame_step(w, h, vo_params, vo_engine)
    vstep = jax.vmap(vo_step)

    @jax.jit
    def dp_vo(prev, imgs, ks):
        _, _, res = vstep(prev, imgs, ks)
        rep = lambda x: jax.lax.with_sharding_constraint(x, spec_r)
        return (rep(res.tr), rep(res.success.astype(jnp.int32)),
                rep(res.n_inliers))

    tr_g, succ_g, nin_g = dp_vo(prev_g, to_global(imgs1, spec_l),
                                to_global(keys, spec_l))
    jax.block_until_ready(tr_g)
    res_ref = vstep(prev_local, jnp.asarray(imgs1), jnp.asarray(keys))[2]
    vo_succ = np.asarray(succ_g).astype(bool)
    assert vo_succ.all(), f"DP VO across 2 processes: success={vo_succ}"
    np.testing.assert_allclose(np.asarray(tr_g), np.asarray(res_ref.tr),
                               atol=1e-5)
    assert (np.asarray(nin_g) == np.asarray(res_ref.n_inliers)).all()
    vo_tr_diff = float(
        np.abs(np.asarray(tr_g) - np.asarray(res_ref.tr)).max())

    if pid == 0:
        out = {
            "processes": n_proc, "devices": n_dev,
            "mesh": {k: int(v) for k, v in mesh.shape.items()},
            "ba_chi2_2proc": chi2, "ba_chi2_1proc": ref_chi2,
            "ba_cam_max_abs_diff": float(
                np.abs(cam_new - np.asarray(ref_prob.cam_tr)).max()),
            "ransac_inliers": f"{int(n_in)}/{n_pts}",
            "dp_vo_sequences": int(B),
            "dp_vo_success": vo_succ.tolist(),
            "dp_vo_tr_max_abs_diff": vo_tr_diff,
            "ok": True,
        }
        with open(os.path.join(HERE, "multiproc_dryrun.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(f"worker 0: {out}")
    print(f"worker {pid}: OK", flush=True)


def parent():
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count="
                         f"{LOCAL_DEVICES}")
    env.pop("JAX_PLATFORM_NAME", None)
    logs = [open(os.path.join(HERE, f"multiproc_worker{i}.log"), "w")
            for i in range(N_PROC)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "worker", str(i),
         str(N_PROC)], env=env, stdout=logs[i], stderr=subprocess.STDOUT)
        for i in range(N_PROC)]
    rcs = [p.wait(timeout=600) for p in procs]
    for lg in logs:
        lg.close()
    if any(rc != 0 for rc in rcs):
        for i in range(N_PROC):
            print(f"--- worker {i} log tail ---")
            print("\n".join(open(
                os.path.join(HERE, f"multiproc_worker{i}.log")
            ).read().splitlines()[-15:]))
    assert all(rc == 0 for rc in rcs), f"worker exit codes: {rcs}"
    res = json.load(open(os.path.join(HERE, "multiproc_dryrun.json")))
    assert res["ok"] and res["processes"] == N_PROC
    print("multiproc dryrun PASSED:", res)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        parent()
