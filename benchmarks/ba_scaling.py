"""Distributed bundle-adjustment scaling bench (BASELINE.json configs[4]).

Measures one Schur-complement BA step (landmarks sharded over the mesh, the
[Nc*6]^2 camera system psum-reduced) at several mesh sizes and reports
per-step time + scaling efficiency vs the 1-device run.

On this environment only ONE real TPU chip is reachable, so the default run
uses N virtual CPU devices (xla_force_host_platform_device_count) to
validate the sharding/collective machinery and expose the scaling trend of
the compute-bound portion. On a real v5e slice, run with JAX_PLATFORMS
unset; the same script then measures true ICI-coupled scaling
(`python benchmarks/ba_scaling.py --real`).

Usage: python benchmarks/ba_scaling.py [--real] [n_landmarks]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REAL = "--real" in sys.argv
if not REAL:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not REAL:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from sfm_tpu.parallel.ba import (BAProblem, make_distributed_ba_step,
                                     synthetic_problem)
    from sfm_tpu.parallel.mesh import make_mesh

    n_args = [a for a in sys.argv[1:] if a.isdigit()]
    n_pts = int(n_args[0]) if n_args else 65536
    n_cams, k_obs = 12, 4
    intr = (500.0, 320.0, 160.0)
    prob, gt_tr, _ = synthetic_problem(n_cams, n_pts, k_obs, noise=0.5,
                                       intr=intr)

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}", flush=True)
    if not REAL:
        print("NOTE: virtual CPU devices timeshare the physical cores, so "
              "the efficiency column validates correctness/compilation only "
              "(identical chi2 across mesh sizes = sharded psum reduction "
              "is exact); run --real on a multi-chip slice for true ICI "
              "scaling.", flush=True)
    sizes = [s for s in (1, 2, 4, 8) if s <= n_dev]
    base = None
    for s in sizes:
        mesh = make_mesh({"data": s}, devices=jax.devices()[:s])
        step = make_distributed_ba_step(mesh, intr, damping=1e-3)
        p, chi = step(prob)
        jax.block_until_ready(chi)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            p, chi = step(prob)
        jax.block_until_ready(chi)
        dt = (time.perf_counter() - t0) / reps * 1000
        if base is None:
            base = dt
        eff = base / (dt * s) * 100
        print(f"mesh data={s}: {dt:8.2f} ms/step  chi2={float(chi):.1f}  "
              f"scaling efficiency vs 1 dev: {eff:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
