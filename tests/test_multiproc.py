"""True multi-process distributed test: 2 OS processes x 4 CPU devices over
localhost gRPC (the mechanism of a real 2-host pod), asserting the sharded
Schur BA and hypothesis-sharded RANSAC produce single-process results.

Runs benchmarks/multiproc_dryrun.py as subprocesses — it cannot run in-proc
because jax.distributed owns the whole process."""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SCRIPT = os.path.join(HERE, "..", "benchmarks", "multiproc_dryrun.py")


def test_two_process_mesh_matches_single_process():
    r = subprocess.run([sys.executable, SCRIPT], capture_output=True,
                       text=True, timeout=560)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    res = json.load(open(os.path.join(
        HERE, "..", "benchmarks", "multiproc_dryrun.json")))
    assert res["ok"] and res["processes"] == 2 and res["devices"] == 8
    assert abs(res["ba_chi2_2proc"] - res["ba_chi2_1proc"]) <= (
        1e-5 * abs(res["ba_chi2_1proc"]))
    assert res["ba_cam_max_abs_diff"] <= 5e-4
    # the sharded DP mono VO step ran across the 2-process mesh and equals
    # the single-process vmapped step (VERDICT r4 item 6)
    assert res["dp_vo_sequences"] == 8
    assert all(res["dp_vo_success"])
    assert res["dp_vo_tr_max_abs_diff"] <= 1e-5
