"""Long-horizon keyframe bundle adjustment demo.

Runs stereo VO over a synthetic 80-frame curve drive, chains every
frame's inlier matches into unbounded tracks, selects distance-spaced
keyframes, and refines the keyframe/landmark map with the sharded
Schur-complement engine (models/keyframe_ba.py — the SURVEY §7
"map-sharded BA" capability the reference does not have; its only
refinement is per-point with cameras frozen, reconstruction.cpp:179-299).

Run on CPU with a virtual mesh:
    JAX_PLATFORMS=cpu python examples/demo_keyframe_ba.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))


def main():
    from keyframe_ba_eval import run_eval

    out = run_eval("curve", 80, use_mesh=False, verbose=False)
    print(f"frames:            {out['n_frames']} ({out['n_fail']} VO fails)")
    print(f"keyframes:         {out['n_keyframes']}")
    print(f"landmarks / obs:   {out['n_landmarks']} / {out['n_obs']}")
    print(f"chi2:              {out['chi2_initial']:.0f} -> "
          f"{out['chi2_after_local']:.0f}")
    print(f"keyframe ATE:      {out['ate_before_m']:.3f} m -> "
          f"{out['ate_after_local_m']:.3f} m")


if __name__ == "__main__":
    main()
