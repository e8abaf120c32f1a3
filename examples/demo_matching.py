"""Feature matching demos: flow / stereo / quad (equivalents of reference
matlab/demo_matching_{flow,stereo,quad}.m).

Usage: python examples/demo_matching.py [flow|stereo|quad]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    method_name = sys.argv[1] if len(sys.argv) > 1 else "flow"
    method = {"flow": 0, "stereo": 1, "quad": 2}[method_name]

    from sfm_tpu.config import EngineConfig, MatcherParams
    from sfm_tpu.models.matcher import Matcher
    from sfm_tpu.utils.synthetic import SceneConfig, make_sequence

    cfg = SceneConfig()
    left, right, _ = make_sequence(2, cfg, step=0.8, baseline=0.571)
    h, w = left[0].shape
    m = Matcher(MatcherParams(), EngineConfig(), dims=(w, h))

    t0 = time.time()
    if method == 0:
        m.push_back(left[0])
        m.push_back(left[1])
    elif method == 1:
        m.push_back(left[1], right[1])
    else:
        m.push_back(left[0], right[0])
        m.push_back(left[1], right[1])
    t_detect = time.time() - t0

    t0 = time.time()
    m.match_features(method)
    t_match = time.time() - t0

    mm = m.get_matches()
    n = int(mm.count)
    print(f"method={method_name}: {n} matches "
          f"(detect {t_detect:.3f}s, match {t_match:.3f}s)")
    if n:
        if method in (0, 2):
            du = np.asarray(mm.u1c - mm.u1p)[:n]
            dv = np.asarray(mm.v1c - mm.v1p)[:n]
            print(f"median |flow| = {np.median(np.hypot(du, dv)):.2f} px")
        if method in (1, 2):
            dsp = np.asarray(mm.u1c - mm.u2c)[:n]
            print(f"median disparity = {np.median(dsp):.2f} px")


if __name__ == "__main__":
    main()
