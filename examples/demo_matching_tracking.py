"""Monocular feature tracking via feature indices — equivalent of the
reference matlab/demo_matching_tracking.m: push N frames through the
Matcher, match flow each step, then chain matches into tracks through the
per-feature indices (the mex `get_indices` data) and render a plotTrack.m
overlay on the last frame.

Usage: python examples/demo_matching_tracking.py [n_frames] [out.png]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    out = sys.argv[2] if len(sys.argv) > 2 else "tracks.png"

    from sfm_tpu.config import EngineConfig, MatcherParams, replace
    from sfm_tpu.models.matcher import Matcher
    from sfm_tpu.utils.synthetic import SceneConfig, make_sequence
    from sfm_tpu.utils.viz import build_tracks, plot_track

    cfg = SceneConfig()
    frames, _ = make_sequence(n_frames, cfg, step=0.8)
    h, w = frames[0].shape
    # demo_matching_tracking.m:6-15 parameter block (nms_n=2, refinement=2)
    params = MatcherParams(nms_n=2, refinement=2)
    m = Matcher(params, EngineConfig(), dims=(w, h))

    m.push_back(frames[0])
    p_matched, i_matched = [], []
    for i in range(1, n_frames):
        t0 = time.time()
        m.push_back(frames[i])
        t_detect = time.time() - t0
        t0 = time.time()
        m.match_features(0)
        mm = m.get_matches()
        t_match = time.time() - t0
        n = int(mm.count)
        sel = np.asarray(mm.valid)
        p_matched.append(np.stack(
            [np.asarray(mm.u1p)[sel], np.asarray(mm.v1p)[sel],
             np.asarray(mm.u1c)[sel], np.asarray(mm.v1c)[sel]], axis=1))
        i_matched.append(np.stack(
            [np.asarray(mm.i1p)[sel], np.asarray(mm.i1c)[sel]], axis=1))
        print(f"frame {i}: {n} matches "
              f"(detect {t_detect:.3f}s, match {t_match:.3f}s)")

    tracks = build_tracks(p_matched, i_matched)
    lengths = [len(t) - 1 for t in tracks]
    print(f"{len(tracks)} tracks of length >= 2 "
          f"(max {max(lengths) if lengths else 0}, "
          f"mean {np.mean(lengths):.1f})" if lengths else "no tracks")
    n_drawn = plot_track(frames[-1], p_matched, i_matched, out)
    print(f"wrote {out} ({n_drawn} tracks drawn)")


if __name__ == "__main__":
    main()
