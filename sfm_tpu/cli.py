"""Command-line SfM application (reference main.cpp:29-127).

Usage: python -m sfm_tpu.cli [options] <image_dir>

Flags mirror the reference getopt set (main.cpp:34-70): -f focal, -u cu,
-v cv, --height, --pitch, -n frames, -o output.ply. The -g GUI flag of the
reference is replaced by --save-viz (matplotlib scatter export); -c OpenCL
is meaningless here (the TPU path IS the accelerated path).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="sfm_tpu",
                                description="TPU-native monocular SfM demo")
    p.add_argument("image_dir", help="directory with %%04d.png frames")
    p.add_argument("-f", "--focal", type=float, default=645.2)
    p.add_argument("-u", "--cu", type=float, default=635.9)
    p.add_argument("-v", "--cv", type=float, default=194.1)
    p.add_argument("--height", type=float, default=1.6,
                   help="camera height above ground (m)")
    p.add_argument("--pitch", type=float, default=-0.08,
                   help="camera pitch (rad, negative=down)")
    p.add_argument("-n", "--n-frames", type=int, default=0)
    p.add_argument("-s", "--stereo", action="store_true",
                   help="stereo SfM: frames named %%06d_l / %%06d_r in "
                        "image_dir (metric scale; beyond the reference's "
                        "mono-only driver)")
    p.add_argument("-b", "--base", type=float, default=0.571,
                   help="stereo baseline (m)")
    p.add_argument("--refine-map", action="store_true",
                   help="run windowed bundle adjustment over the active "
                        "tracks + recent poses after the sequence and merge "
                        "the refined landmarks into the exported map")
    p.add_argument("-o", "--out-file", default="",
                   help="output PLY point cloud")
    p.add_argument("--save-viz", default="",
                   help="save a top-down PNG scatter of the point cloud")
    p.add_argument("-g", "--html-viewer", default="",
                   help="write a self-contained interactive WebGL viewer "
                        "(orbit camera + stereo mode, the reference's -g "
                        "GUI equivalent)")
    p.add_argument("--live-viewer", nargs="?", type=int, const=0,
                   default=None, metavar="PORT",
                   help="serve a live-updating WebGL viewer on localhost "
                        "while processing (the reference's per-frame GUI "
                        "thread, gui.cc:17-131; PORT omitted = auto)")
    p.add_argument("--poses-out", default="",
                   help="write per-frame 3x4 poses (KITTI format)")
    p.add_argument("--stats-json", default="",
                   help="write per-run stats JSON")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .config import (Bucketing, Calibration, EngineConfig, MonoParams,
                         StereoParams)
    from .models.sfm import StructureFromMotion
    from .utils.io import ImageSequenceLoader
    from .utils.ply import export_ply
    from .utils.timer import StartTimer

    calib = Calibration(f=args.focal, cu=args.cu, cv=args.cv)
    bucket = Bucketing(max_features=1000)  # main.cpp:71 disables bucketing
    params = MonoParams(calib=calib, height=args.height, pitch=args.pitch,
                        bucket=bucket)
    if args.stereo:
        video = ImageSequenceLoader(args.image_dir, suffix="_l")
        video_r = ImageSequenceLoader(args.image_dir, suffix="_r")
        stereo_params = StereoParams(calib=calib, base=args.base,
                                     bucket=bucket)
    else:
        video = ImageSequenceLoader(args.image_dir)
        video_r = None
        stereo_params = None
    n = args.n_frames or video.n_frames
    sfm = StructureFromMotion(params, dims=video.get_dims(), verbose=True,
                              stereo_params=stereo_params)

    if args.live_viewer is not None:
        from .utils.html_viewer import LiveViewer
        viewer = LiveViewer(port=args.live_viewer)
        print(f"Live viewer: {viewer.url}")
    else:
        from .utils.html_viewer import NullViewer
        viewer = NullViewer()

    poses = []
    timer = StartTimer("Total time", verbose=False)
    if args.stereo:
        frames_r = video_r.prefetch(n)
        for i, img in enumerate(video.prefetch(n)):
            print(f"Processing: Frame: {i}")
            sfm.update(img, next(frames_r))
            poses.append(sfm.get_pose().copy())
            viewer.update(sfm.get_points(), sfm.get_pose())
    else:
        for i, img in enumerate(video.prefetch(n)):
            print(f"Processing: Frame: {i}")
            sfm.update(img)
            poses.append(sfm.get_pose().copy())
            viewer.update(sfm.get_points(), sfm.get_pose())
    total = timer.end()
    viewer.close()
    fps = n / total
    print(f"FPS: {fps}")

    refined_stats = {}
    if args.refine_map:
        pts_r, valid_r, cam_tr, chi2 = sfm.refine_map(iters=8)
        n_ref = int(valid_r.sum())
        print(f"refine-map: BA over {n_ref} active tracks, "
              f"final chi2={chi2:.1f}")
        refined_stats = {"refined_tracks": n_ref, "ba_chi2": float(chi2)}
        if n_ref:
            # refined landmarks are in current-camera coords, like the
            # finished points the reconstruction emits
            import numpy as _np

            extra = pts_r[valid_r].astype(_np.float64)
            sfm.reconstruction._points.extend(list(extra))

    if args.out_file:
        export_ply(sfm.get_points(), args.out_file)
    if args.html_viewer:
        from .utils.html_viewer import export_html

        export_html(sfm.get_points(), args.html_viewer)
    if args.poses_out:
        with open(args.poses_out, "w") as fh:
            for T in poses:
                fh.write(" ".join(f"{x:.9e}" for x in T[:3].reshape(-1)) + "\n")
    if args.save_viz:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        pts = sfm.get_points()
        fig, ax = plt.subplots(figsize=(8, 8))
        if len(pts):
            ax.scatter(pts[:, 0], pts[:, 2], s=1, c=-pts[:, 1], cmap="viridis")
        ax.set_xlabel("x (m)")
        ax.set_ylabel("z (m)")
        ax.set_title(f"{len(pts)} points")
        fig.savefig(args.save_viz, dpi=120)
    if args.stats_json:
        with open(args.stats_json, "w") as fh:
            json.dump({"frames": n, "fps": fps,
                       "points": int(len(sfm.get_points())),
                       **refined_stats}, fh)
    print("Demo complete!")
    return 0


if __name__ == "__main__":
    sys.exit(main())
