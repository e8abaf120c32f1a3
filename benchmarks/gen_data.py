"""Generate the shared synthetic benchmark sequence (KITTI-shaped) as PGM
files for both the reference C++ benchmark and the TPU engine."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DATA = os.path.join(os.path.dirname(__file__), "data")


def write_pgm(path, img):
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())


def main(n_frames=50):
    from sfm_tpu.utils.synthetic import SceneConfig, make_sequence

    os.makedirs(DATA, exist_ok=True)
    cfg = SceneConfig()  # 1241x376, f=645.2, cu=635.9, cv=194.1
    left, right, poses = make_sequence(n_frames, cfg, step=0.8, baseline=0.571)
    for i in range(n_frames):
        write_pgm(os.path.join(DATA, f"{i:06d}.pgm"), left[i])
        write_pgm(os.path.join(DATA, f"{i:06d}_l.pgm"), left[i])
        write_pgm(os.path.join(DATA, f"{i:06d}_r.pgm"), right[i])
    np.save(os.path.join(DATA, "poses.npy"), np.stack(poses))
    with open(os.path.join(DATA, "meta.txt"), "w") as f:
        f.write(f"n={n_frames} w={cfg.width} h={cfg.height} f={cfg.f} "
                f"cu={cfg.cu} cv={cfg.cv} base=0.571 step=0.8\n")
    print(f"wrote {n_frames} frames to {DATA}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)
