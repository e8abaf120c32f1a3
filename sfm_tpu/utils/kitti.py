"""KITTI odometry dataset loading and the official error metric.

Loader for the KITTI odometry layout (sequences/NN/image_0, calib.txt,
poses/NN.txt) and the standard KITTI evaluation: average translation error
(%) and rotation error (deg/m) over subsequences of length 100..800 m —
the metric named by BASELINE.json ("seq 00 translation error % vs
reference"). Works on any (poses_gt, poses_est) pair, including the
synthetic sequences.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

LENGTHS = (100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)


@dataclass
class KittiSequence:
    image_dir_left: str
    image_dir_right: str | None
    f: float
    cu: float
    cv: float
    base: float
    poses_gt: np.ndarray | None  # [N, 4, 4] cam0->world

    def loaders(self):
        """(left, right) ImageSequenceLoaders over the sequence frames
        (right is None for mono sequences). One call away from eval:
        benchmarks/kitti_eval.py drives VO over these."""
        from .io import ImageSequenceLoader

        left = ImageSequenceLoader(self.image_dir_left)
        right = (ImageSequenceLoader(self.image_dir_right)
                 if self.image_dir_right else None)
        return left, right


def load_sequence(root: str, seq: str) -> KittiSequence:
    sdir = os.path.join(root, "sequences", seq)
    calib_path = os.path.join(sdir, "calib.txt")
    P0 = P1 = None
    with open(calib_path) as fh:
        for line in fh:
            key, _, rest = line.partition(":")
            vals = np.fromstring(rest, sep=" ")
            if key == "P0":
                P0 = vals.reshape(3, 4)
            elif key == "P1":
                P1 = vals.reshape(3, 4)
    f = float(P0[0, 0])
    cu = float(P0[0, 2])
    cv = float(P0[1, 2])
    base = float(-P1[0, 3] / P1[0, 0]) if P1 is not None else 0.54
    poses = None
    pose_file = os.path.join(root, "poses", f"{seq}.txt")
    if os.path.exists(pose_file):
        rows = np.loadtxt(pose_file).reshape(-1, 3, 4)
        poses = np.concatenate(
            [rows, np.tile(np.array([[[0.0, 0, 0, 1]]]), (len(rows), 1, 1))], 1)
    right = os.path.join(sdir, "image_1")
    return KittiSequence(
        image_dir_left=os.path.join(sdir, "image_0"),
        image_dir_right=right if os.path.isdir(right) else None,
        f=f, cu=cu, cv=cv, base=base, poses_gt=poses)


def _trajectory_distances(poses: np.ndarray) -> np.ndarray:
    d = np.zeros(len(poses))
    steps = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1)
    d[1:] = np.cumsum(steps)
    return d


def _rotation_error(R: np.ndarray) -> float:
    tr = np.trace(R)
    return float(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0)))


def kitti_errors(poses_gt: np.ndarray, poses_est: np.ndarray,
                 step: int = 10, lengths=LENGTHS):
    """Official KITTI metric. Poses are cam->world [N,4,4].

    Returns (t_err_percent, r_err_deg_per_m, per_segment list)."""
    n = min(len(poses_gt), len(poses_est))
    poses_gt = poses_gt[:n]
    poses_est = poses_est[:n]
    dist = _trajectory_distances(poses_gt)
    segs = []
    for first in range(0, n, step):
        for length in lengths:
            target = dist[first] + length
            last = int(np.searchsorted(dist, target))
            if last >= n:
                continue
            gt_rel = np.linalg.inv(poses_gt[first]) @ poses_gt[last]
            est_rel = np.linalg.inv(poses_est[first]) @ poses_est[last]
            err = np.linalg.inv(est_rel) @ gt_rel
            t_err = np.linalg.norm(err[:3, 3]) / length
            r_err = _rotation_error(err[:3, :3]) / length
            segs.append((first, length, t_err, r_err))
    if not segs:
        return float("nan"), float("nan"), []
    t = float(np.mean([s[2] for s in segs]) * 100.0)
    r = float(np.degrees(np.mean([s[3] for s in segs])))
    return t, r, segs


def ate_rmse(poses_gt: np.ndarray, poses_est: np.ndarray) -> float:
    """Absolute trajectory error RMSE on positions (no alignment)."""
    n = min(len(poses_gt), len(poses_est))
    d = poses_gt[:n, :3, 3] - poses_est[:n, :3, 3]
    return float(np.sqrt((d ** 2).sum(1).mean()))


def scale_align(poses_gt: np.ndarray, poses_est: np.ndarray) -> np.ndarray:
    """Apply the single least-squares scale factor to the estimated
    trajectory (standard practice for monocular evaluation, where global
    scale is unobservable up to the ground-plane prior)."""
    n = min(len(poses_gt), len(poses_est))
    g = poses_gt[:n, :3, 3]
    e = poses_est[:n, :3, 3]
    denom = float((e * e).sum())
    s = float((g * e).sum()) / denom if denom > 0 else 1.0
    out = poses_est.copy()
    out[:, :3, 3] *= s
    return out


def poses_from_motions(motions: list[np.ndarray]) -> np.ndarray:
    """Integrate per-frame Tr_delta (prev->cur) into cam->world poses,
    pose_k = pose_{k-1} @ inv(Tr_delta_k) (sfm.hh:57-58 convention)."""
    poses = [np.eye(4)]
    for tr in motions:
        poses.append(poses[-1] @ np.linalg.inv(tr))
    return np.stack(poses)
