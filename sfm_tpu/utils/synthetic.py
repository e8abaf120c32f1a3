"""Synthetic calibrated image sequences with ground-truth poses.

The reference's integration tests are MATLAB demos run by eye on the
Karlsruhe dataset (SURVEY.md §4); no dataset ships with either repo. This
module renders a deterministic textured 3-D world (ground plane + side walls
+ far wall) from a moving camera so sequence-level tests can assert
trajectory error against ground truth, and the bench harness has
KITTI-shaped input (1241x376, f=645.2, cu=635.9, cv=194.1 — the demo
calibration from matlab/demo_viso_stereo.m:7-12).

Pure NumPy ray-casting; not part of the TPU compute path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class SceneConfig:
    width: int = 1241
    height: int = 376
    f: float = 645.2
    cu: float = 635.9
    cv: float = 194.1
    cam_height: float = 1.6      # meters above ground
    cam_pitch: float = -0.08     # rad (matches reconstruction road model)
    wall_dist: float = 8.0       # side walls at x = +-wall_dist
    far_dist: float = 60.0       # far wall
    texture_size: int = 2048
    texture_scale: float = 6.0   # texture px per meter
    seed: int = 7


def _texture(n: int, seed: int) -> np.ndarray:
    """Multi-octave value noise with enough high-frequency detail for
    blob/checkerboard features."""
    rng = np.random.RandomState(seed)
    tex = np.zeros((n, n), np.float64)
    for octave, amp in ((8, 1.0), (32, 0.8), (128, 0.7), (512, 0.5)):
        g = rng.rand(octave, octave)
        reps = n // octave
        up = np.kron(g, np.ones((reps, reps)))
        tex += amp * up
    # sprinkle hard-edged blocks (corner features)
    for _ in range(n // 2):
        y, x = rng.randint(0, n - 12, 2)
        s = rng.randint(3, 12)
        tex[y:y + s, x:x + s] += rng.randn() * 0.8
    tex -= tex.min()
    tex /= tex.max()
    return (tex * 220 + 20).astype(np.float32)


def _bilinear(tex: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    n = tex.shape[0]
    u = np.mod(u, n - 1.0)
    v = np.mod(v, n - 1.0)
    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)
    fu = u - u0
    fv = v - v0
    u1 = np.minimum(u0 + 1, n - 1)
    v1 = np.minimum(v0 + 1, n - 1)
    return (tex[v0, u0] * (1 - fu) * (1 - fv) + tex[v0, u1] * fu * (1 - fv)
            + tex[v1, u0] * (1 - fu) * fv + tex[v1, u1] * fu * fv)


class SyntheticWorld:
    """Render grayscale frames from arbitrary camera poses.

    Camera convention matches the reference: x right, y down, z forward.
    Pose T maps world -> camera: x_cam = R x_world + t.
    """

    def __init__(self, cfg: SceneConfig = SceneConfig()):
        self.cfg = cfg
        self.tex = _texture(cfg.texture_size, cfg.seed)
        c = cfg
        # plane list: (normal n, offset d) with n.x = d for points on plane,
        # plus texture-uv basis
        self.planes = [
            # ground: y = cam_height (below camera, y down)
            (np.array([0.0, 1.0, 0.0]), c.cam_height,
             np.array([1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0])),
            # left wall: x = -wall_dist
            (np.array([1.0, 0.0, 0.0]), -c.wall_dist,
             np.array([0.0, 0.0, 1.0]), np.array([0.0, 1.0, 0.0])),
            # right wall: x = +wall_dist
            (np.array([1.0, 0.0, 0.0]), c.wall_dist,
             np.array([0.0, 0.0, 1.0]), np.array([0.0, 1.0, 0.0])),
        ]

    def render(self, T_wc: np.ndarray) -> np.ndarray:
        """T_wc: 4x4 world->camera. Returns uint8 [H, W] frame."""
        c = self.cfg
        R = T_wc[:3, :3]
        t = T_wc[:3, 3]
        cam_center = -R.T @ t  # camera position in world

        us, vs = np.meshgrid(np.arange(c.width), np.arange(c.height))
        d_cam = np.stack([(us - c.cu) / c.f, (vs - c.cv) / c.f,
                          np.ones_like(us, np.float64)], axis=-1)
        d_world = d_cam @ R  # R^T applied to each ray

        img = np.zeros((c.height, c.width), np.float32)
        depth = np.full((c.height, c.width), np.inf)
        for n, d0, e1, e2 in self.planes:
            denom = d_world @ n
            tnum = d0 - cam_center @ n
            with np.errstate(divide="ignore", invalid="ignore"):
                thit = tnum / denom
            ok = (thit > 0.1) & np.isfinite(thit)
            thit_safe = np.where(ok, thit, 1.0)
            pts = cam_center[None, None, :] + thit_safe[..., None] * d_world
            zc = thit_safe  # parametric distance (monotone with depth)
            uu = (pts @ e1) * c.texture_scale
            vv = (pts @ e2) * c.texture_scale
            val = _bilinear(self.tex, uu, vv)
            closer = ok & (zc < depth)
            img = np.where(closer, val, img)
            depth = np.where(closer, zc, depth)
        # distance haze keeps far texture from aliasing into fake features
        img = np.where(np.isfinite(depth), img, 90.0)
        return np.clip(img, 0, 255).astype(np.uint8)


def straight_motion_poses(n_frames: int, step: float = 0.8,
                          yaw_rate: float = 0.0) -> list[np.ndarray]:
    """World->camera poses for forward motion (+z) with optional yaw."""
    poses = []
    pos = np.zeros(3)
    yaw = 0.0
    for i in range(n_frames):
        cy, sy = np.cos(yaw), np.sin(yaw)
        Rwc = np.array([[cy, 0.0, -sy], [0.0, 1.0, 0.0], [sy, 0.0, cy]])
        T = np.eye(4)
        T[:3, :3] = Rwc
        T[:3, 3] = -Rwc @ pos
        poses.append(T)
        fwd = np.array([sy, 0.0, cy])
        pos = pos + step * fwd
        yaw += yaw_rate
    return poses


def make_sequence(n_frames: int, cfg: SceneConfig = SceneConfig(),
                  step: float = 0.8, yaw_rate: float = 0.0,
                  baseline: float = 0.0):
    """Returns (frames, poses) or (left, right, poses) when baseline > 0."""
    world = SyntheticWorld(cfg)
    poses = straight_motion_poses(n_frames, step, yaw_rate)
    left = [world.render(T) for T in poses]
    if baseline == 0.0:
        return left, poses
    right = []
    for T in poses:
        Tb = T.copy()
        Tb[0, 3] -= baseline  # right camera: x_cam shifted by -b... x_r = x_l - b
        right.append(world.render(Tb))
    return left, right, poses
