"""Headless visualization (replaces the reference's OpenGL viewer,
demo/gui.{hh,cc}, for environments without a display): top-down and 3-D
scatter of the point cloud plus the camera trajectory, rendered to PNG."""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_point_cloud(points: np.ndarray, path: str,
                     trajectory: np.ndarray | None = None,
                     title: str = ""):
    """Top-down (x-z) scatter colored by height, optional trajectory."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(9, 9))
    points = np.asarray(points).reshape(-1, 3)
    if len(points):
        ax.scatter(points[:, 0], points[:, 2], s=1.5, c=-points[:, 1],
                   cmap="viridis", alpha=0.7)
    if trajectory is not None and len(trajectory):
        t = np.asarray(trajectory)
        ax.plot(t[:, 0], t[:, 2], "r-", lw=1.5, label="trajectory")
        ax.legend()
    ax.set_xlabel("x (m)")
    ax.set_ylabel("z (m)")
    ax.set_aspect("equal")
    ax.set_title(title or f"{len(points)} points")
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)


def plot_trajectories(path: str, named_trajectories: dict[str, np.ndarray],
                      title: str = "trajectory (top-down)"):
    """Compare trajectories ([N,4,4] pose arrays or [N,3] positions)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 8))
    for name, tr in named_trajectories.items():
        tr = np.asarray(tr)
        pos = tr[:, :3, 3] if tr.ndim == 3 else tr
        ax.plot(pos[:, 0], pos[:, 2], lw=1.5, label=name)
    ax.set_xlabel("x (m)")
    ax.set_ylabel("z (m)")
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title(title)
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)
