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


def _match_arrays(matches):
    """Accept a Matches table (fixed-capacity, masked) or a plain [N,8]
    array of (u1p v1p u1c v1c u2p v2p u2c v2c); return the dense rows."""
    if hasattr(matches, "valid"):
        sel = np.asarray(matches.valid)
        cols = [matches.u1p, matches.v1p, matches.u1c, matches.v1c,
                matches.u2p, matches.v2p, matches.u2c, matches.v2c]
        return np.stack([np.asarray(c)[sel] for c in cols], axis=1)
    return np.asarray(matches)


def plot_match(img: np.ndarray, matches, path: str, method: int = 2,
               inliers: np.ndarray | None = None, title: str = ""):
    """Match overlay on the image, equivalent of matlab/plotMatch.m:1-66.

    method 0 (flow): red line previous->current (outliers blue).
    method 1 (stereo): vertical tick at (u1c,v1c), colored red..green by
      disparity magnitude relative to the max inlier disparity.
    method 2 (quad): line (u1p,v1p)->(u2c,v2c) colored by disparity.
    `matches` may be a Matches table (only valid rows drawn) or an [N,8]
    array; `inliers` is a boolean mask over the drawn rows."""
    plt = _plt()
    p = _match_arrays(matches)
    n = len(p)
    if inliers is None:
        inl = np.ones(n, bool)
    else:
        inl = np.asarray(inliers, bool)
        if hasattr(matches, "valid"):
            inl = inl[np.asarray(matches.valid)]
    fig, ax = plt.subplots(
        figsize=(img.shape[1] / 100, img.shape[0] / 100))
    ax.imshow(np.asarray(img), cmap="gray", vmin=0, vmax=255)
    ax.set_axis_off()
    if n:
        if method == 0:
            for (u1p, v1p, u1c, v1c, *_), ok in zip(p, inl):
                col = (1, 0, 0) if ok else (0, 0, 1)
                ax.plot([u1p, u1c], [v1p, v1c], color=col, lw=0.8)
                ax.plot(u1c, v1c, "s", color=col, ms=2, mew=0.8,
                        fillstyle="none")
        else:
            # disparity coloring (plotMatch.m:27-65): red = near, green = far
            disp = p[:, 2] - p[:, 6]  # u1c - u2c
            if method == 1:
                disp = np.minimum(disp, 50)
            max_disp = float(disp[inl].max()) if inl.any() else 1.0
            for row, d, ok in zip(p, disp, inl):
                c = min(abs(d / (max_disp + 0.1)), 1.0)
                col = (c, 1 - c, 0) if ok else (0, 0, 1)
                if method == 1:
                    ax.plot([row[2], row[2]], [row[3], row[7]], color=col,
                            lw=1.4)
                    ax.plot(row[2], row[3], "s", color=col, ms=2, mew=1.0,
                            fillstyle="none")
                else:
                    ax.plot([row[0], row[6]], [row[1], row[7]], color=col,
                            lw=1.2)
                    ax.plot(row[6], row[7], "s", color=col, ms=2.5, mew=1.0,
                            fillstyle="none")
    if title:
        ax.set_title(title)
    fig.savefig(path, dpi=100, bbox_inches="tight", pad_inches=0)
    plt.close(fig)


def build_tracks(p_matched: list, i_matched: list,
                 min_length: int = 2, min_motion: float = 8.0) -> list:
    """Chain flow matches into feature tracks via feature indices, the
    matlab/plotTrack.m:10-39 walk: for each match in the LAST frame, follow
    i1p backwards through earlier frames' i1c.

    p_matched[j]: [N,4] (u1p v1p u1c v1c); i_matched[j]: [N,2] (i1p i1c).
    Returns a list of [L,2] point arrays ordered current->past."""
    tracks = []
    last = len(p_matched) - 1
    for i in range(len(p_matched[last])):
        ind = i
        pts = [p_matched[last][ind, 2:4], p_matched[last][ind, 0:2]]
        for j in range(last - 1, -1, -1):
            prev = np.nonzero(i_matched[j][:, 1] == i_matched[j + 1][ind, 0])[0]
            if not len(prev):
                break
            ind = int(prev[0])
            pts.append(p_matched[j][ind, 0:2])
        if len(pts) - 1 < min_length:
            continue
        track = np.stack(pts)
        if np.linalg.norm(track[0] - track[-1]) >= min_motion:
            tracks.append(track)
    return tracks


def plot_track(img: np.ndarray, p_matched: list, i_matched: list, path: str,
               min_motion: float = 8.0):
    """Track overlay on the last image, equivalent of matlab/plotTrack.m:
    each sufficiently-long, sufficiently-moving track drawn as a polyline
    colored by its motion direction (hue = atan2 of the current->past
    vector, plotTrack.m:36-38)."""
    from colorsys import hsv_to_rgb

    plt = _plt()
    fig, ax = plt.subplots(
        figsize=(img.shape[1] / 100, img.shape[0] / 100))
    ax.imshow(np.asarray(img), cmap="gray", vmin=0, vmax=255)
    ax.set_axis_off()
    tracks = build_tracks(p_matched, i_matched, min_motion=min_motion)
    for t in tracks:
        v = t[0] - t[-1]
        col = hsv_to_rgb((np.arctan2(v[1], v[0]) / (2 * np.pi) + 0.5) % 1.0,
                         1.0, 0.9)
        ax.plot(t[:, 0], t[:, 1], "-s", color=col, lw=0.8, ms=2, mew=0.6,
                fillstyle="none")
    fig.savefig(path, dpi=100, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return len(tracks)


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
