"""ASCII PLY point-cloud export (reference demo/ply_exporter.cc:3-34)."""

from __future__ import annotations

import numpy as np


def export_ply(points: np.ndarray, path: str):
    """points: [N, 3]. Writes the same ASCII PLY layout as the reference."""
    points = np.asarray(points).reshape(-1, 3)
    with open(path, "w") as fh:
        fh.write("ply\n")
        fh.write("format ascii 1.0\n")
        fh.write(f"element vertex {len(points)}\n")
        fh.write("property float x\n")
        fh.write("property float y\n")
        fh.write("property float z\n")
        fh.write("end_header\n")
        for x, y, z in points:
            fh.write(f"{x} {y} {z}\n")
