"""End-to-end CLI test (the reference's executable surface, main.cpp:94-127).

Renders a small synthetic drive to PNG frames, runs `sfm_tpu.cli` main()
in-process (mono and stereo), and asserts the full artifact surface: PLY
point cloud, KITTI-format poses, stats JSON, and the refine-map (windowed
BA) path."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from sfm_tpu.cli import main
from sfm_tpu.utils.synthetic import SceneConfig, make_sequence

W, H = 320, 160
SCENE = SceneConfig(width=W, height=H, f=166.0, cu=160.0, cv=80.0,
                    wall_dist=6.0)
N = 6


@pytest.fixture(scope="module")
def png_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_seq")
    left, right, poses = make_sequence(N, SCENE, step=0.5, baseline=0.5)
    mono = root / "mono"
    stereo = root / "stereo"
    mono.mkdir()
    stereo.mkdir()
    for i in range(N):
        Image.fromarray(left[i]).save(mono / f"{i:06d}.png")
        Image.fromarray(left[i]).save(stereo / f"{i:06d}_l.png")
        Image.fromarray(right[i]).save(stereo / f"{i:06d}_r.png")
    return str(mono), str(stereo)


def test_cli_mono_end_to_end(png_dirs, tmp_path):
    mono_dir, _ = png_dirs
    ply = tmp_path / "cloud.ply"
    posef = tmp_path / "poses.txt"
    stats = tmp_path / "stats.json"
    rc = main([mono_dir, "-f", "166", "-u", "160", "-v", "80",
               "--pitch", "0.0", "-n", str(N),
               "-o", str(ply), "--poses-out", str(posef),
               "--stats-json", str(stats)])
    assert rc == 0
    # poses: one KITTI 3x4 row per frame
    rows = np.loadtxt(posef)
    assert rows.shape == (N, 12)
    # trajectory moved forward (z grows along the drive)
    assert rows[-1, 11] > 0.5, rows[-1]
    st = json.load(open(stats))
    assert st["frames"] == N and st["fps"] > 0
    # PLY exists and parses: header + one vertex line per point
    txt = ply.read_text().splitlines()
    assert txt[0] == "ply"
    n_vert = int([l for l in txt if l.startswith("element vertex")][0]
                 .split()[-1])
    assert n_vert == st["points"]


def test_cli_stereo_with_refine_map(png_dirs, tmp_path):
    _, stereo_dir = png_dirs
    ply = tmp_path / "cloud.ply"
    stats = tmp_path / "stats.json"
    rc = main([stereo_dir, "-f", "166", "-u", "160", "-v", "80",
               "--pitch", "0.0", "-s", "-b", "0.5", "-n", str(N),
               "--refine-map", "-o", str(ply), "--stats-json", str(stats)])
    assert rc == 0
    st = json.load(open(stats))
    assert st["frames"] == N
    assert "ba_chi2" in st and np.isfinite(st["ba_chi2"])
    assert ply.exists()
