"""Structure-from-motion pipeline driver.

Equivalent of the reference StructureFromMotion (viso/sfm.hh:7-83): owns a
VO estimator and a Reconstruction, accumulates the global pose
``Tr_total = Tr_total * inv(Tr_delta)``, and implements the replace-on-failure
keyframe policy (sfm.hh:70-76). The accelerated mono VO here is the TPU
program itself — there is no separate "CL" variant to select
(sfm.hh:30-43's GPU/FPGA dispatch collapses into the XLA backend).

Beyond the reference (whose SfM driver is mono-only): pass `stereo_params`
to run the metric-scale stereo VO frontend with the same mapping backend,
and call `refine_map()` for windowed bundle adjustment over the active
tracks + pose ring.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import (EngineConfig, MonoParams, ReconstructionParams,
                      StereoParams)
from ..ops.se3 import se3_inverse
from .mono import VisualOdometryMono
from .reconstruction import Reconstruction
from .stereo import VisualOdometryStereo


class StructureFromMotion:
    def __init__(self, params: MonoParams,
                 dims: tuple[int, int],
                 engine: Optional[EngineConfig] = None,
                 recon_params: Optional[ReconstructionParams] = None,
                 verbose: bool = False,
                 stereo_params: Optional[StereoParams] = None):
        self.e = engine or EngineConfig()
        if stereo_params is not None:
            self.viso = VisualOdometryStereo(stereo_params, self.e, dims)
            calib = stereo_params.calib
        else:
            self.viso = VisualOdometryMono(params, self.e, dims)
            calib = params.calib
        self.stereo = stereo_params is not None
        self.reconstruction = Reconstruction(
            recon_params or ReconstructionParams(), self.e)
        self.reconstruction.set_calibration(calib.f, calib.cu, calib.cv)
        self.replace = False
        self.is_first_frame = True
        self.Tr_total = np.eye(4)
        self.verbose = verbose
        self.frame_idx = 0

    def update(self, img, img_r=None) -> bool:
        """Process one frame (sfm.hh:46-77). Returns VO success."""
        if self.stereo:
            ok = self.viso.process(img, img_r, replace=self.replace)
        else:
            ok = self.viso.process(img, replace=self.replace)
        self.frame_idx += 1
        if self.is_first_frame:
            self.is_first_frame = False
            return True
        if ok:
            motion = np.linalg.inv(self.viso.get_motion())
            self.Tr_total = self.Tr_total @ motion
            if self.verbose:
                nm = self.viso.get_number_of_matches()
                ni = self.viso.get_number_of_inliers()
                print(f"Matches: {nm}, Inliers: "
                      f"{100.0 * ni / max(nm, 1):.1f}%, Current pose:")
                print(self.Tr_total)
            self.reconstruction.update(
                self.viso.get_matches(), self.viso.get_motion(),
                point_type=0, min_track_length=2, max_dist=30, min_angle=3)
            self.replace = False
        else:
            if self.verbose:
                print("No motion")
            self.replace = True
        return ok

    def get_points(self) -> np.ndarray:
        return self.reconstruction.get_points()

    def get_pose(self) -> np.ndarray:
        """First-frame camera -> current camera transform (sfm.hh:16-18)."""
        return self.Tr_total

    def refine_map(self, iters: int = 8, damping: float = 1e-3, mesh=None):
        """Windowed BA over active tracks + recent poses (capability beyond
        the reference; see Reconstruction.refine_map). Returns
        (points, point_valid, cam_tr, chi2)."""
        return self.reconstruction.refine_map(iters=iters, damping=damping,
                                              mesh=mesh)
