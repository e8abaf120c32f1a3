"""Pipeline state checkpoint/resume.

The reference has no persistence beyond a final PLY dump (SURVEY.md §5
"Checkpoint/resume: none"); long-running multi-sequence jobs need real
checkpointing. Saves the full SfM driver state — accumulated pose, VO ring
state flags, reconstruction track table + pose ring, finished points — as a
single .npz (portable, no framework lock-in).
"""

from __future__ import annotations

import numpy as np


def save_sfm(path: str, sfm) -> None:
    """Checkpoint a models.sfm.StructureFromMotion instance."""
    rec = sfm.reconstruction
    st = rec._state
    np.savez_compressed(
        path,
        tr_total=sfm.Tr_total,
        tr_delta=sfm.viso.Tr_delta,
        tr_valid=np.array(sfm.viso.Tr_valid),
        replace=np.array(sfm.replace),
        is_first=np.array(sfm.is_first_frame),
        frame_idx=np.array(sfm.frame_idx),
        points=rec.get_points(),
        K=rec.K,
        tr_cam_road=rec._tr_cam_road,
        recon_px_u=np.asarray(st.px_u),
        recon_px_v=np.asarray(st.px_v),
        recon_length=np.asarray(st.length),
        recon_last_idx=np.asarray(st.last_idx),
        recon_first_ago=np.asarray(st.first_ago),
        recon_active=np.asarray(st.active),
        recon_fwd=np.asarray(st.fwd),
    )


def load_sfm(path: str, sfm) -> None:
    """Restore state saved by save_sfm into a compatible instance."""
    import jax.numpy as jnp

    from ..models.reconstruction import ReconState

    z = np.load(path)
    sfm.Tr_total = z["tr_total"]
    sfm.viso.Tr_delta = z["tr_delta"]
    sfm.viso.Tr_valid = bool(z["tr_valid"])
    sfm.replace = bool(z["replace"])
    sfm.is_first_frame = bool(z["is_first"])
    sfm.frame_idx = int(z["frame_idx"])
    rec = sfm.reconstruction
    rec.K = z["K"]
    rec._tr_cam_road = z["tr_cam_road"]
    rec._points = [p for p in z["points"]]
    rec._state = ReconState(
        px_u=jnp.asarray(z["recon_px_u"]),
        px_v=jnp.asarray(z["recon_px_v"]),
        length=jnp.asarray(z["recon_length"]),
        last_idx=jnp.asarray(z["recon_last_idx"]),
        first_ago=jnp.asarray(z["recon_first_ago"]),
        active=jnp.asarray(z["recon_active"]),
        fwd=jnp.asarray(z["recon_fwd"]),
    )
