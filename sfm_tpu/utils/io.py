"""Image sequence loading with background prefetch.

Replaces the reference's ImageSequenceLoader (demo/image_sequence.hh:3-57):
``%04d.png`` / ``%06d.png`` grayscale frames from a directory. Decoding is
host work that must overlap device compute (SURVEY.md §2 hot-loop list), so
the loader prefetches on a worker thread into a bounded queue; a C++ native
decoder (sfm_tpu/native) is used when built, PIL otherwise.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional

import numpy as np


def _decode(path: str) -> np.ndarray:
    try:  # native decoder (sfm_tpu/native) releases the GIL for prefetch
        from .. import native as native_mod

        img = native_mod.decode_image(path)
        if img is not None:
            return img
    except Exception:
        pass
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), np.uint8)


class ImageSequenceLoader:
    """Indexed access to <dir>/<prefix><index:0Nd>[suffix].png grayscale
    frames. `suffix` (e.g. "_l"/"_r") selects one camera of a stereo pair
    stored side by side in the same directory."""

    PATTERNS = ("{:04d}.png", "{:06d}.png", "{:06d}.pgm", "{:04d}.pgm",
                "{:010d}.png")

    def __init__(self, directory: str, suffix: str = ""):
        self.dir = directory
        self.pattern = None
        for base in self.PATTERNS:
            stem, ext = base.rsplit(".", 1)
            pat = f"{stem}{suffix}.{ext}"
            if os.path.exists(os.path.join(directory, pat.format(0))):
                self.pattern = pat
                break
        if self.pattern is None:
            raise FileNotFoundError(
                f"no frame 0 found in {directory} (tried {self.PATTERNS})")
        first = self.get_frame(0)
        self.height, self.width = first.shape
        self._n = None

    @property
    def n_frames(self) -> int:
        if self._n is None:
            i = 0
            while os.path.exists(os.path.join(self.dir, self.pattern.format(i))):
                i += 1
            self._n = i
        return self._n

    def get_dims(self) -> tuple[int, int]:
        return (self.width, self.height)

    def get_frame(self, i: int) -> np.ndarray:
        return _decode(os.path.join(self.dir, self.pattern.format(i)))

    def prefetch(self, n_frames: Optional[int] = None,
                 depth: int = 4) -> Iterator[np.ndarray]:
        """Iterate frames with a background decode thread (double buffering
        the host->device boundary like the reference's async OpenCL queues,
        opencl_wrapper.hh:29)."""
        n = n_frames if n_frames is not None else self.n_frames
        q: queue.Queue = queue.Queue(maxsize=depth)

        def worker():
            for i in range(n):
                q.put(self.get_frame(i))
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item
