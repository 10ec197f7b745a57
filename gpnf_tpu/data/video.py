"""Video frame-window utilities.

Reference: window_shift_input_video.py:2-68 (`index_generation`) — sliding
window of N frame indices centered on each frame with reflection padding at
clip boundaries, used by the video-SR pipelines (SURVEY.md §2.6).
"""
from __future__ import annotations

from typing import List

import numpy as np


def frame_window_indices(center: int, max_frame: int, n_frames: int,
                         padding: str = "reflection") -> List[int]:
    """Indices of the n_frames-window centered at `center` in [0, max_frame].

    padding: "reflection" mirrors out-of-range indices back into the clip;
    "replicate" clamps to the boundary; "circular" wraps.
    """
    assert n_frames % 2 == 1, "window must be odd-sized"
    half = n_frames // 2
    out = []
    for i in range(center - half, center + half + 1):
        if padding == "replicate":
            i = min(max(i, 0), max_frame)
        elif padding == "circular":
            i = i % (max_frame + 1)
        else:  # reflection
            if i < 0:
                i = -i
            elif i > max_frame:
                i = 2 * max_frame - i
        out.append(int(i))
    return out


def clip_windows(n_total: int, n_frames: int, padding: str = "reflection"):
    """(n_total, n_frames) index array: one window per center frame."""
    return np.stack([
        frame_window_indices(c, n_total - 1, n_frames, padding)
        for c in range(n_total)
    ])
