"""Block geometry: per-frame jitter offsets and mirrored addressing.

BMFR hides 32x32 block seams by shifting the block grid every frame with a
fixed 16-entry offset table and mirroring reads that fall outside the image.
The constants below are copied verbatim from the reference device table
(``opencl/bmfr.cl:267-285``); the mirroring matches ``mirror``/``mirror2``
(``opencl/bmfr.cl:209-222``), which is numpy's "symmetric" pad mode.
"""

from __future__ import annotations

import numpy as np

#: Per-frame block-grid jitter offsets, indexed by ``frame % 16``
#: (opencl/bmfr.cl:267-285, applied at :314-316 and inverted at :718-722).
BLOCK_OFFSETS = np.array(
    [
        [-14, -14],
        [4, -6],
        [-8, 14],
        [8, 0],
        [-10, -8],
        [2, 12],
        [12, -12],
        [-10, 0],
        [12, 14],
        [-8, -16],
        [6, 6],
        [-2, -2],
        [6, -14],
        [-16, 12],
        [14, -4],
        [-6, 4],
    ],
    dtype=np.int32,
)

BLOCK_OFFSETS_COUNT = len(BLOCK_OFFSETS)  # 16


def mirror(index, size):
    """Mirror an out-of-bounds index back into [0, size).

    Matches opencl/bmfr.cl:209-216: ``-1 -> 0, -2 -> 1, size -> size-1``
    ("symmetric" reflection including the edge sample). Only valid when the
    index is less than one full ``size`` out of bounds, like the reference.

    Works on numpy arrays and python ints.
    """
    index = np.asarray(index)
    neg = np.abs(index) - 1
    over = 2 * size - index - 1
    out = np.where(index < 0, neg, np.where(index >= size, over, index))
    return out if out.ndim else out.item()


def frame_offset(frame: int) -> np.ndarray:
    """Block jitter offset (x, y) for a frame (opencl/bmfr.cl:315)."""
    return BLOCK_OFFSETS[frame % BLOCK_OFFSETS_COUNT]
