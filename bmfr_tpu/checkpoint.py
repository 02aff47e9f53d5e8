"""Checkpoint / resume for the temporal recurrence.

The reference has no checkpointing (SURVEY §5): its recurrent state lives
only in device buffers. Here the complete recurrent state is the
``TemporalState`` pytree plus the frame index, so mid-animation
checkpoint/resume is a trivial save/load — useful for long streamed runs
and for exactly reproducing a frame range without re-denoising the prefix.
"""

from __future__ import annotations

import numpy as np

from .pipeline.state import TemporalState


def save_state(path: str, state: TemporalState, frame: int):
    """Save the recurrent state + next frame index to an .npz file."""
    np.savez_compressed(
        path, frame=np.int64(frame),
        **{f: np.asarray(getattr(state, f)) for f in TemporalState._fields})


def load_state(path: str):
    """Load (TemporalState, next_frame) saved by :func:`save_state`."""
    import jax.numpy as jnp

    with np.load(path) as d:
        state = TemporalState(
            **{f: jnp.asarray(d[f]) for f in TemporalState._fields})
        return state, int(d["frame"])
