"""The temporal recurrence state of the pipeline.

The reference keeps six double-buffered device buffers swapped after every
frame (``Double_buffer`` at opencl/bmfr.cpp:122-135, the swap at :482-484).
In a functional JAX pipeline the "previous" halves become one pytree carried
through ``jax.lax.scan``; the "swap" is simply returning the new state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TemporalState(NamedTuple):
    """Previous-frame buffers read by the next frame.

    Mirrors the six double buffers (opencl/bmfr.cpp:345-347):
    normals/positions/noisy feed K1's reprojection tests and accumulation,
    spp the blend caps, out the second accumulation, result the TAA history.
    """

    normals: jnp.ndarray    # f32[3, H, W]
    positions: jnp.ndarray  # f32[3, H, W]
    noisy: jnp.ndarray      # f32[3, H, W] accumulated noisy color
    spp: jnp.ndarray        # u8[H, W]
    out: jnp.ndarray        # f32[3, H, W] accumulated filtered color
    result: jnp.ndarray     # f32[3, H, W] TAA history

    @classmethod
    def initial(cls, cfg, dtype=jnp.float32):
        H, W = cfg.image_height, cfg.image_width
        z3 = jnp.zeros((3, H, W), dtype)
        return cls(
            normals=z3, positions=z3, noisy=z3,
            spp=jnp.zeros((H, W), jnp.uint8),
            out=z3, result=z3,
        )
