"""Long-sequence parity: lax.scan pipeline == per-frame stepping, across
the 16-entry jitter-table wraparound (frame 16+ reuses offsets,
opencl/bmfr.cl:315)."""

import numpy as np
import jax.numpy as jnp

from bmfr_tpu import FrameInputs, TemporalState, denoise_sequence
from bmfr_tpu.pipeline.denoise import denoise_frame
from bmfr_tpu.io.fixtures import synthetic_sequence


def test_scan_equals_per_frame_over_jitter_wrap(tiny_cfg):
    cfg = tiny_cfg
    T = 18  # crosses frame % 16 wraparound
    sc = synthetic_sequence(width=64, height=48, frames=T, seed=5)
    to_tchw = lambda a: jnp.asarray(np.moveaxis(a, -1, 1).astype(np.float32))
    seq = FrameInputs(to_tchw(sc["normals"]), to_tchw(sc["positions"]),
                      to_tchw(sc["noisy"]), to_tchw(sc["albedo"]))
    cams = jnp.asarray(sc["camera_matrices"])
    offs = jnp.asarray(sc["pixel_offsets"])

    scan_res = np.asarray(denoise_sequence(cfg, seq, cams, offs))

    state = TemporalState.initial(cfg)
    to_chw = lambda a: jnp.asarray(np.moveaxis(a, -1, 0).astype(np.float32))
    for t in range(T):
        inputs = FrameInputs(
            to_chw(sc["normals"][t]), to_chw(sc["positions"][t]),
            to_chw(sc["noisy"][t]), to_chw(sc["albedo"][t]))
        state, outs = denoise_frame(
            cfg, state, inputs,
            jnp.asarray(sc["camera_matrices"][max(t - 1, 0)]),
            jnp.asarray(sc["pixel_offsets"][t]), jnp.int32(t))
        np.testing.assert_allclose(
            np.asarray(outs["result"]), scan_res[t], rtol=1e-5, atol=1e-6,
            err_msg=f"frame {t} diverges between scan and per-frame paths")

    # sanity: later frames accumulate deep history
    assert (np.asarray(outs["spp"]) > 8).mean() > 0.2
