"""Oracle equivalence at a width that is NOT a multiple of the block edge.

The default image (1280) is an exact multiple of 32 horizontally, so the
main equivalence suite never exercises the horizontal workset rounding
(WORKSET_WIDTH, opencl/bmfr.cpp:107-108). 72x48 rounds both axes."""

import numpy as np
import jax.numpy as jnp

from bmfr_tpu import FrameInputs, TemporalState, denoise_frame
from bmfr_tpu.config import BMFRConfig
from bmfr_tpu.io.fixtures import synthetic_sequence
from bmfr_tpu.oracle import OracleState, oracle_denoise_frame


def test_oracle_equivalence_72x48():
    cfg = BMFRConfig(
        image_width=72, image_height=48,
        position_limit_squared=0.03, normal_limit_squared=0.5,
        fitter_impl="xla").validate()
    assert cfg.workset_width == 96 and cfg.blocks_x == 4

    sc = synthetic_sequence(width=72, height=48, frames=2, seed=9)
    o_state = OracleState.initial(48, 72)
    j_state = TemporalState.initial(cfg)
    to_chw = lambda a: jnp.asarray(np.moveaxis(a, -1, 0).astype(np.float32))

    for t in range(2):
        prev_cam = sc["camera_matrices"][max(t - 1, 0)]
        off = sc["pixel_offsets"][t]
        o_state, o = oracle_denoise_frame(
            cfg, o_state, sc["normals"][t], sc["positions"][t],
            sc["noisy"][t], sc["albedo"][t], prev_cam, off, t)
        inputs = FrameInputs(
            to_chw(sc["normals"][t]), to_chw(sc["positions"][t]),
            to_chw(sc["noisy"][t]), to_chw(sc["albedo"][t]))
        j_state, j = denoise_frame(
            cfg, j_state, inputs, jnp.asarray(prev_cam), jnp.asarray(off),
            jnp.int32(t))

        ok = o["accept"] == np.asarray(j["accept"])
        assert ok.mean() > 0.995
        np.testing.assert_allclose(
            np.asarray(j["weights"]), o["weights"], rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(j["filtered"]), 0, -1)[ok],
            o["filtered"][ok], rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(j["result"]), 0, -1)[ok],
            o["result"][ok], rtol=2e-3, atol=3e-3)
