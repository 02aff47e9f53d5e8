"""Full pipeline under the packed bf16 warp vs the exact f32 warp.

The packed gather rounds history values to bf16; the pipeline output must
stay within the fidelity budget of the exact path, with only rare
accept-bit flips at geometry-test thresholds."""

import numpy as np
import jax.numpy as jnp

from bmfr_tpu import FrameInputs, denoise_sequence
from bmfr_tpu.io.fixtures import synthetic_sequence
from bmfr_tpu.metrics import psnr


def test_packed_warp_pipeline_close_to_exact(tiny_cfg):
    sc = synthetic_sequence(width=64, height=48, frames=4, seed=3)
    to_tchw = lambda a: jnp.asarray(np.moveaxis(a, -1, 1).astype(np.float32))
    seq = FrameInputs(to_tchw(sc["normals"]), to_tchw(sc["positions"]),
                      to_tchw(sc["noisy"]), to_tchw(sc["albedo"]))
    cams = jnp.asarray(sc["camera_matrices"])
    offs = jnp.asarray(sc["pixel_offsets"])

    exact = np.asarray(denoise_sequence(
        tiny_cfg.replace(warp_mode="float32"), seq, cams, offs))
    packed = np.asarray(denoise_sequence(
        tiny_cfg.replace(warp_mode="packed_x_bf16"), seq, cams, offs))

    for t in range(4):
        p = psnr(packed[t], exact[t])
        assert p > 45.0, f"frame {t}: packed-vs-exact PSNR {p:.1f} dB"
    # overwhelming majority of pixels are bit-identical decisions
    close = np.abs(packed - exact).max(axis=1) < 0.02
    assert close.mean() > 0.98
