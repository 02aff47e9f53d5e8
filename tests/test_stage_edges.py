"""Edge-case tests for the temporal stages against the oracle kernels
directly (constructed inputs exercising branches the synthetic scene may
miss: partial accept masks, off-screen reprojection, spp saturation)."""

import numpy as np
import jax.numpy as jnp

from bmfr_tpu.oracle import reference as oracle
from bmfr_tpu.ops.accumulate import accumulate_filtered_data
from bmfr_tpu.ops.reproject import accumulate_noisy_data
from bmfr_tpu.ops.taa import taa
from bmfr_tpu.oracle.reference import OracleState


def _cfg():
    from bmfr_tpu.config import BMFRConfig

    return BMFRConfig(image_width=32, image_height=16,
                      position_limit_squared=0.05,
                      normal_limit_squared=0.5,
                      fitter_impl="xla").validate()


def _chw(a):
    return jnp.asarray(np.moveaxis(a, -1, 0).astype(np.float32))


def test_k4_partial_accept_bits_match_oracle():
    cfg = _cfg()
    H, W = 16, 32
    r = np.random.RandomState(0)
    filtered = r.rand(H, W, 3).astype(np.float32)
    albedo = r.rand(H, W, 3).astype(np.float32)
    prev_out = r.rand(H, W, 3).astype(np.float32)
    spp = r.randint(1, 255, (H, W)).astype(np.uint8)
    accept = r.randint(0, 16, (H, W)).astype(np.uint8)  # all bit patterns
    prev_pixels = np.stack([
        r.uniform(-2, W + 1, (H, W)), r.uniform(-2, H + 1, (H, W))],
        axis=-1).astype(np.float32)
    # keep taps addressable (accept bits imply in-bounds in real data)
    prev_pixels[..., 0] = np.clip(prev_pixels[..., 0], 0, W - 2)
    prev_pixels[..., 1] = np.clip(prev_pixels[..., 1], 0, H - 2)

    state = OracleState.initial(H, W)
    state.prev_out = prev_out
    o_out, o_tone = oracle.accumulate_filtered_data(
        cfg, state, filtered, prev_pixels, accept, albedo, spp, frame=3)

    j_out, j_tone = accumulate_filtered_data(
        cfg, _chw(filtered), jnp.asarray(np.moveaxis(prev_pixels, -1, 0)),
        jnp.asarray(accept), _chw(albedo), jnp.asarray(spp),
        _chw(prev_out), jnp.int32(3))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(j_out), 0, -1), o_out, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(j_tone), 0, -1), o_tone, rtol=1e-4, atol=1e-5)


def test_k5_offscreen_and_edge_reprojection_match_oracle():
    cfg = _cfg()
    H, W = 16, 32
    r = np.random.RandomState(1)
    new_frame = r.rand(H, W, 3).astype(np.float32)
    prev_result = r.rand(H, W, 3).astype(np.float32)
    # coordinates spanning off-screen, the -1 edge, and interior
    prev_pixels = np.stack([
        r.uniform(-5, W + 4, (H, W)), r.uniform(-5, H + 4, (H, W))],
        axis=-1).astype(np.float32)

    state = OracleState.initial(H, W)
    state.prev_result = prev_result
    want = oracle.taa(cfg, state, prev_pixels, new_frame, frame=2)

    got = taa(cfg, jnp.asarray(np.moveaxis(prev_pixels, -1, 0)),
              _chw(new_frame), _chw(prev_result), jnp.int32(2))
    got = np.moveaxis(np.asarray(got), 0, -1)
    # the only permitted difference: oracle divides 0/0 -> NaN for
    # degenerate zero-weight edges; we return the blend with zero history
    mask = np.isfinite(want).all(axis=-1)
    assert mask.mean() > 0.95
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-5, atol=1e-5)


def test_k1_spp_saturation_and_cap():
    """spp accumulates to the 255 cap (opencl/bmfr.cl:432-442)."""
    cfg = _cfg()
    H, W = 16, 32
    normals = np.tile(np.array([0, 1, 0], np.float32), (H, W, 1))
    positions = np.zeros((H, W, 3), np.float32)
    positions[..., 0] = np.linspace(0, 1, W)[None, :]
    positions[..., 2] = np.linspace(0, 1, H)[:, None]
    noisy = np.full((H, W, 3), 0.5, np.float32)
    # identity-ish camera: reproject onto itself
    cam = np.eye(4, dtype=np.float32)
    # uv = (x/w+1)/2*W with col dots -> construct cam so taps stay onscreen:
    # easier: frame numbers high + prev state with spp near the cap
    prev_spp = np.full((H, W), 254, np.uint8)

    out = accumulate_noisy_data(
        cfg, _chw(normals), _chw(positions), _chw(noisy),
        _chw(normals), _chw(positions), _chw(noisy),
        jnp.asarray(prev_spp), jnp.asarray(cam),
        jnp.asarray([0.5, 0.5], jnp.float32), jnp.int32(5))
    spp = np.asarray(out["spp"])
    accepted = np.asarray(out["accept"]) > 0
    if accepted.any():
        assert spp[accepted].max() == 255
    assert (spp >= 1).all()
