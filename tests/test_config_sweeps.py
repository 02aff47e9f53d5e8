"""Config-axis sweeps (BASELINE configs 1/3/4): solvers, precision,
block sizes, feature sets — fast invariant + cross-solver tests (the full
oracle equivalence at the default config lives in test_pipeline_vs_oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bmfr_tpu.config import BMFRConfig
from bmfr_tpu.ops.blockify import blockify_planes, unblockify_planes
from bmfr_tpu.ops.fitter import fit_blocks


def _cfg(**kw):
    base = dict(image_width=64, image_height=48,
                position_limit_squared=0.03, normal_limit_squared=0.5,
                fitter_impl="xla")
    base.update(kw)
    return BMFRConfig(**base).validate()


def _blocks(cfg, seed=0):
    r = np.random.RandomState(seed)
    data = r.rand(cfg.n_blocks, cfg.buffer_count, cfg.block_pixels)
    data = data.astype(np.float32)
    data[:, cfg.features_not_scaled_count : cfg.feature_count] *= 5.0
    return jnp.asarray(data)


def test_householder_matches_f64_lstsq():
    """The QR path must agree with an independent f64 least-squares solve
    (the oracle suggested in SURVEY §7 step 2)."""
    cfg = _cfg()
    data = _blocks(cfg)
    w, mm = fit_blocks(cfg, data, jnp.int32(1))
    w = np.asarray(w)

    # reproduce scaling+noise in numpy, then lstsq in f64
    from bmfr_tpu.rng import feature_noise

    nd = np.asarray(data, np.float64).copy()
    lo, F = cfg.features_not_scaled_count, cfg.feature_count
    sub = nd[:, lo:F]
    mn = sub.min(-1, keepdims=True)
    mx = sub.max(-1, keepdims=True)
    den = np.where(np.abs(mx - mn) > 1.0, mx - mn, 1.0)
    nd[:, lo:F] = (sub - mn) / den
    noise = np.asarray(feature_noise(1, F, cfg.block_pixels,
                                     cfg.buffer_count, cfg.noise_amount))
    nd[:, :F] += noise[None]
    for g in range(cfg.n_blocks):
        A = nd[g, :F].T
        B = nd[g, F:].T
        ref, *_ = np.linalg.lstsq(A, B, rcond=None)
        np.testing.assert_allclose(w[g], ref, rtol=2e-2, atol=2e-3)


def test_cholesky_matches_householder():
    cfg_h = _cfg(solver="householder")
    cfg_c = _cfg(solver="cholesky")
    data = _blocks(cfg_h, seed=1)
    wh, mmh = fit_blocks(cfg_h, data, jnp.int32(0))
    wc, mmc = fit_blocks(cfg_c, data, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(mmc), np.asarray(mmh), atol=1e-6)
    np.testing.assert_allclose(np.asarray(wc), np.asarray(wh),
                               rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("dtype", ["float16", "bfloat16"])
def test_reduced_precision_storage(dtype):
    cfg = _cfg(tmp_data_dtype=dtype)
    cfg32 = _cfg()
    data = _blocks(cfg, seed=2)
    stored = data.astype(dtype)
    w, mm = fit_blocks(cfg, stored, jnp.int32(1))
    w32, _ = fit_blocks(cfg32, data, jnp.int32(1))
    assert np.isfinite(np.asarray(w)).all()
    # reduced precision stays in the same ballpark
    np.testing.assert_allclose(np.asarray(w), np.asarray(w32),
                               rtol=0.2, atol=0.2)


@pytest.mark.parametrize("block_edge", [16, 32, 64])
def test_blockify_roundtrip_block_sizes(block_edge):
    """BASELINE config 4: block-size sweep. unblockify(blockify(x)) == x on
    the image window for every frame jitter."""
    cfg = _cfg(image_width=128, image_height=64, block_edge=block_edge)
    r = np.random.RandomState(3)
    planes = jnp.asarray(r.rand(3, 64, 128).astype(np.float32))
    for frame in [0, 5, 13]:
        blocks = blockify_planes(cfg, planes, jnp.int32(frame))
        assert blocks.shape == (cfg.n_blocks, 3, cfg.block_pixels)
        back = unblockify_planes(cfg, blocks, jnp.int32(frame), 3)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(planes))


@pytest.mark.parametrize("features", [
    # first-order only (BASELINE config 1)
    (("const", "normal_x", "normal_y", "normal_z"),
     ("world_position_x", "world_position_y", "world_position_z")),
    # full second-order (default)
    (("const", "normal_x", "normal_y", "normal_z"),
     ("world_position_x", "world_position_y", "world_position_z",
      "world_position_x2", "world_position_y2", "world_position_z2")),
])
def test_feature_set_sweep_pipeline_runs(features):
    from bmfr_tpu import FrameInputs, TemporalState
    from bmfr_tpu.pipeline.denoise import denoise_frame
    from bmfr_tpu.io.fixtures import synthetic_sequence

    ns, s = features
    cfg = _cfg(features_not_scaled=ns, features_scaled=s)
    sc = synthetic_sequence(width=64, height=48, frames=2)
    state = TemporalState.initial(cfg)
    to_chw = lambda a: jnp.asarray(np.moveaxis(a, -1, 0).astype(np.float32))
    for t in range(2):
        inputs = FrameInputs(
            to_chw(sc["normals"][t]), to_chw(sc["positions"][t]),
            to_chw(sc["noisy"][t]), to_chw(sc["albedo"][t]))
        state, outs = denoise_frame(
            cfg, state, inputs, jnp.asarray(sc["camera_matrices"][max(t-1,0)]),
            jnp.asarray(sc["pixel_offsets"][t]), jnp.int32(t))
    res = np.asarray(outs["result"])
    assert np.isfinite(res).all()
    assert res.min() >= 0.0 and res.max() <= 1.0
    assert outs["weights"].shape == (cfg.n_blocks, cfg.feature_count, 3)


def test_block_size_16_pipeline_runs():
    from bmfr_tpu import FrameInputs, TemporalState
    from bmfr_tpu.pipeline.denoise import denoise_frame
    from bmfr_tpu.io.fixtures import synthetic_sequence

    cfg = _cfg(block_edge=16)
    sc = synthetic_sequence(width=64, height=48, frames=1)
    state = TemporalState.initial(cfg)
    to_chw = lambda a: jnp.asarray(np.moveaxis(a, -1, 0).astype(np.float32))
    inputs = FrameInputs(
        to_chw(sc["normals"][0]), to_chw(sc["positions"][0]),
        to_chw(sc["noisy"][0]), to_chw(sc["albedo"][0]))
    state, outs = denoise_frame(
        cfg, state, inputs, jnp.asarray(sc["camera_matrices"][0]),
        jnp.asarray(sc["pixel_offsets"][0]), jnp.int32(0))
    assert np.isfinite(np.asarray(outs["result"])).all()


def test_residual_bf16_taa_close_to_f32():
    """residual_dtype="bfloat16" runs the TAA AABB scan in bf16: the
    clamp bounds move by <= 1 bf16 ulp, so the sequence output must stay
    within a small bound of the f32 run (and differ only where the clamp
    engages)."""
    import jax
    from bmfr_tpu import FrameInputs
    from bmfr_tpu.pipeline.denoise import denoise_sequence
    from bmfr_tpu.io.fixtures import synthetic_sequence

    sc = synthetic_sequence(width=64, height=48, frames=4)
    to_tchw = lambda a: jnp.asarray(
        np.moveaxis(a, -1, 1).astype(np.float32))
    inputs = FrameInputs(
        to_tchw(sc["normals"]), to_tchw(sc["positions"]),
        to_tchw(sc["noisy"]), to_tchw(sc["albedo"]))
    cams = jnp.asarray(sc["camera_matrices"])
    offs = jnp.asarray(sc["pixel_offsets"])

    outs = {}
    for rd in ("float32", "bfloat16"):
        cfg = _cfg(residual_dtype=rd)
        outs[rd] = np.asarray(jax.jit(
            lambda i, c, o: denoise_sequence(cfg, i, c, o))(
                inputs, cams, offs))
    diff = np.abs(outs["float32"] - outs["bfloat16"])
    # bound: one bf16 ulp of the clamp bound, propagated through the
    # (1 - alpha) history weight — comfortably < 1e-2 in [0, 1] output
    assert np.isfinite(outs["bfloat16"]).all()
    assert float(diff.max()) < 1e-2, float(diff.max())
    # frame 0 is passthrough in TAA: bit-identical
    np.testing.assert_array_equal(outs["float32"][0], outs["bfloat16"][0])


def test_residual_dtype_validation():
    with pytest.raises(ValueError):
        _cfg(residual_dtype="float64")
