"""Unit tests for the core helpers: hash RNG, geometry, color, features."""

import numpy as np

from bmfr_tpu import color, features, geometry, rng
from bmfr_tpu.oracle import reference as oracle


def test_hash_rng_matches_scalar_oracle():
    # The jnp vectorized hash must agree with the independent scalar numpy
    # translation of opencl/bmfr.cl:162-171 bit-for-bit.
    seeds = np.array([0, 1, 2, 255, 1024, 13 * 1024, 2**31 - 1, 2**31,
                      2**32 - 1, 123456789], dtype=np.uint64)
    got = np.asarray(rng.hash_uniform(seeds.astype(np.uint32)))
    want = np.array([oracle._hash_random(int(s)) for s in seeds], np.float32)
    np.testing.assert_array_equal(got, want)
    assert (got >= 0).all() and (got <= 1).all()
    # Values should look uniform-ish, not constant
    assert got.std() > 0.1


def test_feature_noise_layout(tiny_cfg):
    noise = np.asarray(rng.feature_noise(
        frame_number=2, feature_count=tiny_cfg.feature_count,
        block_pixels=tiny_cfg.block_pixels,
        buffer_count=tiny_cfg.buffer_count,
        noise_amount=tiny_cfg.noise_amount))
    assert noise.shape == (10, 1024)
    # constant feature never gets noise (opencl/bmfr.cl:606,625-627)
    np.testing.assert_array_equal(noise[0], 0.0)
    assert np.abs(noise[1:]).max() <= tiny_cfg.noise_amount
    # matches scalar oracle noise
    want = oracle._noise_vector(3, 2, tiny_cfg)
    np.testing.assert_allclose(noise[3], want, rtol=0, atol=0)


def test_mirror_matches_reference_table():
    # opencl/bmfr.cl:209-216 examples
    assert geometry.mirror(-1, 10) == 0
    assert geometry.mirror(-2, 10) == 1
    assert geometry.mirror(0, 10) == 0
    assert geometry.mirror(9, 10) == 9
    assert geometry.mirror(10, 10) == 9
    assert geometry.mirror(12, 10) == 7
    idx = np.arange(-32, 96)
    m = geometry.mirror(idx, 64)
    assert (m >= 0).all() and (m < 64).all()
    # symmetric-pad equivalence (what blockify relies on)
    arr = np.arange(64)
    padded = np.pad(arr, (32, 32), mode="symmetric")
    np.testing.assert_array_equal(padded[idx + 32], arr[m])


def test_block_offsets_table():
    assert geometry.BLOCK_OFFSETS.shape == (16, 2)
    # spot values copied from opencl/bmfr.cl:268-284
    assert tuple(geometry.BLOCK_OFFSETS[0]) == (-14, -14)
    assert tuple(geometry.BLOCK_OFFSETS[6]) == (12, -12)
    assert tuple(geometry.BLOCK_OFFSETS[15]) == (-6, 4)
    assert geometry.BLOCK_OFFSETS.min() == -16
    assert geometry.BLOCK_OFFSETS.max() == 14


def test_ycocg_roundtrip():
    rng_np = np.random.RandomState(0)
    c = rng_np.rand(3, 5, 7).astype(np.float32)
    back = np.asarray(color.ycocg_to_rgb(color.rgb_to_ycocg(c)))
    np.testing.assert_allclose(back, c, atol=1e-6)
    # cross-check against oracle per-pixel transform
    one = c[:, 0, 0]
    np.testing.assert_allclose(
        np.asarray(color.rgb_to_ycocg(one.reshape(3, 1, 1))).ravel(),
        oracle._rgb_to_ycocg(one), atol=1e-6)


def test_feature_registry_default_basis(tiny_cfg):
    n = np.random.RandomState(1).rand(3, 4, 6).astype(np.float32)
    p = np.random.RandomState(2).rand(3, 4, 6).astype(np.float32)
    f = np.asarray(features.evaluate_features(tiny_cfg.all_features, n, p))
    assert f.shape == (10, 4, 6)
    np.testing.assert_allclose(f[0], 1.0)
    np.testing.assert_allclose(f[1], n[0], atol=0)
    np.testing.assert_allclose(f[4], p[0], atol=0)
    np.testing.assert_allclose(f[7], p[0] * p[0], atol=1e-7)


def test_config_derived_geometry():
    from bmfr_tpu.config import BMFRConfig

    cfg = BMFRConfig()  # 1280x720 defaults
    assert cfg.workset_width == 1280
    assert cfg.workset_height == 736
    assert cfg.workset_with_margins_width == 1312
    assert cfg.workset_with_margins_height == 768
    assert cfg.blocks_x == 41 and cfg.blocks_y == 24
    assert cfg.n_blocks == 984
    assert cfg.buffer_count == 13
    assert cfg.feature_count == 10


def test_corridor_scene_pipeline():
    """The corridor fixture (forward-dolly disocclusion flow) runs the
    full chain and denoises: PSNR over the noisy input improves."""
    import jax
    import jax.numpy as jnp

    from bmfr_tpu import BMFRConfig, FrameInputs
    from bmfr_tpu.io.fixtures import synthetic_sequence
    from bmfr_tpu.metrics import psnr
    from bmfr_tpu.pipeline.denoise import denoise_sequence

    sc = synthetic_sequence(width=96, height=64, frames=4,
                            scene="corridor")
    cfg = BMFRConfig(image_width=96, image_height=64,
                     position_limit_squared=0.03,
                     normal_limit_squared=0.5,
                     fitter_impl="xla").validate()
    to_tchw = lambda a: jnp.asarray(
        np.moveaxis(a, -1, 1).astype(np.float32))
    inputs = FrameInputs(
        to_tchw(sc["normals"]), to_tchw(sc["positions"]),
        to_tchw(sc["noisy"]), to_tchw(sc["albedo"]))
    out = np.asarray(jax.jit(
        lambda i, c, o: denoise_sequence(cfg, i, c, o))(
            inputs, jnp.asarray(sc["camera_matrices"]),
            jnp.asarray(sc["pixel_offsets"])))
    t = 3
    got = np.moveaxis(out[t], 0, -1)
    clean = np.clip(sc["clean"][t], 0, 1) ** (1 / 2.2)
    noisy_tone = np.clip(sc["noisy"][t] * sc["albedo"][t], 0, 1) ** (
        1 / 2.2)
    assert psnr(got, clean) > psnr(noisy_tone, clean) + 3.0
