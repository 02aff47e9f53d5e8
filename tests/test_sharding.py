"""Multi-chip scale-out: scene-DP shard_map on the 8-device virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bmfr_tpu import FrameInputs, denoise_sequence
from bmfr_tpu.parallel import make_scene_mesh, denoise_scenes_sharded


@pytest.fixture(scope="module")
def cfg():
    from bmfr_tpu.config import BMFRConfig

    return BMFRConfig(
        image_width=64, image_height=48,
        position_limit_squared=0.03, normal_limit_squared=0.5,
        fitter_impl="xla").validate()


def _scene_batch(cfg, S, T, seed=0):
    r = np.random.RandomState(seed)
    H, W = cfg.image_height, cfg.image_width
    mk = lambda: jnp.asarray(r.rand(S, T, 3, H, W).astype(np.float32))
    inputs = FrameInputs(mk(), mk(), mk(), mk())
    cams = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (S, T, 4, 4))
    offs = jnp.zeros((S, T, 2), jnp.float32) + 0.5
    return inputs, cams, offs


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8, (
        "tests require the 8-device virtual CPU mesh (conftest)")


def test_sharded_matches_single_device(cfg):
    S, T = 8, 2
    inputs, cams, offs = _scene_batch(cfg, S, T)
    mesh = make_scene_mesh()
    with mesh:
        sharded = np.asarray(
            denoise_scenes_sharded(cfg, mesh, inputs, cams, offs))
    # single-device reference: plain vmap over scenes
    single = np.asarray(jax.vmap(
        lambda i, c, o: denoise_sequence(cfg, i, c, o))(inputs, cams, offs))
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-5)


def test_sharded_multi_scene_per_chip(cfg):
    # 16 scenes on 8 devices = 2 per chip
    S, T = 16, 1
    inputs, cams, offs = _scene_batch(cfg, S, T, seed=1)
    mesh = make_scene_mesh()
    with mesh:
        out = np.asarray(
            denoise_scenes_sharded(cfg, mesh, inputs, cams, offs))
    assert out.shape == (S, T, 3, cfg.image_height, cfg.image_width)
    assert np.isfinite(out).all()
