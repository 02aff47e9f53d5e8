"""Pallas fitter kernel vs the XLA batched path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bmfr_tpu.ops.fitter import fit_blocks
from bmfr_tpu.ops.fitter_pallas import fit_blocks_pallas


@pytest.fixture(scope="module")
def block_data(tiny_cfg):
    r = np.random.RandomState(3)
    nb, B, bp = tiny_cfg.n_blocks, tiny_cfg.buffer_count, tiny_cfg.block_pixels
    data = r.rand(nb, B, bp).astype(np.float32)
    # make scaled features span > 1 so the conditional divide is exercised
    data[:, 4:10, :] *= 7.0
    data[:, 4:10, :] -= 2.0
    return jnp.asarray(data)


@pytest.mark.parametrize("frame", [0, 1, 7])
def test_pallas_matches_xla(tiny_cfg, block_data, frame):
    w_x, mm_x = fit_blocks(tiny_cfg, block_data, jnp.int32(frame), impl="xla")
    w_p, mm_p = fit_blocks_pallas(tiny_cfg, block_data, jnp.int32(frame))
    np.testing.assert_allclose(np.asarray(mm_p), np.asarray(mm_x),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_x),
                               rtol=2e-3, atol=2e-3)


def test_pallas_padding_path(tiny_cfg, block_data):
    # chunk that doesn't divide n_blocks exercises the pad+slice path
    w_p, mm_p = fit_blocks_pallas(tiny_cfg, block_data, jnp.int32(1), chunk=4)
    w_x, mm_x = fit_blocks(tiny_cfg, block_data, jnp.int32(1), impl="xla")
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_x),
                               rtol=2e-3, atol=2e-3)
