"""Gather tap-engine modes: exact vs packed variants."""

import numpy as np
import jax.numpy as jnp
import pytest

from bmfr_tpu.ops.warp import gather_taps


@pytest.fixture(scope="module")
def data():
    r = np.random.RandomState(0)
    H, W, C = 48, 64, 16
    planes = jnp.asarray(r.rand(C, H, W).astype(np.float32) * 3 - 1)
    # indices covering interior + all edge cases incl. ix = -1 and y OOB
    iy = jnp.asarray(r.randint(-2, H + 1, size=(H, W)).astype(np.int32))
    ix = jnp.asarray(r.randint(-2, W + 1, size=(H, W)).astype(np.int32))
    return planes, iy, ix


def test_float32_mode_matches_manual(data):
    planes, iy, ix = data
    C, H, W = planes.shape
    taps = np.asarray(gather_taps(planes, iy, ix, mode="float32"))
    pn = np.asarray(planes)
    iyn, ixn = np.asarray(iy), np.asarray(ix)
    for t, (dx, dy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
        yc = np.clip(iyn + dy, 0, H - 1)
        xc = np.clip(ixn + dx, 0, W - 1)
        want = pn[:, yc, xc]
        np.testing.assert_array_equal(taps[t], want)


@pytest.mark.parametrize("mode", ["packed_bf16", "packed_x_bf16"])
def test_packed_modes_match_float32_on_valid_taps(data, mode):
    planes, iy, ix = data
    C, H, W = planes.shape
    exact = np.asarray(gather_taps(planes, iy, ix, mode="float32"))
    packed = np.asarray(gather_taps(planes, iy, ix, mode=mode))
    iyn, ixn = np.asarray(iy), np.asarray(ix)
    for t, (dx, dy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
        valid = ((iyn + dy >= 0) & (iyn + dy < H)
                 & (ixn + dx >= 0) & (ixn + dx < W))
        # bf16 rounding only, on valid taps
        np.testing.assert_allclose(
            packed[t][:, valid], exact[t][:, valid], rtol=8e-3, atol=8e-3)


def test_packed_x_edge_ix_minus_one():
    """ix=-1 with dx=1 is an in-bounds tap at x=0 (opencl/bmfr.cl:380-381
    accepts it); the packed-pair gather must return S[., 0] there."""
    C, H, W = 2, 8, 16
    planes = jnp.asarray(
        np.arange(C * H * W, dtype=np.float32).reshape(C, H, W))
    iy = jnp.zeros((H, W), jnp.int32)
    ix = jnp.full((H, W), -1, jnp.int32)
    taps = np.asarray(gather_taps(planes, iy, ix, mode="packed_x_bf16"))
    want = np.asarray(planes)[:, 0, 0]
    np.testing.assert_allclose(taps[1], np.broadcast_to(
        want[:, None, None], (C, H, W)), rtol=8e-3)
