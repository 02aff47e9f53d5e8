"""The vectorized oracle must reproduce the literal oracle exactly.

``oracle/reference_vec.py`` restates the literal per-pixel oracle as
dense NumPy so it can run at production resolution (the parity evidence
of scripts/parity_fullres.py). This suite transfers the literal
oracle's trust to the vectorized twin: every stage output of every
frame must agree on the tiny fixture to float32 round-off (the two
differ only in summation/association order of per-pixel-independent
f32 math).
"""

import numpy as np
import pytest

from bmfr_tpu.oracle import OracleState, oracle_denoise_frame
from bmfr_tpu.oracle.reference_vec import oracle_denoise_frame_vec


@pytest.fixture(scope="module")
def pair_traces(tiny_cfg, tiny_scene):
    cfg = tiny_cfg
    sc = tiny_scene
    T = sc["noisy"].shape[0]
    s_lit = OracleState.initial(cfg.image_height, cfg.image_width)
    s_vec = OracleState.initial(cfg.image_height, cfg.image_width)
    lit, vec = [], []
    for t in range(T):
        prev_cam = sc["camera_matrices"][t - 1 if t > 0 else 0]
        off = sc["pixel_offsets"][t]
        args = (sc["normals"][t], sc["positions"][t], sc["noisy"][t],
                sc["albedo"][t], prev_cam, off, t)
        s_lit, o_lit = oracle_denoise_frame(cfg, s_lit, *args)
        s_vec, o_vec = oracle_denoise_frame_vec(cfg, s_vec, *args)
        lit.append(o_lit)
        vec.append(o_vec)
    return lit, vec


@pytest.mark.parametrize("t", [0, 1, 2])
@pytest.mark.parametrize("key,tol", [
    ("accum", 1e-5), ("prev_pixels", 1e-3), ("tmp", 1e-5),
    ("weights", 2e-4), ("mins_maxs", 1e-6), ("filtered", 1e-4),
    ("out", 1e-4), ("tone", 1e-4), ("result", 1e-4),
])
def test_stage_matches_literal(pair_traces, t, key, tol):
    lit, vec = pair_traces
    np.testing.assert_allclose(vec[t][key], lit[t][key],
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("t", [0, 1, 2])
def test_masks_match_exactly(pair_traces, t):
    lit, vec = pair_traces
    # integer outputs must be identical, modulo borderline accept-bit
    # flips from f32 association differences (<0.5% of pixels)
    assert np.mean(lit[t]["accept"] != vec[t]["accept"]) < 5e-3
    assert np.mean(lit[t]["spp"] != vec[t]["spp"]) < 5e-3
