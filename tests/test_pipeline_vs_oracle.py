"""End-to-end and per-stage equivalence: JAX pipeline vs the literal oracle.

This is the core of the test strategy (SURVEY.md §4): the reference ships no
tests, so correctness is defined as agreement with a statement-by-statement
NumPy translation of opencl/bmfr.cl on a deterministic synthetic scene.

Bitwise equality is not expected (XLA reassociates/fuses f32 arithmetic;
the reference's own reduction trees already differ from any serial order) —
tolerances are tight enough to catch any semantic divergence (wrong masks,
wrong seeds, off-by-one jitter) while robust to last-bit drift. Borderline
accept-bit flips from fused-multiply-add differences are allowed on a tiny
fraction of pixels and the affected pixels are excluded from strict image
comparison.
"""

import numpy as np
import pytest

from bmfr_tpu import FrameInputs, TemporalState, denoise_frame
from bmfr_tpu.oracle import OracleState, oracle_denoise_frame
from tests.conftest import to_chw


@pytest.fixture(scope="module")
def traces(tiny_cfg, tiny_scene):
    """Run both implementations over 3 frames, collecting all intermediates."""
    cfg = tiny_cfg
    sc = tiny_scene
    T = sc["noisy"].shape[0]

    o_state = OracleState.initial(cfg.image_height, cfg.image_width)
    j_state = TemporalState.initial(cfg)
    o_frames, j_frames = [], []
    for t in range(T):
        prev_cam = sc["camera_matrices"][t - 1 if t > 0 else 0]
        off = sc["pixel_offsets"][t]
        o_state, o_out = oracle_denoise_frame(
            cfg, o_state, sc["normals"][t], sc["positions"][t],
            sc["noisy"][t], sc["albedo"][t], prev_cam, off, t)
        inputs = FrameInputs(
            normals=to_chw(sc["normals"][t]),
            positions=to_chw(sc["positions"][t]),
            noisy=to_chw(sc["noisy"][t]),
            albedo=to_chw(sc["albedo"][t]),
        )
        j_state, j_out = denoise_frame(
            cfg, j_state, inputs, prev_cam, off, t)
        o_frames.append(o_out)
        j_frames.append({k: np.asarray(v) for k, v in j_out.items()})
    return o_frames, j_frames


def _hwc(chw):
    return np.moveaxis(chw, 0, -1)


def _accept_mismatch(o, j):
    return np.mean(o["accept"] != j["accept"])


def test_frame0_accumulation_is_passthrough(traces):
    o, j = traces
    np.testing.assert_array_equal(j[0]["accept"], 0)
    np.testing.assert_array_equal(np.asarray(j[0]["spp"]), 1)
    np.testing.assert_allclose(_hwc(j[0]["accum"]), o[0]["accum"], atol=1e-6)


@pytest.mark.parametrize("t", [0, 1, 2])
def test_accumulate_noisy_matches_oracle(traces, t):
    o, j = traces
    o_t, j_t = o[t], j[t]
    # accept bits: allow rare FMA-borderline flips
    mismatch = _accept_mismatch(o_t, j_t)
    assert mismatch < 0.005, f"accept bitmask mismatch rate {mismatch}"
    ok = o_t["accept"] == j_t["accept"]
    np.testing.assert_allclose(
        _hwc(j_t["accum"])[ok], o_t["accum"][ok], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(j_t["spp"])[ok], o_t["spp"][ok])
    np.testing.assert_allclose(
        np.moveaxis(j_t["prev_pixels"], 0, -1)[ok],
        o_t["prev_pixels"][ok], rtol=1e-4, atol=2e-3)


@pytest.mark.parametrize("t", [0, 1, 2])
def test_fitter_matches_oracle(traces, t, tiny_cfg):
    o, j = traces
    o_t, j_t = o[t], j[t]
    # mins/maxs are plain reductions — near-exact
    np.testing.assert_allclose(
        j_t["mins_maxs"], o_t["mins_maxs"], rtol=1e-5, atol=1e-5)
    # weights: QR in a different (batched) evaluation order; the solve is
    # well-conditioned thanks to the noise, so agreement is tight.
    np.testing.assert_allclose(
        j_t["weights"], o_t["weights"], rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("t", [0, 1, 2])
def test_filtered_image_matches_oracle(traces, t):
    o, j = traces
    got = _hwc(j[t]["filtered"])
    want = o[t]["filtered"]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("t", [0, 1, 2])
def test_second_accumulation_matches_oracle(traces, t):
    o, j = traces
    ok = o[t]["accept"] == np.asarray(j[t]["accept"])
    np.testing.assert_allclose(
        _hwc(j[t]["out"])[ok], o[t]["out"][ok], rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(
        _hwc(j[t]["tone"])[ok], o[t]["tone"][ok], rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("t", [0, 1, 2])
def test_taa_result_matches_oracle(traces, t):
    o, j = traces
    ok = o[t]["accept"] == np.asarray(j[t]["accept"])
    np.testing.assert_allclose(
        _hwc(j[t]["result"])[ok], o[t]["result"][ok], rtol=2e-3, atol=3e-3)


def test_temporal_history_actually_used(traces):
    """Sanity: frames 1-2 must have accumulated history (spp > 1 somewhere)
    and a meaningful share of accepted reprojections."""
    o, j = traces
    assert (np.asarray(j[1]["spp"]) > 1).mean() > 0.3
    assert (np.asarray(j[2]["spp"]) > 2).mean() > 0.2
    assert (np.asarray(j[1]["accept"]) > 0).mean() > 0.3
    # and some rejections exist too (discard tests are live)
    assert (np.asarray(j[1]["accept"]) == 0).mean() > 0.001


@pytest.mark.parametrize("t", [0, 1, 2])
def test_whole_image_psnr_vs_oracle(traces, t):
    """Unmasked whole-image bound (VERDICT weak #8): the per-pixel tests
    above exclude FMA-borderline accept flips; this bounds the *downstream*
    damage of any flipped bit over the entire frame — no exclusions."""
    from bmfr_tpu.metrics import psnr

    o, j = traces
    for key in ("result", "tone"):
        val = psnr(_hwc(j[t][key]), np.asarray(o[t][key], np.float32))
        assert val >= 60.0, f"frame {t} {key}: {val:.2f} dB vs oracle"


def test_tmp_blocks_match_oracle(tiny_cfg, tiny_scene):
    """The jittered/mirrored block layout must equal the oracle's literal
    margins-grid scatter (opencl/bmfr.cl:455-476) exactly."""
    from bmfr_tpu.ops.blockify import build_feature_blocks
    from bmfr_tpu.oracle.reference import accumulate_noisy_data

    cfg = tiny_cfg
    sc = tiny_scene
    t = 1
    o_state = OracleState.initial(cfg.image_height, cfg.image_width)
    # frame 0 to produce a state
    o_state, _ = oracle_denoise_frame(
        cfg, o_state, sc["normals"][0], sc["positions"][0], sc["noisy"][0],
        sc["albedo"][0], sc["camera_matrices"][0], sc["pixel_offsets"][0], 0)
    k1 = accumulate_noisy_data(
        cfg, o_state, sc["normals"][t], sc["positions"][t], sc["noisy"][t],
        sc["camera_matrices"][0], sc["pixel_offsets"][t], t)

    blocks = np.asarray(build_feature_blocks(
        cfg, to_chw(sc["normals"][t]), to_chw(sc["positions"][t]),
        to_chw(k1["accum"]), t))
    # identical layout & (nearly) identical values: the only difference is
    # the f32 evaluation of the accumulated color, tested above.
    np.testing.assert_allclose(blocks, k1["tmp"], rtol=1e-5, atol=1e-5)
