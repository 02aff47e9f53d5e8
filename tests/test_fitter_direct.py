"""Planes-direct fitter (ops/fitter_direct.py) vs the block-layout
paths: same scale/noise/QR semantics, no transpose."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmfr_tpu.ops.blockify import blockify_view, build_feature_blocks
from bmfr_tpu.ops.fitter import fit_blocks
from bmfr_tpu.ops.fitter_direct import fit_blocks_direct
from conftest import to_chw


def raw_view(cfg, normals, positions, accum, frame):
    return blockify_view(
        cfg, jnp.concatenate([normals, positions, accum], axis=0), frame)


@pytest.fixture(scope="module")
def frame_planes(tiny_scene):
    normals = jnp.asarray(to_chw(tiny_scene["normals"][1]))
    positions = jnp.asarray(to_chw(tiny_scene["positions"][1]))
    accum = jnp.asarray(to_chw(tiny_scene["noisy"][1]))
    return normals, positions, accum


@pytest.mark.parametrize("frame", [0, 1, 7])
def test_direct_matches_xla(tiny_cfg, frame_planes, frame):
    normals, positions, accum = frame_planes
    f = jnp.int32(frame)
    tmp = build_feature_blocks(tiny_cfg, normals, positions, accum, f)
    w_x, mm_x = fit_blocks(tiny_cfg, tmp, f, impl="xla")
    view = raw_view(tiny_cfg, normals, positions, accum, f)
    w_d, mm_d = fit_blocks_direct(tiny_cfg, view, f)
    np.testing.assert_allclose(np.asarray(mm_d), np.asarray(mm_x),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_d), np.asarray(w_x),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("dtype", ["float16", "bfloat16"])
def test_direct_reduced_precision(tiny_cfg, frame_planes, dtype):
    """The direct kernel must keep the per-reflection storage rounding."""
    cfg = tiny_cfg.replace(tmp_data_dtype=dtype).validate()
    normals, positions, accum = frame_planes
    f = jnp.int32(1)
    tmp = build_feature_blocks(cfg, normals, positions, accum, f)
    w_x, _ = fit_blocks(cfg, tmp, f, impl="xla")
    view = raw_view(cfg, normals, positions, accum, f)
    w_d, _ = fit_blocks_direct(cfg, view, f)
    np.testing.assert_allclose(np.asarray(w_d), np.asarray(w_x),
                               rtol=5e-3, atol=5e-3)


def test_pipeline_direct_matches_classic(tiny_cfg, tiny_scene):
    """Full sequence: fitter_impl='pallas_direct' (direct fit + image-
    space K3) vs the classic block-layout path."""
    from bmfr_tpu.pipeline.denoise import FrameInputs, denoise_sequence

    sc = tiny_scene
    inputs = FrameInputs(
        normals=jnp.asarray(np.stack([to_chw(x) for x in sc["normals"]])),
        positions=jnp.asarray(
            np.stack([to_chw(x) for x in sc["positions"]])),
        noisy=jnp.asarray(np.stack([to_chw(x) for x in sc["noisy"]])),
        albedo=jnp.asarray(np.stack([to_chw(x) for x in sc["albedo"]])),
    )
    cams = jnp.asarray(sc["camera_matrices"])
    offs = jnp.asarray(sc["pixel_offsets"])
    out_classic = denoise_sequence(
        tiny_cfg.replace(fitter_impl="xla").validate(), inputs, cams, offs)
    out_direct = denoise_sequence(
        tiny_cfg.replace(fitter_impl="pallas_direct").validate(),
        inputs, cams, offs)
    np.testing.assert_allclose(np.asarray(out_classic),
                               np.asarray(out_direct),
                               rtol=5e-4, atol=5e-4)


def test_config_rejects_unsupported_direct(tiny_cfg):
    with pytest.raises(ValueError):
        tiny_cfg.replace(fitter_impl="pallas_direct",
                         block_edge=16).validate()
    # cholesky + pallas_direct is a supported combination (_chol_kernel)
    tiny_cfg.replace(fitter_impl="pallas_direct",
                     solver="cholesky").validate()


@pytest.mark.parametrize("dtype", ["float32", "float16", "bfloat16"])
def test_fused_reconstruct_matches_weighted_sum_image(tiny_cfg,
                                                      frame_planes, dtype):
    """The fully fused K2+K3 kernel (in-VMEM back substitution +
    reconstruction) must match fit_blocks_direct + weighted_sum_image —
    including under reduced-precision tmp storage, where the reference's
    K3 recomputes features from the raw f32 buffers (bmfr.cl:724-729),
    NOT from the quantized store: the fused basis must be pre-quantize."""
    from bmfr_tpu.ops.blockify import jitter_offset
    from bmfr_tpu.ops.fitter_direct import fit_reconstruct_direct
    from bmfr_tpu.ops.weighted_sum import weighted_sum_image

    tiny_cfg = tiny_cfg.replace(tmp_data_dtype=dtype).validate()
    normals, positions, accum = frame_planes
    H, W = tiny_cfg.image_height, tiny_cfg.image_width
    for frame in (0, 1, 7):
        f = jnp.int32(frame)
        view = raw_view(tiny_cfg, normals, positions, accum, f)
        w_d, mm_d = fit_blocks_direct(tiny_cfg, view, f)
        want = weighted_sum_image(
            tiny_cfg, w_d, mm_d, normals, positions, accum, f)
        fview = fit_reconstruct_direct(tiny_cfg, view, f)
        half = tiny_cfg.block_edge // 2
        off = jitter_offset(f, tiny_cfg.block_edge)
        got = jax.lax.dynamic_slice(
            fview, (jnp.int32(0), half - off[1], half - off[0]),
            (3, H, W))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_fused_cholesky_matches_xla_cholesky(tiny_cfg, frame_planes):
    """The fused cholesky kernel (Gram via indicator matmuls, lane-
    parallel 13x13 Cholesky, in-VMEM reconstruction) must match the
    XLA solver="cholesky" path end to end (fit_blocks + 
    weighted_sum_image)."""
    from bmfr_tpu.ops.fitter_direct import fit_reconstruct_cholesky
    from bmfr_tpu.ops.blockify import jitter_offset
    from bmfr_tpu.ops.weighted_sum import weighted_sum_image

    cfg = tiny_cfg.replace(solver="cholesky").validate()
    normals, positions, accum = frame_planes
    H, W = cfg.image_height, cfg.image_width
    for frame in (0, 5):
        f = jnp.int32(frame)
        tmp = build_feature_blocks(cfg, normals, positions, accum, f)
        w_x, mm_x = fit_blocks(cfg, tmp, f, impl="xla")
        want = weighted_sum_image(
            cfg, w_x, mm_x, normals, positions, accum, f)
        view = raw_view(cfg, normals, positions, accum, f)
        fview = fit_reconstruct_cholesky(cfg, view, f)
        half = cfg.block_edge // 2
        off = jitter_offset(f, cfg.block_edge)
        got = jax.lax.dynamic_slice(
            fview, (jnp.int32(0), half - off[1], half - off[0]),
            (3, H, W))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("solver", ["householder", "cholesky"])
def test_origin_mode_matches_sliced_view(tiny_cfg, solver):
    """DMA-origin jitter (blockify_padded + jitter_origin — the
    pipeline's production contract, which never materializes the
    jittered view) must be bit-identical to the pre-sliced
    blockify_view path."""
    from bmfr_tpu.ops.blockify import blockify_padded, jitter_origin
    from bmfr_tpu.ops.fitter_direct import (DMA_SLACK, _pads_for_direct,
                                            fit_reconstruct_cholesky,
                                            fit_reconstruct_direct)

    # 480 wide -> blocks_x = 16 = one whole chunk, so the mirror pad
    # reaches the chunk width and the origin path engages (tiny 64x48
    # always degrades to the sliced-view fallback)
    cfg = tiny_cfg.replace(image_width=480, image_height=64,
                           solver=solver).validate()
    fit = (fit_reconstruct_cholesky if solver == "cholesky"
           else fit_reconstruct_direct)
    rng = np.random.default_rng(5)
    raw9 = jnp.asarray(rng.standard_normal(
        (9, cfg.image_height, cfg.image_width)).astype(np.float32))
    mw_pad = _pads_for_direct(cfg)[1]
    padded9, tw = blockify_padded(cfg, raw9, width=mw_pad,
                                  slack=DMA_SLACK)
    assert tw == mw_pad, (tw, mw_pad)
    for frame in (0, 3):
        f = jnp.int32(frame)
        view = blockify_view(cfg, raw9, f, width=mw_pad)
        want = fit(cfg, view, f)
        got = fit(cfg, padded9, f, origin=jitter_origin(cfg, f))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pipeline_direct_cholesky_runs(tiny_cfg, tiny_scene):
    """Full frame with fitter_impl=pallas_direct + solver=cholesky."""
    from bmfr_tpu import FrameInputs, TemporalState
    from bmfr_tpu.pipeline.denoise import denoise_frame

    cfg = tiny_cfg.replace(fitter_impl="pallas_direct",
                           solver="cholesky").validate()
    state = TemporalState.initial(cfg)
    for t in range(2):
        inputs = FrameInputs(
            jnp.asarray(to_chw(tiny_scene["normals"][t])),
            jnp.asarray(to_chw(tiny_scene["positions"][t])),
            jnp.asarray(to_chw(tiny_scene["noisy"][t])),
            jnp.asarray(to_chw(tiny_scene["albedo"][t])))
        state, outs = denoise_frame(
            cfg, state, inputs,
            jnp.asarray(tiny_scene["camera_matrices"][max(t - 1, 0)]),
            jnp.asarray(tiny_scene["pixel_offsets"][t]), jnp.int32(t))
    res = np.asarray(outs["result"])
    assert np.isfinite(res).all()
    assert res.min() >= 0.0 and res.max() <= 1.0
