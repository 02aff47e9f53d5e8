"""Streaming pipeline + checkpoint/resume: must equal the monolithic scan."""

import numpy as np
import jax.numpy as jnp
import pytest

from bmfr_tpu import FrameInputs, TemporalState, denoise_sequence
from bmfr_tpu.checkpoint import load_state, save_state
from bmfr_tpu.io.fixtures import synthetic_sequence
from bmfr_tpu.pipeline.denoise import denoise_frame
from bmfr_tpu.pipeline.streaming import stream_scene, stream_scenes


@pytest.fixture(scope="module")
def scene_and_reference(tiny_cfg):
    sc = synthetic_sequence(width=64, height=48, frames=5, seed=2)
    to_tchw = lambda a: jnp.asarray(np.moveaxis(a, -1, 1).astype(np.float32))
    seq = FrameInputs(to_tchw(sc["normals"]), to_tchw(sc["positions"]),
                      to_tchw(sc["noisy"]), to_tchw(sc["albedo"]))
    ref = np.asarray(denoise_sequence(
        tiny_cfg, seq, jnp.asarray(sc["camera_matrices"]),
        jnp.asarray(sc["pixel_offsets"])))
    return sc, ref


def _loader(sc):
    def load(frames):
        return {k: sc[k][frames] for k in
                ("normals", "positions", "noisy", "albedo",
                 "camera_matrices", "pixel_offsets")}
    return load


def test_streaming_matches_monolithic(tiny_cfg, scene_and_reference):
    sc, ref = scene_and_reference
    out = stream_scene(tiny_cfg, loader=_loader(sc), frame_count=5,
                       chunk_frames=2)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_multi_scene_streaming(tiny_cfg, scene_and_reference):
    sc, ref = scene_and_reference

    class FakeScene:
        frame_count = 5

        def load_frames(self, frames):
            return _loader(sc)(frames)

    outs = stream_scenes(tiny_cfg, [FakeScene(), FakeScene()],
                         chunk_frames=3)
    assert len(outs) == 2
    for o in outs:
        np.testing.assert_allclose(o, ref, rtol=1e-5, atol=1e-5)


def test_multi_scene_streaming_uses_per_scene_limits(tiny_cfg,
                                                     scene_and_reference):
    """Each scene must be denoised with its own camera_matrices.h discard
    thresholds (the reference bakes them per scene, opencl/bmfr.cpp:226-227;
    ADVICE medium #2: round 1 applied the first scene's limits to all)."""
    sc, ref = scene_and_reference

    class FakeScene:
        frame_count = 5
        width, height = 64, 48

        def __init__(self, pos_lim):
            self.pos_lim = pos_lim

        def load_camera(self):
            return dict(position_limit_squared=self.pos_lim,
                        normal_limit_squared=0.5)

        def load_frames(self, frames):
            return _loader(sc)(frames)

    # scene A uses the reference limits -> matches ref; scene B uses a
    # drastically different limit -> must diverge (proves per-scene cfg)
    outs = stream_scenes(
        tiny_cfg, [FakeScene(0.03), FakeScene(1e-8)], chunk_frames=3)
    np.testing.assert_allclose(outs[0], ref, rtol=1e-5, atol=1e-5)
    assert np.abs(outs[1] - ref).max() > 1e-3


def test_checkpoint_resume(tiny_cfg, scene_and_reference, tmp_path):
    sc, ref = scene_and_reference
    cfg = tiny_cfg
    to_chw = lambda a: jnp.asarray(np.moveaxis(a, -1, 0).astype(np.float32))

    def step(state, t):
        inputs = FrameInputs(
            to_chw(sc["normals"][t]), to_chw(sc["positions"][t]),
            to_chw(sc["noisy"][t]), to_chw(sc["albedo"][t]))
        return denoise_frame(
            cfg, state, inputs,
            jnp.asarray(sc["camera_matrices"][max(t - 1, 0)]),
            jnp.asarray(sc["pixel_offsets"][t]), jnp.int32(t))

    state = TemporalState.initial(cfg)
    for t in range(3):
        state, outs = step(state, t)
    ckpt = str(tmp_path / "state.npz")
    save_state(ckpt, state, 3)

    resumed, t0 = load_state(ckpt)
    assert t0 == 3
    for t in range(t0, 5):
        resumed, outs = step(resumed, t)
    np.testing.assert_allclose(
        np.asarray(outs["result"]), ref[4], rtol=1e-5, atol=1e-5)
