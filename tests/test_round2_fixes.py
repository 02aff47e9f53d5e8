"""Round-2 regression tests: solver dispatch, fenced bench timing,
small-block Pallas fitter, fidelity skip rows, reference discovery."""

import numpy as np
import pytest

import jax.numpy as jnp

from bmfr_tpu.config import BMFRConfig
from bmfr_tpu.ops.blockify import build_feature_blocks
from bmfr_tpu.ops.fitter import fit_blocks
from tests.conftest import to_chw


@pytest.fixture(scope="module")
def tiny_blocks(request):
    from bmfr_tpu.io.fixtures import synthetic_sequence

    cfg = BMFRConfig(image_width=64, image_height=48,
                     position_limit_squared=0.03, normal_limit_squared=0.5,
                     fitter_impl="xla").validate()
    sc = synthetic_sequence(width=64, height=48, frames=1, seed=3)
    tmp = build_feature_blocks(
        cfg, jnp.asarray(to_chw(sc["normals"][0])),
        jnp.asarray(to_chw(sc["positions"][0])),
        jnp.asarray(to_chw(sc["noisy"][0])), jnp.int32(0))
    return cfg, tmp


class TestSolverDispatch:
    """cfg.solver must win over the backend choice (VERDICT weak #1: the
    round-1 'cholesky' fidelity rows were byte-identical to Householder
    because the Pallas kernel was dispatched before the solver check)."""

    def test_cholesky_differs_from_householder(self, tiny_blocks):
        cfg, tmp = tiny_blocks
        w_h, _ = fit_blocks(cfg, tmp, jnp.int32(0))
        w_c, _ = fit_blocks(cfg.replace(solver="cholesky"), tmp, jnp.int32(0))
        # same least-squares solution mathematically...
        np.testing.assert_allclose(np.asarray(w_c), np.asarray(w_h),
                                   rtol=0, atol=5e-2)
        # ...but not bit-identical (different factorization path actually ran)
        assert np.abs(np.asarray(w_c) - np.asarray(w_h)).max() > 0

    def test_cholesky_never_reaches_pallas(self, tiny_blocks, monkeypatch):
        cfg, tmp = tiny_blocks
        import bmfr_tpu.ops.fitter_pallas as fp

        def boom(*a, **k):
            raise AssertionError("pallas kernel must not run for cholesky")

        monkeypatch.setattr(fp, "fit_blocks_pallas", boom)
        w, _ = fit_blocks(cfg.replace(solver="cholesky", fitter_impl="auto"),
                          tmp, jnp.int32(0))
        assert np.isfinite(np.asarray(w)).all()

    def test_explicit_pallas_cholesky_raises(self, tiny_blocks):
        cfg, tmp = tiny_blocks
        with pytest.raises(ValueError, match="not implemented by the Pallas"):
            fit_blocks(cfg.replace(solver="cholesky", fitter_impl="pallas"),
                       tmp, jnp.int32(0))


class TestFencedTiming:
    def test_timed_force_returns_readback_checksum(self):
        from bmfr_tpu.profiling import timed_force

        x = jnp.arange(12.0).reshape(3, 4)
        secs, out, checksum = timed_force(lambda a: a * 2.0, x)
        assert secs >= 0.0
        # the checksum IS the device->host readback (the fence)
        assert checksum == float(jnp.sum(out))

    def test_bench_times_through_the_fence(self):
        """The benchmark of record must not time via block_until_ready
        (which may no-op on this stack — docs/PERF_NOTES.md)."""
        import inspect

        import bench

        src = inspect.getsource(bench.main)
        assert "timed_force" in src
        timing_loop = src.split("reps = ")[1]
        assert "block_until_ready" not in timing_loop


class TestSmallBlockFitter:
    @pytest.mark.parametrize("block_edge", [8, 16, 32])
    def test_pallas_fitter_matches_xla_for_any_block_edge(self, block_edge):
        """block_pixels=64 (edge 8) is below the 128-lane export width the
        round-1 kernel assumed (ADVICE low #4); interpret-mode must agree
        with the XLA path for every supported edge."""
        from bmfr_tpu.io.fixtures import synthetic_sequence
        from bmfr_tpu.ops.fitter_pallas import fit_blocks_pallas

        cfg = BMFRConfig(image_width=64, image_height=48,
                         position_limit_squared=0.03,
                         normal_limit_squared=0.5,
                         block_edge=block_edge).validate()
        sc = synthetic_sequence(width=64, height=48, frames=1, seed=5)
        tmp = build_feature_blocks(
            cfg, jnp.asarray(to_chw(sc["normals"][0])),
            jnp.asarray(to_chw(sc["positions"][0])),
            jnp.asarray(to_chw(sc["noisy"][0])), jnp.int32(0))
        w_xla, mm_xla = fit_blocks(cfg, tmp, jnp.int32(0), impl="xla")
        w_pal, mm_pal = fit_blocks_pallas(cfg, tmp, jnp.int32(0))
        np.testing.assert_allclose(np.asarray(mm_pal), np.asarray(mm_xla),
                                   rtol=1e-6, atol=1e-6)
        # (block_edge=8 gives 64x13 systems — markedly worse conditioned
        # than the default 1024x13, so summation-order noise is larger)
        np.testing.assert_allclose(np.asarray(w_pal), np.asarray(w_xla),
                                   rtol=2e-3, atol=1e-3)


class TestFidelityHarness:
    def test_sweep_skips_scene_without_reference(self):
        from bmfr_tpu.fidelity import print_report, run_sweep
        from bmfr_tpu.io.fixtures import synthetic_sequence

        sc = synthetic_sequence(width=64, height=48, frames=2, seed=0)
        scene = {k: v for k, v in sc.items()
                 if k not in ("clean", "clean_aa")}
        base = BMFRConfig(image_width=64, image_height=48,
                          position_limit_squared=0.03,
                          normal_limit_squared=0.5)
        rows = run_sweep({"noref": scene}, base)
        assert len(rows) == 1 and rows[0]["skipped"]
        print_report(rows)  # must not raise on skipped rows

    def test_sweep_against_opencl_pngs_only(self):
        """A scene with only reference-output PNGs (no clean EXRs) still
        produces the vs-OpenCL PSNR column."""
        from bmfr_tpu.fidelity import run_sweep
        from bmfr_tpu.io.fixtures import synthetic_sequence

        sc = synthetic_sequence(width=64, height=48, frames=2, seed=1)
        clean_tone = np.clip(
            np.power(np.maximum(0.0, sc.pop("clean")), 0.454545), 0, 1)
        sc.pop("clean_aa", None)
        sc["opencl"] = clean_tone  # stand-in for decoded output PNGs
        base = BMFRConfig(image_width=64, image_height=48,
                          position_limit_squared=0.03,
                          normal_limit_squared=0.5)
        cfgs = {"default": base}
        rows = run_sweep({"s": sc}, base, configs=cfgs)
        assert rows[0]["opencl_psnr_mean"] > 15.0
        assert "psnr_mean" not in rows[0]


class TestReferenceDiscovery:
    def test_load_references_finds_exr_and_png(self, tmp_path):
        from bmfr_tpu.io import native
        if not native.available():
            pytest.skip("native IO library not built")
        from bmfr_tpu.io.dataset import SceneDescriptor

        r = np.random.RandomState(0)
        clean = r.rand(2, 16, 24, 3).astype(np.float32)
        png = (r.rand(2, 16, 24, 3) * 255).astype(np.uint8)
        (tmp_path / "outputs").mkdir()
        for t in range(2):
            native.write_exr(str(tmp_path / f"reference{t}.exr"), clean[t])
            native.write_png(str(tmp_path / "outputs" / f"output{t}.png"),
                             png[t])
        sd = SceneDescriptor(path=str(tmp_path), frame_count=2,
                             width=24, height=16)
        refs = sd.load_references()
        np.testing.assert_array_equal(refs["clean"], clean)
        np.testing.assert_allclose(refs["opencl"], png / 255.0, atol=1e-6)

    def test_load_references_empty_when_absent(self, tmp_path):
        from bmfr_tpu.io.dataset import SceneDescriptor

        sd = SceneDescriptor(path=str(tmp_path), frame_count=1)
        assert sd.load_references() == {}
