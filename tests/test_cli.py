"""CLI smoke tests (CPU, tiny sizes)."""

import numpy as np
import pytest

from bmfr_tpu.cli import main


def test_cli_synthetic_frame_mode(tmp_path, capsys):
    rc = main(["--synthetic", "--width", "64", "--height", "48",
               "--frames", "2", "--output", str(tmp_path / "out")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PSNR vs clean reference" in out
    assert "Full frame" in out
    assert (tmp_path / "out" / "output0.png").exists()
    assert (tmp_path / "out" / "output1.png").exists()


def test_cli_stage_bypass_flags(tmp_path):
    rc = main(["--synthetic", "--width", "64", "--height", "48",
               "--frames", "1", "--no-output", "--skip-taa",
               "--skip-second-accum", "--solver", "cholesky"])
    assert rc == 0


def test_cli_rejects_bad_args():
    with pytest.raises(SystemExit):
        main(["--solver", "nonsense"])
    with pytest.raises(SystemExit):
        main(["--warp-mode", "nonsense"])


def test_fidelity_sweep_minimal(tmp_path):
    from bmfr_tpu.config import BMFRConfig
    from bmfr_tpu.fidelity import run_sweep, print_report
    from bmfr_tpu.io.fixtures import synthetic_sequence

    scenes = {"mini": synthetic_sequence(width=64, height=48, frames=2,
                                         aa_samples=2)}
    base = BMFRConfig(image_width=64, image_height=48,
                      position_limit_squared=0.03, normal_limit_squared=0.5,
                      fitter_impl="xla")
    rows = run_sweep(scenes, base, configs={"default": base})
    assert len(rows) == 1
    assert rows[0]["psnr_mean"] > rows[0]["noisy_psnr"]
    print_report(rows)
