"""Benchmark: full-resolution denoise throughput on the real TPU.

Measures the steady-state per-frame time of the complete 5-stage chain at
the reference workload shape — 1280x720, 1 spp, 60-frame animation
(opencl/bmfr.cpp:39-42) — with all inputs device-resident, mirroring the
reference's profiling scope ("in real use case there would not be
WriteBuffer and ReadBuffer", opencl/bmfr.cpp:415-416; total = first kernel
start to last kernel end, :497-502).

Prints ONE JSON line:
  {"metric": "denoise_ms_per_frame_1280x720", "value": <ms>, "unit": "ms",
   "vs_baseline": <baseline_ms / ours_ms>}
vs_baseline > 1.0 means faster than the 1.6 ms/frame reference target
(BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

BASELINE_MS = 1.6  # reference paper headline, BASELINE.md


def _init_backend_with_retry(attempts=3, backoff_s=60.0):
    """Initialize the JAX backend, retrying transient tunnel outages.

    The axon TPU tunnel in this environment has documented multi-minute
    wedges and outages (BENCH_r03 was lost to one: backend init raised
    UNAVAILABLE during the driver's capture). A bounded retry with
    backoff turns a transient outage into a delayed capture instead of
    an empty rc=1 artifact. On final failure we still print ONE JSON
    line naming the outage so the round's bench record is diagnostic,
    never empty. The reference's analogue is its always-on device-event
    profiling (opencl/bmfr.cpp:488-517) — a bench run must always
    produce a record.
    """
    import jax
    import jax.numpy as jnp

    last_err = None
    for attempt in range(1, attempts + 1):
        try:
            devs = jax.devices()
            # First device_put + tiny compute proves the device is
            # actually serving, not just enumerable.
            x = jax.device_put(np.ones((128, 128), np.float32))
            float(jnp.sum(x))
            print(f"[bench] backend up: {devs}", file=sys.stderr)
            return
        except Exception as e:  # noqa: BLE001 - init errors vary by stack
            last_err = e
            print(f"[bench] backend init attempt {attempt}/{attempts} "
                  f"failed: {type(e).__name__}: {e}", file=sys.stderr)
            if attempt < attempts:
                print(f"[bench] retrying in {backoff_s:.0f}s...",
                      file=sys.stderr)
                time.sleep(backoff_s)
    # Final failure: emit a diagnostic JSON line (never an empty record).
    print(json.dumps({
        "metric": "denoise_ms_per_frame_backend_unavailable",
        "value": -1.0,
        "unit": "ms",
        "vs_baseline": 0.0,
        "error": f"{type(last_err).__name__}: {last_err}"[:500],
    }))
    sys.exit(0)


def main():
    import jax
    import jax.numpy as jnp

    _init_backend_with_retry(
        attempts=int(os.environ.get("BENCH_INIT_ATTEMPTS", "3")),
        backoff_s=float(os.environ.get("BENCH_INIT_BACKOFF_S", "60")),
    )

    from bmfr_tpu import (BMFRConfig, FrameInputs, TemporalState,
                          denoise_sequence)
    from bmfr_tpu.io.fixtures import synthetic_sequence

    frames = int(os.environ.get("BENCH_FRAMES", "60"))
    width = int(os.environ.get("BENCH_WIDTH", "1280"))
    height = int(os.environ.get("BENCH_HEIGHT", "720"))

    cfg = BMFRConfig(
        image_width=width, image_height=height,
        position_limit_squared=0.03, normal_limit_squared=0.5,
        warp_mode=os.environ.get("BENCH_WARP_MODE", "pallas"),
        # the planes-direct fused fitter (v2: 2-D block-layout QR with
        # exact-f32 segment-roll reductions, feature build + K1 store +
        # scale + noise in-kernel) removes blockify's 52 MB transpose
        # entirely (docs/PERF_NOTES.md).
        fitter_impl=os.environ.get("BENCH_FITTER", "pallas_direct"),
        # headline solver: the fused Gram/Cholesky direct fitter — the
        # same least-squares solution as the reference's Householder QR
        # (opencl/bmfr.cl:549-699 is the means, the LS solution is the
        # contract; docs/DIVERGENCES.md records the swap), verified
        # == householder to ~1e-4 on hardware at full res and ~0.5 ms/
        # frame faster (PARITY_FULLRES.json pallas_cholesky rows,
        # FIDELITY_r5.json flagship_cholesky rows).
        solver=os.environ.get("BENCH_SOLVER", "cholesky"),
        # bf16 TAA residual promoted round 5: FIDELITY_r5.json
        # residual_bf16 rows are within 0.001 dB of float32 on all four
        # scene families (orbit-a/b, corridor, swing) — far under the
        # 0.05 dB promotion bar set in VERDICT r4 #4.
        residual_dtype=os.environ.get("BENCH_RESIDUAL", "bfloat16"),
        # tier-dispatch structure arbitration (config.py:warp_tier_impl):
        # "steady_cond" (default) measured 0.3 ms/frame faster than the
        # flat switch (branch-result copies); value-identical.
        warp_tier_impl=os.environ.get("BENCH_TIER", "steady_cond"),
    ).validate()

    # BENCH_SCENE=swing measures the teleport sequence (a hard camera
    # cut at frames//2 that breaks every reprojection test and engages
    # the whole-frame fallback tier — the reference must survive
    # arbitrary cuts at fixed cost, opencl/bmfr.cl:336-430).
    scene = os.environ.get("BENCH_SCENE", "orbit")
    print(f"[bench] generating {frames}-frame {width}x{height} synthetic "
          f"{scene} scene...", file=sys.stderr)
    sc = synthetic_sequence(width=width, height=height, frames=frames,
                            scene=scene)

    to_tchw = lambda a: jnp.asarray(
        np.moveaxis(a, -1, 1).astype(np.float32))
    inputs = FrameInputs(
        normals=to_tchw(sc["normals"]),
        positions=to_tchw(sc["positions"]),
        noisy=to_tchw(sc["noisy"]),
        albedo=to_tchw(sc["albedo"]),
    )
    cams = jnp.asarray(sc["camera_matrices"])
    offs = jnp.asarray(sc["pixel_offsets"])

    # The checksum is computed in-graph so the timing fence is a single
    # scalar fetch: timed_force's separate jnp.sum dispatch costs a full
    # ~25 ms tunnel round-trip on this stack — at 60 frames that's
    # ~0.4 ms/frame of pure measurement overhead (the reference times
    # device events only, opencl/bmfr.cpp:497-502).
    def _run(i, c, o):
        out, stats = denoise_sequence(cfg, i, c, o, return_stats=True)
        return out, stats, jnp.sum(out)

    run = jax.jit(_run)

    def timed(*args):
        t0 = time.perf_counter()
        out, stats, csum = run(*args)
        csum = float(csum)          # the scalar fetch is the fence
        return time.perf_counter() - t0, out, stats, csum

    print("[bench] compiling...", file=sys.stderr)
    t0 = time.perf_counter()
    secs, out, stats, _ = timed(inputs, cams, offs)
    print(f"[bench] compile+first run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    assert bool(jnp.isfinite(out).all()), "non-finite bench output"

    # Warp-tier engagement proof: which tier (kernel / fix-up / fallback)
    # actually served each frame (VERDICT r2 weak #3). Frame 0 has no
    # history (no warp); count frames 1..T-1.
    stats = np.asarray(stats)  # [T, 6]
    warped = stats[1:]
    n_px = width * height
    kernel_frames = int((warped[:, 5] > 0).sum())
    fallback_frames = int(warped[:, 1].sum())
    served_pct = float(warped[:, 5].sum()) / max(
        (frames - 1) * n_px, 1) * 100.0
    fixup_pct = float(
        np.where(warped[:, 1] == 0, warped[:, 0], 0).sum()) / max(
        (frames - 1) * n_px, 1) * 100.0
    print(f"[bench] warp tiers over {frames-1} warped frames: "
          f"kernel-tier frames={kernel_frames}, "
          f"fallback frames={fallback_frames}, "
          f"kernel-served pixels={served_pct:.3f}%, "
          f"fix-up pixels={fixup_pct:.4f}%", file=sys.stderr)
    print(f"[bench] mean tiles per depth phase (shallow->deep): "
          f"{[round(float(x), 1) for x in warped[:, 2:5].mean(axis=0)]}, "
          f"mean uncovered px {float(warped[:, 0].mean()):.0f}",
          file=sys.stderr)

    # Steady-state timing with the readback fence (block_until_ready may
    # no-op on this stack — docs/PERF_NOTES.md; the fence is the rendered
    # frame reaching the host, like the reference's event end timestamps).
    # Headline = MEDIAN of reps; spread (max-min) rides in the JSON so
    # per-change claims can be judged against run-to-run noise (VERDICT
    # r4 #6; the reference's own discipline is mean/min/max,
    # opencl/CLUtils/CLUtils.hpp:240-361).
    reps = int(os.environ.get("BENCH_REPS", "5"))
    times = []
    for _ in range(reps):
        secs, _out, _stats, checksum = timed(inputs, cams, offs)
        assert checksum == checksum, "NaN checksum"  # also keeps it live
        times.append(secs / frames * 1e3)
    ms = float(np.median(times))
    spread = max(times) - min(times)

    print(f"[bench] per-frame times (ms): "
          f"{[round(t, 3) for t in times]} "
          f"-> median {ms:.3f}, min {min(times):.3f}, "
          f"spread {spread:.3f}", file=sys.stderr)

    # Device-event scope, like the reference's CL profiling (bmfr.cpp:
    # 497-502): one traced run -> xplane busy span. The wall metric
    # above additionally carries this environment's ~25 ms per-dispatch
    # tunnel round-trip (~0.4 ms/frame at 60 frames), which the
    # reference's measurement scope never includes.
    device_ms = None
    try:
        import shutil

        from bmfr_tpu import xplane
        from bmfr_tpu.profiling import trace

        logdir = "/tmp/bench_trace"
        shutil.rmtree(logdir, ignore_errors=True)
        with trace(logdir):
            timed(inputs, cams, offs)
        busy, span = xplane.device_busy_span(logdir)
        device_ms = round(span / frames, 4)
        print(f"[bench] device span {device_ms} ms/frame "
              f"(busy {busy / frames:.3f})", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 - trace is best-effort
        print(f"[bench] device-span capture failed: {e}",
              file=sys.stderr)

    print(json.dumps({
        "metric": f"denoise_ms_per_frame_{width}x{height}",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 4),
        "spread_ms": round(spread, 4),
        "reps_ms": [round(t, 4) for t in times],
        "config": f"scene={scene} warp={cfg.warp_mode} "
                  f"fitter={cfg.fitter_impl} solver={cfg.solver} "
                  f"residual={cfg.residual_dtype} "
                  f"tier={cfg.warp_tier_impl}",
        "device_span_ms_per_frame": device_ms,
        "warp_kernel_served_pct": round(served_pct, 3),
        "warp_fallback_frames": fallback_frames,
    }))


if __name__ == "__main__":
    main()
