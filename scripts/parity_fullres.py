"""Production-resolution parity evidence: the JAX pipeline vs the
vectorized oracle at 1280x720 (VERDICT round-2 item 4).

The literal oracle (oracle/reference.py) restates opencl/bmfr.cl
statement by statement but only runs on tiny fixtures; its vectorized
twin (oracle/reference_vec.py) is pinned to it by tests/test_oracle_vec
and runs full frames in seconds. This script runs both the default
(exact f32 gather) and the flagship (fused Pallas, bf16 taps) pipeline
configurations over the synthetic orbit scene at full resolution and
reports whole-image PSNR vs the oracle per frame, writing
PARITY_FULLRES.json at the repo root.

Usage: python scripts/parity_fullres.py [--frames 4] [--modes float32,pallas]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def psnr(a, b, peak=1.0):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--modes", default="float32,pallas")
    p.add_argument("--scene", default="orbit",
                   choices=["orbit", "corridor", "swing"])
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PARITY_FULLRES.json"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bmfr_tpu.config import BMFRConfig
    from bmfr_tpu.io.fixtures import synthetic_sequence
    from bmfr_tpu.oracle.reference_vec import oracle_denoise_sequence_vec
    from bmfr_tpu.pipeline.denoise import FrameInputs, denoise_sequence

    H, W, T = args.height, args.width, args.frames
    sc = synthetic_sequence(width=W, height=H, frames=T,
                            scene=args.scene)
    frames = [dict(normals=sc["normals"][t], positions=sc["positions"][t],
                   noisy=sc["noisy"][t], albedo=sc["albedo"][t])
              for t in range(T)]

    base = BMFRConfig(image_width=W, image_height=H,
                      position_limit_squared=0.03,
                      normal_limit_squared=0.5).validate()

    print(f"[parity] vectorized oracle over {T} frames at {W}x{H}...",
          file=sys.stderr)
    t0 = time.time()
    oracle_outs = oracle_denoise_sequence_vec(
        base, frames, sc["camera_matrices"], sc["pixel_offsets"])
    print(f"[parity] oracle done in {time.time()-t0:.1f}s",
          file=sys.stderr)

    to_tchw = lambda a: jnp.asarray(
        np.moveaxis(a, -1, 1).astype(np.float32))
    inputs = FrameInputs(
        normals=to_tchw(sc["normals"]), positions=to_tchw(sc["positions"]),
        noisy=to_tchw(sc["noisy"]), albedo=to_tchw(sc["albedo"]))
    cams = jnp.asarray(sc["camera_matrices"])
    offs = jnp.asarray(sc["pixel_offsets"])

    record = dict(
        width=W, height=H, frames=T, backend=jax.default_backend(),
        scene=f"synthetic {args.scene} (io/fixtures.py)", modes={})
    for mode in args.modes.split(","):
        # "pallas_cholesky": the flagship path with the fused Gram/
        # Cholesky solver instead of reference-exact Householder — the
        # QR-vs-Cholesky decision record (VERDICT r3 #3); same least-
        # squares contract (opencl/bmfr.cl:549-656 is the means, the
        # solution is the contract)
        solver = "householder"
        warp = mode
        if mode == "pallas_cholesky":
            warp, solver = "pallas", "cholesky"
        cfg = base.replace(
            warp_mode=warp, solver=solver,
            fitter_impl="pallas_direct" if warp == "pallas" else "auto",
        ).validate()
        print(f"[parity] pipeline warp_mode={mode}...", file=sys.stderr)
        t0 = time.time()
        res = np.asarray(jax.jit(
            lambda i, c, o: denoise_sequence(cfg, i, c, o))(
                inputs, cams, offs))
        print(f"[parity] pipeline done in {time.time()-t0:.1f}s",
              file=sys.stderr)
        rows = []
        for t in range(T):
            got = np.moveaxis(res[t], 0, -1)
            want = oracle_outs[t]["result"]
            rows.append(dict(
                frame=t,
                psnr_vs_oracle=round(psnr(got, want), 2),
                max_abs=float(np.max(np.abs(got - want))),
            ))
            print(f"  mode={mode} frame {t}: "
                  f"PSNR {rows[-1]['psnr_vs_oracle']} dB  "
                  f"max|diff| {rows[-1]['max_abs']:.3e}")
        record["modes"][mode] = rows

    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"[parity] wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
