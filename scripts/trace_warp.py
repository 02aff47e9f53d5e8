"""Trace the composed warp path and print device ops by duration —
pinpoints where the milliseconds actually go (no amortization loops)."""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bmfr_tpu import xplane
    from bmfr_tpu.config import BMFRConfig
    from bmfr_tpu.io.fixtures import synthetic_sequence
    from bmfr_tpu.ops.gather import floor_int
    from bmfr_tpu.ops.reproject import reproject_coords
    from bmfr_tpu.ops.warp_pallas import warp_rows_pallas
    from bmfr_tpu.profiling import force, trace

    H, W, C = 720, 1280, 16
    cfg = BMFRConfig(image_width=W, image_height=H).validate()
    sc = synthetic_sequence(width=W, height=H, frames=6)
    pos = jnp.asarray(np.moveaxis(sc["positions"], -1, 1))
    cams = jnp.asarray(sc["camera_matrices"])
    offs = jnp.asarray(sc["pixel_offsets"])
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (C, H, W),
                                   dtype=np.int64).astype(np.int32))

    @jax.jit
    def field(p, c, o):
        pfx, pfy = reproject_coords(cfg, p, c, o)
        return floor_int(pfy), floor_int(pfx)

    iy, ix = field(pos[4], cams[3], offs[4])

    jfn = jax.jit(warp_rows_pallas)
    force(jfn(src, iy, ix))  # compile

    logdir = "/tmp/warp_trace"
    shutil.rmtree(logdir, ignore_errors=True)
    reps = 5
    with trace(logdir):
        for _ in range(reps):
            force(jfn(src, iy, ix))

    ops = xplane.device_op_durations(logdir)
    agg = {}
    for name, dur in ops:
        agg[name] = agg.get(name, 0.0) + dur / 1e9
    total = sum(agg.values())
    print(f"total device: {total/reps:.3f} ms/call over {reps} calls")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms/reps:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
