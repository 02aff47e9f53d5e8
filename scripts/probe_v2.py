"""On-chip measurements that decide the v2 warp kernel design:

  A. XLA gather + scatter cost vs index count (the fix-up path budget).
  B. v1 warp: plan-only vs plan+kernel split on a covered (pure-pan)
     field — validates the select-layer cost model.
  C. Mosaic: dynamic (traced) sublane roll — compiles? correct? cost?
  D. Per-pixel coverage statistics for the v2 tile geometry on the
     synthetic scene's real fields (numpy, decides fix-up K).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def force(x):
    return jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(
            lambda t: float(jnp.sum(jnp.abs(t.astype(jnp.float32)))), x))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    force(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_small_gather():
    print("== A. gather/scatter vs K (C=16 i32 src 720x1280) ==")
    rng = np.random.default_rng(0)
    C, H, W = 16, 720, 1280
    src = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (C, H, W),
                                   dtype=np.int64).astype(np.int32))
    dst = jnp.zeros((2, C, H, W), jnp.int32)
    for K in (1024, 8192, 32768, 131072):
        flat = jnp.asarray(rng.integers(0, H * W, (K,), dtype=np.int64)
                           .astype(np.int32))
        iy, ix = flat // W, flat % W

        def g(src, iy, ix):
            return src[:, iy, ix]                      # [C, K]

        def s(dst, flat, vals):
            return dst.reshape(2, C, H * W).at[:, :, flat].set(
                vals).reshape(2, C, H, W)

        tg = timeit(jax.jit(g), src, iy, ix)
        vals = jnp.zeros((2, C, K), jnp.int32)
        ts = timeit(jax.jit(s), dst, flat, vals)
        print(f"  K={K:6d}: gather {tg*1e3:7.3f} ms   scatter {ts*1e3:7.3f} ms")


def bench_v1_split():
    print("== B. v1 plan vs kernel (pure pan, covered) ==")
    from bmfr_tpu.ops.warp_pallas import _plan, warp_rows_pallas

    rng = np.random.default_rng(1)
    C, H, W = 16, 720, 1280
    src = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (C, H, W),
                                   dtype=np.int64).astype(np.int32))
    iy = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None],
                          (H, W)) + 3
    ix = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :],
                          (H, W)) - 2
    plan_fn = jax.jit(lambda s, a, b: _plan(s, a, b, 16, 16, 16))
    tp = timeit(plan_fn, src, iy, ix)
    cov = bool(plan_fn(src, iy, ix).covered)
    tk = timeit(jax.jit(warp_rows_pallas), src, iy, ix)
    print(f"  plan: {tp*1e3:.3f} ms   plan+kernel: {tk*1e3:.3f} ms  "
          f"covered={cov}")


def bench_dyn_roll():
    print("== C. dynamic sublane roll in Mosaic ==")
    C, R, W = 4, 48, 512

    def kern(shift_ref, x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], shift=shift_ref[0], axis=1)

    @jax.jit
    def run(shift, x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((C, R, W), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(shift, x)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(-100, 100, (C, R, W), dtype=np.int64)
                    .astype(np.int32))
    try:
        out = run(jnp.asarray([5], jnp.int32), x)
        ok = bool(jnp.all(out == jnp.roll(x, 5, axis=1)))
        t = timeit(run, jnp.asarray([5], jnp.int32), x)
        print(f"  sublane dyn roll: compiles, correct={ok}, {t*1e3:.3f} ms")
    except Exception as e:
        print(f"  sublane dyn roll FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}")


def coverage_stats():
    print("== D. per-pixel v2 coverage on synthetic fields ==")
    from bmfr_tpu.config import BMFRConfig
    from bmfr_tpu.io.fixtures import synthetic_sequence
    from bmfr_tpu.ops.gather import floor_int
    from bmfr_tpu.ops.reproject import reproject_coords

    H, W = 720, 1280
    cfg = BMFRConfig(image_width=W, image_height=H).validate()
    sc = synthetic_sequence(width=W, height=H, frames=8)
    pos = jnp.asarray(np.moveaxis(sc["positions"], -1, 1))
    cams = jnp.asarray(sc["camera_matrices"])
    offs = jnp.asarray(sc["pixel_offsets"])

    TH, TW_T = 16, 256
    for ksy, ksx in ((16, 16), (24, 24)):
        tot_uncov = []
        for t in range(1, 8):
            pfx, pfy = reproject_coords(cfg, pos[t], cams[t - 1], offs[t])
            iy = np.asarray(floor_int(pfy))
            ix = np.asarray(floor_int(pfx))
            valid = (iy >= -1) & (iy <= H - 1) & (ix >= -1) & (ix <= W - 1)
            iy0 = np.clip(iy, 0, H - 1)
            iy1 = np.clip(iy + 1, 0, H - 1)
            ixc = np.clip(ix, 0, W - 1)
            uncov = np.zeros((H, W), bool)
            for y0 in range(0, H, TH):
                for x0 in range(0, W, TW_T):
                    sy = slice(y0, min(y0 + TH, H))
                    sx = slice(x0, min(x0 + TW_T, W))
                    v = valid[sy, sx]
                    if not v.any():
                        continue
                    ry = min(iy0[sy, sx][v].min(), iy1[sy, sx][v].min())
                    rx = ixc[sy, sx][v].min()
                    # window miss
                    miss = v & ((iy1[sy, sx] - ry > ksy)
                                | (ixc[sy, sx] - rx > ksx))
                    # scatter conflict within rows (row-then-col resolve)
                    conf = np.zeros_like(v)
                    for r in range(sy.stop - sy.start):
                        cols = ixc[y0 + r, sx]
                        rows_ = iy0[y0 + r, sx]
                        vv = v[r]
                        for dup in range(len(cols)):
                            pass  # vectorized below
                        order = np.argsort(cols, kind="stable")
                        cs, rs, vs = cols[order], rows_[order], vv[order]
                        # mark all pixels whose source column is claimed by
                        # a different row by any other valid pixel
                        for grp_start in np.flatnonzero(
                                np.r_[True, cs[1:] != cs[:-1]]):
                            pass
                        # simpler: per column value, min/max row disagree
                        uniq, inv = np.unique(cs, return_inverse=True)
                        rmin = np.full(len(uniq), 10**9)
                        rmax = np.full(len(uniq), -1)
                        np.minimum.at(rmin, inv[vs], rs[vs])
                        np.maximum.at(rmax, inv[vs], rs[vs])
                        bad_col = rmin != rmax
                        conf[r][order] = vs & bad_col[inv]
                    uncov[sy, sx] = miss | conf
            tot_uncov.append(int(uncov.sum()))
        print(f"  ksy={ksy} ksx={ksx}: uncovered px/frame = {tot_uncov}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "a"):
        bench_small_gather()
    if which in ("all", "b"):
        bench_v1_split()
    if which in ("all", "c"):
        bench_dyn_roll()
    if which in ("all", "d"):
        coverage_stats()
