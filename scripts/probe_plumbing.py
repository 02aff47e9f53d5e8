"""Microprobe: the scan-plumbing suspects behind the ~0.9 ms/frame
"unattributed" row of the round-3 device table (docs/PERF_NOTES.md).

Isolates and times, on the real TPU, each structure the 60-frame scan
adds AROUND the per-frame compute (none of these exist in the
reference's loop, which mutates persistent cl::Buffers in place,
opencl/bmfr.cpp:417-485):

  A. per-frame input unstack: x[t] dynamic-slice of [T,3,H,W] inside a
     scan body, vs feeding the same arrays through scan xs
  B. ys stacking: scan writing a [3,H,W] output per step
  C. the final [1+59] time-axis concatenate (frame-0 hoist rejoin)
  D. lax.switch with 4 branches returning [13,H,W] vs lax.cond with a
     precomputed operand vs no dispatch at all (the warp tier question
     at the structure level; config arbitration is BENCH_TIER)
  E. 9-plane mirror pad + 9-plane concat (the k2_blockify residue)

Each case is measured as a 60-iteration scan so per-step costs amortize
exactly like the pipeline's; the fence is a checksum fetch (this
stack's block_until_ready no-ops — docs/PERF_NOTES.md).

Run on the TPU: python scripts/probe_plumbing.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

T, C, H, W = 60, 3, 720, 1280


def timed(fn, *args, reps=3):
    out = fn(*args)          # compile
    csum = float(out if out.ndim == 0 else jnp.sum(out))
    assert np.isfinite(csum), csum
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out if out.ndim == 0 else jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / T * 1e3    # ms per scan step


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, C, H, W)).astype(np.float32))
    rows = []

    # --- A: input unstack ---
    @jax.jit
    def a_index(x):
        def body(s, t):
            return s + jnp.sum(x[t]), None
        s, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(T, dtype=jnp.int32))
        return s

    @jax.jit
    def a_xs(x):
        def body(s, xt):
            return s + jnp.sum(xt), None
        s, _ = jax.lax.scan(body, jnp.float32(0), x)
        return s

    rows.append(("A index x[t] in body", timed(a_index, x)))
    rows.append(("A scan over xs", timed(a_xs, x)))

    # --- B: ys stacking ---
    @jax.jit
    def b_ys(x):
        def body(s, xt):
            y = xt * 1.0001 + s
            return s, y
        _, ys = jax.lax.scan(body, jnp.float32(0), x)
        return jnp.sum(ys)

    @jax.jit
    def b_no_ys(x):
        def body(s, xt):
            y = xt * 1.0001 + s
            return s + jnp.sum(y) * 0, None
        s, _ = jax.lax.scan(body, jnp.float32(0), x)
        return s

    rows.append(("B scan with ys", timed(b_ys, x)))
    rows.append(("B scan no ys (sum)", timed(b_no_ys, x)))

    # --- C: the frame-0 rejoin concat (once per sequence) ---
    y0 = x[0]
    rest = x[1:]

    @jax.jit
    def c_concat(y0, rest):
        return jnp.sum(jnp.concatenate([y0[None], rest], axis=0))

    rows.append(("C time-axis concat (whole seq, per-frame)",
                 timed(c_concat, y0, rest)))

    # --- D: tier dispatch structures (per frame, 13 planes) ---
    planes = jnp.asarray(
        rng.standard_normal((13, H, W)).astype(np.float32))

    def mk(scale):
        def f(_):
            return planes * scale
        return f

    @jax.jit
    def d_switch(planes, t_):
        def body(s, i):
            tier = (i % 4).astype(jnp.int32)
            p = jax.lax.switch(tier, [mk(1.0), mk(1.5), mk(2.0),
                                      mk(2.5)], None)
            return s + p[0, 0, 0], None
        s, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(T, dtype=jnp.int32))
        return s

    @jax.jit
    def d_cond(planes, t_):
        def body(s, i):
            steady = planes * 1.0
            p = jax.lax.cond(i > 1_000_000, mk(2.0), lambda _: steady,
                             None)
            return s + p[0, 0, 0], None
        s, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(T, dtype=jnp.int32))
        return s

    @jax.jit
    def d_none(planes, t_):
        def body(s, i):
            p = planes * 1.0
            return s + p[0, 0, 0], None
        s, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(T, dtype=jnp.int32))
        return s

    rows.append(("D 4-way switch", timed(d_switch, planes, 0)))
    rows.append(("D cond(rare, steady)", timed(d_cond, planes, 0)))
    rows.append(("D no dispatch", timed(d_none, planes, 0)))

    # --- E: mirror pad + concat (per frame, 9 planes) ---
    p9 = jnp.asarray(rng.standard_normal((9, H, W)).astype(np.float32))

    @jax.jit
    def e_pad(p9):
        def body(s, i):
            q = jnp.pad(p9 + s, ((0, 0), (16, 48), (16, 80)),
                        mode="symmetric")
            return s + q[0, 0, 0], None
        s, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(T, dtype=jnp.int32))
        return s

    @jax.jit
    def e_concat(p9):
        def body(s, i):
            q = jnp.concatenate([p9[0:3] + s, p9[3:6], p9[6:9]], axis=0)
            return s + q[0, 0, 0], None
        s, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(T, dtype=jnp.int32))
        return s

    rows.append(("E 9-plane mirror pad", timed(e_pad, p9)))
    rows.append(("E 9-plane concat", timed(e_concat, p9)))

    print(f"backend={jax.default_backend()}")
    for name, ms in rows:
        print(f"{name:45s} {ms:8.4f} ms/step")


if __name__ == "__main__":
    main()
