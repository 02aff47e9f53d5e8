"""Loop-amortized on-chip microbenches (per-call dispatch on this
tunneled stack is ~25-30 ms, so every measurement must iterate inside
one jit with a data dependence that prevents hoisting).

  a: XLA gather/scatter cost vs index count K (fix-up path budget)
  b: v1 warp plan / kernel amortized cost on a covered pure-pan field
  c: full-frame select-layer and dynamic-roll cost (v2 cost model)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

C, H, W = 16, 720, 1280
N_IT = 40


def amortized(fn_loop, *args):
    """fn_loop(n, *args) runs n iterations inside jit; returns seconds/iter."""
    f1 = jax.jit(lambda *a: fn_loop(1, *a))
    fN = jax.jit(lambda *a: fn_loop(N_IT, *a))
    float(jnp.sum(f1(*args)))  # compile
    float(jnp.sum(fN(*args)))
    t0 = time.perf_counter()
    r1 = float(jnp.sum(f1(*args)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    rN = float(jnp.sum(fN(*args)))
    tN = time.perf_counter() - t0
    del r1, rN
    return (tN - t1) / (N_IT - 1)


def bench_gather_k():
    print("== a. amortized gather/scatter vs K ==", flush=True)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (C, H, W),
                                   dtype=np.int64).astype(np.int32))
    for K in (1024, 8192, 32768, 131072, 921600):
        flat0 = jnp.asarray(rng.integers(0, H * W, (K,), dtype=np.int64)
                            .astype(np.int32))

        def gloop(n, src, flat0):
            def body(i, carry):
                s, acc = carry
                flat = (flat0 + s) % (H * W)
                vals = src.reshape(C, H * W)[:, flat]
                s2 = vals[0, 0] & 7
                return s2, acc + vals[0, 0]
            return jax.lax.fori_loop(0, n, body, (jnp.int32(0),
                                                  jnp.int32(0)))[1]

        def sloop(n, src, flat0):
            def body(i, carry):
                s, acc = carry
                flat = (flat0 + s) % (H * W)
                out = src.reshape(C, H * W).at[:, flat].set(i)
                s2 = out[0, 0] & 7
                return s2, acc + out[0, 0]
            return jax.lax.fori_loop(0, n, body, (jnp.int32(0),
                                                  jnp.int32(0)))[1]

        tg = amortized(gloop, src, flat0)
        ts = amortized(sloop, src, flat0)
        print(f"  K={K:6d}: gather {tg*1e3:7.3f} ms   "
              f"scatter {ts*1e3:7.3f} ms", flush=True)


def bench_v1():
    print("== b. amortized v1 plan / plan+kernel (pure pan) ==", flush=True)
    from bmfr_tpu.ops.warp_pallas import _plan, warp_rows_pallas

    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (C, H, W),
                                   dtype=np.int64).astype(np.int32))
    iy0 = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None],
                           (H, W)) + 3
    ix0 = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :],
                           (H, W)) - 2

    def ploop(n, src, iy0, ix0):
        def body(i, carry):
            s, acc = carry
            iy = jnp.where(s < 2**30, iy0, iy0 + 1)
            p = _plan(src, iy, ix0, 16, 16, 16)
            v = p.sel[0, 0, 0]
            return v & 0, acc + v + p.wo[0]
        return jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))[1]

    def kloop(n, src, iy0, ix0):
        def body(i, carry):
            s, acc = carry
            iy = jnp.where(s < 2**30, iy0, iy0 + 1)
            r0, r1 = warp_rows_pallas(src, iy, ix0)
            v = r0[0, 0, 0]
            return v & 0, acc + v + r1[0, 0, 0]
        return jax.lax.fori_loop(0, n, body, (jnp.int32(0), jnp.int32(0)))[1]

    tp = amortized(ploop, src, iy0, ix0)
    tk = amortized(kloop, src, iy0, ix0)
    print(f"  plan: {tp*1e3:.3f} ms   plan+kernel: {tk*1e3:.3f} ms",
          flush=True)


def bench_select():
    print("== c. amortized full-frame select / roll layers ==", flush=True)
    rng = np.random.default_rng(2)
    WP = 1536
    big = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (C, H, WP),
                                   dtype=np.int64).astype(np.int32))
    selp = jnp.asarray(rng.integers(0, 17, (1, H, WP), dtype=np.int64)
                       .astype(np.int32))

    def sel_loop(n, big, selp):
        def body(i, carry):
            s, acc = carry
            out = jnp.where(selp == (i & 15), big + s, acc)
            return out[0, 0, 0] & 0, out
        return jax.lax.fori_loop(
            0, n, body, (jnp.int32(0), jnp.zeros_like(big)))[1]

    def roll_loop(n, big, selp):
        def body(i, carry):
            s, acc = carry
            out = jnp.roll(acc + s, 1, axis=2)
            return out[0, 0, 0] & 0, out
        return jax.lax.fori_loop(
            0, n, body, (jnp.int32(0), big))[1]

    ts = amortized(sel_loop, big, selp)
    tr = amortized(roll_loop, big, selp)
    print(f"  select layer [16,720,1536]: {ts*1e3:.3f} ms   "
          f"roll: {tr*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "a"):
        bench_gather_k()
    if which in ("all", "b"):
        bench_v1()
    if which in ("all", "c"):
        bench_select()
