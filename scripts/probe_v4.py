"""Does XLA:TPU gather/scatter get faster when each index moves a
contiguous row of bytes ([HW, C] layout) instead of a strided column
([C, HW])? Decides between 'row-layout XLA warp' and the Pallas tile
kernel, and prices the fix-up scatter."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

H, W = 720, 1280
HW = H * W
N_IT = 30


def amortized(fn_loop, *args):
    f1 = jax.jit(lambda *a: fn_loop(1, *a))
    fN = jax.jit(lambda *a: fn_loop(N_IT, *a))
    float(jnp.sum(f1(*args)))
    float(jnp.sum(fN(*args)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(f1(*args)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(fN(*args)))
        tN = time.perf_counter() - t0
        ts.append((tN - t1) / (N_IT - 1))
    return min(ts)


def main():
    rng = np.random.default_rng(0)

    for C in (8, 16, 32):
        src_rows = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (HW, C),
                                            dtype=np.int64).astype(np.int32))
        flat0 = jnp.asarray(rng.integers(0, HW, (HW,), dtype=np.int64)
                            .astype(np.int32))

        def rg(n, src, flat0):
            def body(i, carry):
                s, acc = carry
                flat = (flat0 + s) % HW
                vals = src[flat]                       # [HW, C] row gather
                s2 = vals[0, 0] & 7
                return s2, acc + vals[0, 0]
            return jax.lax.fori_loop(0, n, body, (jnp.int32(0),
                                                  jnp.int32(0)))[1]

        t = amortized(rg, src_rows, flat0)
        print(f"  row-gather [HW,{C}] K=921600: {t*1e3:7.3f} ms", flush=True)

    # row scatter at fix-up sizes
    src32 = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (HW, 32),
                                     dtype=np.int64).astype(np.int32))
    for K in (8192, 32768):
        flat0 = jnp.asarray(rng.integers(0, HW, (K,), dtype=np.int64)
                            .astype(np.int32))
        vals = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (K, 32),
                                        dtype=np.int64).astype(np.int32))

        def rs(n, dst, flat0, vals):
            def body(i, carry):
                s, acc = carry
                flat = (flat0 + s) % HW
                out = dst.at[flat].set(vals)
                s2 = out[0, 0] & 7
                return s2, acc + out[0, 0]
            return jax.lax.fori_loop(0, n, body, (jnp.int32(0),
                                                  jnp.int32(0)))[1]

        t = amortized(rs, src32, flat0, vals)
        print(f"  row-scatter [HW,32] K={K}: {t*1e3:7.3f} ms", flush=True)

    # compaction cost: flat indices of uncovered pixels, K-padded
    uncov = jnp.asarray(rng.random(HW) < 0.01)

    def compact(n, uncov):
        def body(i, carry):
            s, acc = carry
            u = uncov ^ (s > 2**30)
            idx = jnp.nonzero(u, size=32768, fill_value=0)[0]
            return idx[0].astype(jnp.int32) & 0, acc + idx[-1]
        return jax.lax.fori_loop(0, n, body, (jnp.int32(0),
                                              jnp.asarray(0)))[1]

    t = amortized(compact, uncov)
    print(f"  nonzero-compaction K=32768: {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
