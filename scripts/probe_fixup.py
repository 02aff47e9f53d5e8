"""Break down the warp fix-up cost: compaction, gather, blend, scatter.
Each piece timed loop-amortized with a data dependence (PERF_NOTES
methodology)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from bmfr_tpu.ops.warp_pallas import compact_indices
from bmfr_tpu.profiling import force

H, W, K, C = 720, 1280, 8192, 13
HW = H * W
rng = np.random.default_rng(0)
mask = np.zeros(HW, bool); mask[rng.choice(HW, 3500, replace=False)] = True
mask_j = jnp.asarray(mask)
blended = jnp.asarray(rng.random((C, HW), np.float32))
fix = jnp.asarray(rng.random((C, K), np.float32))
src8 = jnp.asarray(rng.integers(-2**31, 2**31-1, (8, HW)).astype(np.int32))
N = 30

def bench(name, fn, *args):
    f = jax.jit(fn)
    force(f(*args))
    t0 = time.perf_counter()
    force(f(*args))
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:<34}{dt:8.3f} ms")
    return dt

def loop(body):
    def run(x, *rest):
        def it(i, acc):
            return acc + body(x + (acc % 2).astype(x.dtype) * 0, *rest)
        return jax.lax.fori_loop(0, N, it, jnp.zeros((), jnp.float32))
    return run

bench("compact (2-level rank search)",
      loop(lambda m: compact_indices(m > 0, K)[0].sum().astype(jnp.float32)),
      mask_j.astype(jnp.int32))
idx, _ = compact_indices(mask_j, K)
flat = jnp.concatenate([idx, idx + 1, idx + 2, idx + 3]) % HW
bench("gather [8,HW] @4K idx",
      loop(lambda fl, s: s[:, fl].sum().astype(jnp.float32)), flat, src8)
bench("scatter .at[:,idx].set C=13",
      loop(lambda ix, b, f: b.at[:, ix].set(f).sum(), ), ) if False else None
def scat(ix, b, f):
    return b.at[:, ix].set(f)[:, ::997].sum()
bench("scatter .at[:,idx].set C=13", loop(scat), idx, blended, fix)
def scat1(ix, b, f):
    return b.at[0, ix].set(f[0])[:, ::997].sum()
bench("scatter 1 plane", loop(scat1), idx, blended, fix)
# alternative: one-hot matmul scatter? K x HW too big. segment approach:
def scat_dus(ix, b, f):
    # sorted idx -> per-plane full-frame select via compare against
    # searchsorted rank: rank[j] = position of j in idx if present
    r = jnp.searchsorted(ix, jnp.arange(0, HW, dtype=jnp.int32))
    hit = ix[jnp.clip(r, 0, K - 1)] == jnp.arange(HW, dtype=jnp.int32)
    vals = f[:, jnp.clip(r, 0, K - 1)]
    return jnp.where(hit[None], vals, b)[:, ::997].sum()
bench("select-scatter (searchsorted)", loop(scat_dus), idx, blended, fix)
