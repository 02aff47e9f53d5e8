"""Probe the fix-up chain's redesign candidates on the real TPU.

Round-4 xplane attribution (trace_scan TRACE_SCOPE=warp_fixup) showed
the fix-up's 1.45 ms/frame is NOT gather-volume-bound at k=4096 — it is
layout-bound: `iy.reshape(1,-1)` flattens relayout [H,W] planes before
the aux concat (0.335), `blended.reshape(13, H*W)` relayouts the 48 MB
output around the scatter (0.137 + 0.181), and the rank search's 10
halving steps cost a fixed ~0.028 per gather op.

Candidates measured here (all DCE-proof: every output feeds the next
iteration's indices; fence = checksum readback):

  A1 current aux path: flatten+concat 11 planes, 1-D gather at k
  A2 2-D gather at [k,2] coords from the unflattened [11,H,W] stack
  A3 axis-0 concat [8,H,W] (pfxy+cur6) + 2-D gather + recompute
     iy/ix/bits/fx/fy at the k points
  B1 current scatter: reshape to [13,HW], 1-D scatter, reshape back
  B2 2-D scatter at [k,2] into [13,H,W]
  C1 rank-search halving gathers: 10 steps at BS=1024 (current)
  C2 5 steps at BS=32 with a [k, nb=28800] bf16 comparison matrix
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

H, W = 720, 1280
K = 4096
T = 60


def timed(fn, *args, reps=3):
    out = fn(*args)
    csum = float(jnp.sum(out))
    assert np.isfinite(csum), csum
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / T * 1e3


def chain(idx, v):
    """Derive next-iteration indices from this iteration's values, so
    XLA can neither hoist nor DCE the measured op."""
    return (idx + (v[:1].astype(jnp.int32) & 1)) % (H * W)


def main():
    rng = np.random.default_rng(0)
    planes11 = jnp.asarray(
        rng.standard_normal((11, H, W)).astype(np.float32))
    planes13 = jnp.asarray(
        rng.standard_normal((13, H, W)).astype(np.float32))
    fix = jnp.asarray(rng.standard_normal((13, K)).astype(np.float32))
    idx0 = jnp.asarray(np.sort(rng.choice(H * W, K, False)).astype(
        np.int32))
    rows = []

    # --- A1: current aux path (flatten + concat + 1-D gather) ---
    @jax.jit
    def a1(planes11, idx0):
        def body(c, _):
            idx, s = c
            aux = jnp.concatenate(
                [p.reshape(1, -1) for p in planes11], axis=0)
            a = aux[:, idx]                          # [11, K]
            return (chain(idx, a[0]), s + jnp.sum(a)), None
        (idx, s), _ = jax.lax.scan(body, (idx0, jnp.float32(0)),
                                   None, length=T)
        return s

    # --- A2: 2-D gather from the unflattened stack ---
    @jax.jit
    def a2(planes11, idx0):
        def body(c, _):
            idx, s = c
            yy = idx // W
            xx = idx % W
            a = planes11[:, yy, xx]                  # [11, K] 2-D gather
            return (chain(idx, a[0]), s + jnp.sum(a)), None
        (idx, s), _ = jax.lax.scan(body, (idx0, jnp.float32(0)),
                                   None, length=T)
        return s

    # --- A3: gather 8 source planes, recompute 5 aux at points ---
    @jax.jit
    def a3(planes11, idx0):
        src8 = planes11[:8]
        def body(c, _):
            idx, s = c
            yy = idx // W
            xx = idx % W
            a = src8[:, yy, xx]                      # [8, K]
            fx = a[0] - jnp.floor(a[0])
            fy = a[1] - jnp.floor(a[1])
            bits = (a[2] > 0).astype(jnp.int32) | 2
            v = jnp.sum(a) + jnp.sum(fx + fy) + jnp.sum(bits)
            return (chain(idx, a[0]), s + v), None
        (idx, s), _ = jax.lax.scan(body, (idx0, jnp.float32(0)),
                                   None, length=T)
        return s

    rows.append(("A1 flatten+concat+1D gather [11,k]", timed(a1, planes11, idx0)))
    rows.append(("A2 2-D gather [11,k]", timed(a2, planes11, idx0)))
    rows.append(("A3 2-D gather [8,k] + recompute", timed(a3, planes11, idx0)))

    # --- B1: current scatter (reshape + 1-D scatter + reshape) ---
    @jax.jit
    def b1(planes13, fix, idx0):
        def body(c, _):
            idx, p = c
            out = (p.reshape(13, H * W).at[:, idx]
                   .set(fix, indices_are_sorted=True)
                   .reshape(13, H, W))
            return (chain(idx, out[0, 0, :K]), out), None
        (idx, p), _ = jax.lax.scan(body, (idx0, planes13), None, length=T)
        return jnp.sum(p)

    # --- B2: 2-D scatter into [13, H, W] ---
    @jax.jit
    def b2(planes13, fix, idx0):
        def body(c, _):
            idx, p = c
            yy = idx // W
            xx = idx % W
            out = p.at[:, yy, xx].set(fix)
            return (chain(idx, out[0, 0, :K]), out), None
        (idx, p), _ = jax.lax.scan(body, (idx0, planes13), None, length=T)
        return jnp.sum(p)

    rows.append(("B1 reshape+1D scatter 13pl", timed(b1, planes13, fix, idx0)))
    rows.append(("B2 2-D scatter 13pl", timed(b2, planes13, fix, idx0)))

    # --- C: rank-search steps ---
    n = H * W
    cs = jnp.cumsum(jnp.asarray(
        rng.integers(0, 2, n).astype(np.int32)))

    def search(BS, steps, q0):
        nb = -(-n // BS)
        cs_pad = jnp.pad(cs, (0, nb * BS - n), constant_values=cs[-1])
        csb = cs_pad[BS - 1::BS]

        def body(c, _):
            q, s = c
            bidx = jnp.sum((csb[None, :].astype(jnp.bfloat16)
                            < q[:, None].astype(jnp.bfloat16))
                           .astype(jnp.int32), axis=1)
            pos = bidx * BS
            step = BS // 2
            while step:
                cand = pos + step
                v = cs_pad[jnp.clip(cand - 1, 0, nb * BS - 1)]
                pos = jnp.where(v < q, cand, pos)
                step //= 2
            q = (q + pos[:1] % 2) % (n // 2)
            return (q, s + jnp.sum(pos)), None
        (q, s), _ = jax.lax.scan(body, (q0, jnp.float32(0)),
                                 None, length=T)
        return s

    q0 = jnp.arange(1, K + 1, dtype=jnp.int32)
    c1 = jax.jit(lambda q: search(1024, 10, q))
    c2 = jax.jit(lambda q: search(32, 5, q))
    rows.append(("C1 rank search BS=1024 (10 gathers)", timed(c1, q0)))
    rows.append(("C2 rank search BS=32 (5 gathers)", timed(c2, q0)))

    print(f"backend={jax.default_backend()}  (ms/step, {T}-step scan, "
          f"k={K})")
    for name, ms in rows:
        print(f"{name:<42} {ms:8.4f}")


if __name__ == "__main__":
    main()
