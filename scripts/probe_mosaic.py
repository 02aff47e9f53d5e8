"""On-chip probes for the Mosaic primitives the Pallas warp kernel needs.

Each probe compiles and times one risky primitive in isolation so the
kernel design rests on measured facts (docs/PERF_NOTES.md records the
results). Run on the real TPU: `python scripts/probe_mosaic.py [probe...]`.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def force(x):
    """Readback fence (block_until_ready may no-op on this stack)."""
    return float(jnp.sum(jnp.abs(x.astype(jnp.float32))))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    force(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


# ---------------------------------------------------------------------------
def probe_dynamic_roll():
    """pltpu.roll with a traced (runtime) shift along lanes."""

    def kernel(s_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=s_ref[0], axis=1)

    x = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)

    @jax.jit
    def run(s, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(s, x)

    out = run(jnp.array([5], jnp.int32), x)
    ref = jnp.roll(x, -0 + 5, axis=1)  # pltpu.roll semantics check both ways
    ref2 = jnp.roll(x, -5, axis=1)
    m_fwd = bool(jnp.all(out == ref))
    m_bwd = bool(jnp.all(out == ref2))
    print(f"dynamic_roll: compiles=True fwd_match={m_fwd} bwd_match={m_bwd}")


# ---------------------------------------------------------------------------
def probe_odd_lane_slice():
    """Static lane slices at non-128-aligned offsets + select accumulate,
    at warp-kernel scale: [16, 32, 1408] window, 36 slice+selects."""

    C, R, WP, W = 16, 32, 1408, 1280
    K = 18

    def kernel(x_ref, t_ref, o_ref):
        acc = jnp.zeros((C, R, W), jnp.int32)
        t = t_ref[:]  # [R, W] selector
        for k in range(K):
            sl = x_ref[:, :, k:k + W]
            acc = jnp.where((t == k)[None], sl, acc)
        o_ref[:] = acc

    x = jnp.arange(C * R * WP, dtype=jnp.int32).reshape(C, R, WP)
    t = (jnp.arange(R * W, dtype=jnp.int32).reshape(R, W)) % K

    @jax.jit
    def run(x, t):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, R, W), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, t)

    secs, out = timeit(run, x, t)
    ref = np.take_along_axis(
        np.asarray(x), (np.asarray(t)[None] + np.arange(W)[None, None]) *
        np.ones((C, 1, 1), np.int32), axis=2)
    ok = bool((np.asarray(out) == ref).all())
    # warp scale: 2 resolves (y+x) x 23 chunks of this size per frame
    print(f"odd_lane_slice: ok={ok} {secs*1e6:.0f} us per chunk-resolve "
          f"(frame ~= {secs*2*23*1e3:.2f} ms)")


# ---------------------------------------------------------------------------
def probe_sublane_shift_select():
    """y-resolve shape: shifted sublane slices + selects on [16, 50, 1408]."""
    C, WH, R, WP = 16, 50, 32, 1408
    K = 18

    def kernel(x_ref, t_ref, o_ref):
        acc = jnp.zeros((C, R, WP), jnp.int32)
        t = t_ref[:]
        for k in range(K):
            sl = x_ref[:, k:k + R, :]
            acc = jnp.where((t == k)[None], sl, acc)
        o_ref[:] = acc

    x = jnp.arange(C * WH * WP, dtype=jnp.int32).reshape(C, WH, WP)
    t = (jnp.arange(R * WP, dtype=jnp.int32).reshape(R, WP) * 7) % K

    @jax.jit
    def run(x, t):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, R, WP), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, t)

    secs, out = timeit(run, x, t)
    xs = np.asarray(x)
    ts = np.asarray(t)
    ref = np.zeros((C, R, WP), np.int32)
    for k in range(K):
        ref = np.where((ts == k)[None], xs[:, k:k + R, :], ref)
    ok = bool((np.asarray(out) == ref).all())
    print(f"sublane_shift_select: ok={ok} {secs*1e6:.0f} us "
          f"(frame ~= {secs*2*23*1e3:.2f} ms)")


# ---------------------------------------------------------------------------
def probe_manual_dma():
    """grid=(1,), fori over chunks, manual DMA HBM->VMEM with dynamic
    sublane start from an SMEM scalar array, manual DMA out."""
    C, H, WP = 16, 720, 1408
    RC, WH, NCH = 32, 50, 720 // 32  # hmm 720/32 = 22.5 -> use 720=RC*NCH?

    H = RC * 22  # 704 rows for the probe
    NCH = 22

    def kernel(org_ref, src_hbm, out_hbm, win, stage, sem_in, sem_out):
        def body(c, _):
            org = org_ref[c]
            cp = pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(org, WH), :], win, sem_in)
            cp.start()
            cp.wait()
            stage[:] = win[:, 0:RC, :] + 1
            cpo = pltpu.make_async_copy(
                stage, out_hbm.at[:, pl.ds(c * RC, RC), :], sem_out)
            cpo.start()
            cpo.wait()
            return 0

        jax.lax.fori_loop(0, NCH, body, 0)

    x = jnp.arange(C * H * WP, dtype=jnp.int32).reshape(C, H, WP)
    orgs = jnp.clip(jnp.arange(NCH, dtype=jnp.int32) * RC - 8, 0, H - WH)

    @jax.jit
    def run(orgs, x):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            out_shape=jax.ShapeDtypeStruct((C, H, WP), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((C, WH, WP), jnp.int32),
                pltpu.VMEM((C, RC, WP), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )(orgs, x)

    secs, out = timeit(run, orgs, x)
    ref = np.zeros((C, H, WP), np.int32)
    xs = np.asarray(x)
    for c in range(NCH):
        ref[:, c * RC:(c + 1) * RC, :] = xs[:, orgs[c]:orgs[c] + RC, :] + 1
    ok = bool((np.asarray(out) == ref).all())
    print(f"manual_dma: ok={ok} {secs*1e6:.0f} us for {NCH} chunks "
          f"({secs/NCH*1e6:.1f} us/chunk)")


# ---------------------------------------------------------------------------
def probe_dyn_lane_dma():
    """DMA with a dynamic LANE-dim start (for the per-chunk x base shift)."""
    C, H, WP, WW = 4, 64, 1536, 1408

    def kernel(off_ref, src_hbm, out_ref, sem):
        cp = pltpu.make_async_copy(
            src_hbm.at[:, :, pl.ds(off_ref[0], WW)], out_ref, sem)
        cp.start()
        cp.wait()

    x = jnp.arange(C * H * WP, dtype=jnp.int32).reshape(C, H, WP)

    @jax.jit
    def run(off, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, H, WW), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )(off, x)

    for off in (0, 8, 13, 100):
        out = run(jnp.array([off], jnp.int32), x)
        ok = bool(jnp.all(out == x[:, :, off:off + WW]))
        print(f"dyn_lane_dma off={off}: ok={ok}")


PROBES = {
    "dynamic_roll": probe_dynamic_roll,
    "odd_lane_slice": probe_odd_lane_slice,
    "sublane_shift_select": probe_sublane_shift_select,
    "manual_dma": probe_manual_dma,
    "dyn_lane_dma": probe_dyn_lane_dma,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        try:
            PROBES[name]()
        except Exception as e:  # noqa: BLE001 - probe harness
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:500]}")
