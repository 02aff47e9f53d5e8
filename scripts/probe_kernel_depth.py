"""Bisect the real warp kernel's cost vs select depth (KY, KX)."""

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

N_IT = 20


def amortized(fn_loop, *args):
    f1 = jax.jit(lambda *a: fn_loop(1, *a))
    fN = jax.jit(lambda *a: fn_loop(N_IT, *a))
    float(jnp.sum(f1(*args)))
    float(jnp.sum(fN(*args)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(f1(*args)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(fN(*args)))
        tN = time.perf_counter() - t0
        best = min(best, (tN - t1) / (N_IT - 1))
    return best


def make_kernel(C, nty, ntx, ky, kx, do_rolls):
    from bmfr_tpu.ops import warp_pallas as wp

    TH, TC, WH, TW = wp.TH, wp.TC, wp.WH, wp.TW
    NT = nty * ntx

    def kern(wo_ref, ra_ref, resid_ref, src_hbm, sel_hbm, out_hbm,
             win, sel, stage, sem_w, sem_s, sem_o):
        def body(i, _):
            wo = pl.multiple_of(wo_ref[i], 8)
            xo = pl.multiple_of(ra_ref[NT + i], 128)
            dw = pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(wo, WH), pl.ds(xo, TW)], win, sem_w)
            dw.start()
            ds = pltpu.make_async_copy(
                sel_hbm.at[pl.ds(i * 2 * TH, 2 * TH), :], sel, sem_s)
            ds.start()
            dw.wait()
            ds.wait()
            winr = win[...]
            if do_rolls:
                winr = pltpu.roll(winr, shift=TW - ra_ref[i], axis=2)
                winr = pltpu.roll(winr, shift=WH - resid_ref[i], axis=1)
            u = sel[0:TH][None]
            t = sel[TH:2 * TH, :TC][None]
            acc0 = jnp.zeros((C, TH, TW), jnp.int32)
            acc1 = jnp.zeros((C, TH, TW), jnp.int32)
            for k in range(ky):
                cmp = u == k
                acc0 = jnp.where(cmp, winr[:, k:k + TH, :], acc0)
                acc1 = jnp.where(cmp, winr[:, k + 1:k + 1 + TH, :], acc1)
            o0 = jnp.zeros((C, TH, TC), jnp.int32)
            o1 = jnp.zeros((C, TH, TC), jnp.int32)
            for j in range(kx):
                cmpj = t == j
                o0 = jnp.where(cmpj, acc0[:, :, j:j + TC], o0)
                o1 = jnp.where(cmpj, acc1[:, :, j:j + TC], o1)
            if kx == 0:
                o0 = acc0[:, :, :TC]
                o1 = acc1[:, :, :TC]
            if ky == 0:
                o0 = winr[:, 0:TH, 0:TC]
                o1 = winr[:, 1:TH + 1, 0:TC]
            stage[0] = o0
            stage[1] = o1
            ty = i // ntx
            tx = i % ntx
            do = pltpu.make_async_copy(
                stage, out_hbm.at[:, :, pl.ds(ty * TH, TH),
                                  pl.ds(tx * TC, TC)], sem_o)
            do.start()
            do.wait()
            return 0

        jax.lax.fori_loop(0, NT, body, 0)

    return kern


def main():
    from bmfr_tpu.config import BMFRConfig
    from bmfr_tpu.io.fixtures import synthetic_sequence
    from bmfr_tpu.ops.gather import floor_int
    from bmfr_tpu.ops.reproject import reproject_coords
    from bmfr_tpu.ops import warp_pallas as wp

    H, W, C = 720, 1280, 16
    cfg = BMFRConfig(image_width=W, image_height=H).validate()
    sc = synthetic_sequence(width=W, height=H, frames=6)
    pos = jnp.asarray(np.moveaxis(sc["positions"], -1, 1))
    cams = jnp.asarray(sc["camera_matrices"])
    offs = jnp.asarray(sc["pixel_offsets"])
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.integers(
        -2**31, 2**31 - 1, size=(C, H, W), dtype=np.int64).astype(np.int32))

    @jax.jit
    def field(p, c, o):
        pfx, pfy = reproject_coords(cfg, p, c, o)
        return floor_int(pfy), floor_int(pfx)

    iy, ix = field(pos[4], cams[3], offs[4])
    plan = jax.jit(wp._plan)(src, iy, ix)
    nty, ntx = -(-H // wp.TH), -(-W // wp.TC)
    Hk, Wk = nty * wp.TH, ntx * wp.TC
    raxo = jnp.concatenate([plan.ra, plan.xo128])

    for ky, kx, rolls in [(0, 0, False), (0, 0, True), (4, 4, True),
                          (8, 8, True), (16, 20, True)]:
        kern = make_kernel(C, nty, ntx, ky, kx, rolls)

        def run(wo, raxo, resid, srcp, sel):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((2, C, Hk, Wk), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
                + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.VMEM((C, wp.WH, wp.TW), jnp.int32),
                    pltpu.VMEM((2 * wp.TH, wp.TW), jnp.int32),
                    pltpu.VMEM((2, C, wp.TH, wp.TC), jnp.int32),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(wo, raxo, resid, srcp, sel)

        def loop(n, wo, raxo, resid, srcp, sel):
            def body(i, carry):
                s, acc = carry
                out = run(wo + (s % 2) * 8 - (s % 2) * 8 + (s % 2) * 0
                          + jnp.where(s < 2**30, 0, 8), raxo, resid,
                          srcp, sel)
                v = out[0, 0, 0, 0]
                return v & 7, acc + v
            return jax.lax.fori_loop(0, n, body,
                                     (jnp.int32(0), jnp.int32(0)))[1]

        t = amortized(loop, plan.wo, raxo, plan.resid, plan.src_pad,
                      plan.sel)
        print(f"  ky={ky:2d} kx={kx:2d} rolls={rolls}: {t*1e3:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
