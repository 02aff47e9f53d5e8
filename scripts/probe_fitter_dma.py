"""Bisect which ingredient of the direct fitter's unaligned jitter-origin
window DMA fails Mosaic ("tile index in dimension 1 divisible by (8)"),
given that scripts/probe_dma_align.py's unaligned window fetch compiles.

Candidate differences vs the passing probe: f32 vs i32 source, 9 vs 8
leading planes, [2]-SMEM origin vs per-tile SMEM vector, 32-row slice
vs 40, origin arithmetic (org + by*32) vs a plain SMEM read.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_case(name, C, H, W, SH, SW, dtype, org_mode, n_chunks=8, ncx=4,
             src_space="hbm", vmem_mb=64):
    def kern(org_ref, src_hbm, out_hbm, x2, acc, sem_i, sem_o):
        def dma_in(i, slot):
            by = i // ncx
            cx = i % ncx
            if org_mode == "smem2":
                oy = org_ref[0] + by * SH
                ox = org_ref[1] + cx * SW
            elif org_mode == "smem2_plain":
                oy = org_ref[0]
                ox = org_ref[1]
            elif org_mode == "vec":      # traced SMEM index, like
                oy = org_ref[i]          # probe_dma_align's wo_ref[i]
                ox = org_ref[i + 1]
            elif org_mode == "vec_add":
                oy = org_ref[i] + by * SH
                ox = org_ref[i + 1] + cx * SW
            else:  # static
                oy = by * SH
                ox = cx * SW
            return pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(oy, SH), pl.ds(ox, SW)],
                x2.at[slot], sem_i.at[slot])

        dma_in(0, 0).start()

        def body(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_chunks)
            def _():
                dma_in(i + 1, 1 - slot).start()

            dma_in(i, slot).wait()
            acc[...] = acc[...] + x2[slot, 0, :8, :128].astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        do = pltpu.make_async_copy(acc, out_hbm, sem_o)
        do.start()
        do.wait()

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=(
                      pltpu.HBM if src_space == "hbm" else pl.ANY))],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, C, SH, SW), dtype),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((C, H, W)).astype(
        np.float32)).astype(dtype)
    org = (jnp.asarray([5, 3], np.int32) if org_mode.startswith("smem2")
           else jnp.full((n_chunks + 1,), 5, np.int32))
    try:
        out = jax.jit(f)(org, src)
        print(f"{name:<52} ok  {float(jnp.sum(out)):.3f}")
    except Exception as e:
        msg = str(e)
        key = ("divisible" if "divisible" in msg else msg[:80])
        print(f"{name:<52} FAILS: {key}")


def main():
    f32, i32 = jnp.float32, jnp.int32
    # the fitter's exact shape
    run_case("fitter: 9pl f32 [32,512] smem2 org+i*be", 9, 800, 1664,
             32, 512, f32, "smem2")
    # bisect ingredients
    run_case("8pl  f32 [32,512] smem2 org+i*be", 8, 800, 1664,
             32, 512, f32, "smem2")
    run_case("9pl  i32 [32,512] smem2 org+i*be", 9, 800, 1664,
             32, 512, i32, "smem2")
    run_case("9pl  f32 [40,512] smem2 org+i*be", 9, 800, 1664,
             40, 512, f32, "smem2")
    run_case("9pl  f32 [32,512] smem2 plain", 9, 800, 1664,
             32, 512, f32, "smem2_plain")
    run_case("9pl  f32 [32,512] static origin", 9, 800, 1664,
             32, 512, f32, "static")
    run_case("8pl  i32 [40,512] smem2 org+i*be", 8, 768, 1664,
             40, 512, i32, "smem2")
    run_case("8pl  i32 [40,512] smem2 ANY 100MB", 8, 768, 1664,
             40, 512, i32, "smem2", src_space="any", vmem_mb=100)
    run_case("9pl  f32 [32,512] smem2 ANY 100MB", 9, 800, 1664,
             32, 512, f32, "smem2", src_space="any", vmem_mb=100)
    run_case("9pl  f32 [32,512] smem2 ANY 64MB", 9, 800, 1664,
             32, 512, f32, "smem2", src_space="any", vmem_mb=64)
    run_case("9pl  f32 [32,512] smem2 HBM 100MB", 9, 800, 1664,
             32, 512, f32, "smem2", src_space="hbm", vmem_mb=100)
    run_case("9pl  f32 [32,512] vec org[i]", 9, 800, 1664,
             32, 512, f32, "vec")
    run_case("9pl  f32 [32,512] vec org[i]+i*be", 9, 800, 1664,
             32, 512, f32, "vec_add")


if __name__ == "__main__":
    main()
