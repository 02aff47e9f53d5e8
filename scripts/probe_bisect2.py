"""Variants of the dynamic-offset DMA crash: alignment hints etc."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probe_bisect import try_case


def make_dyn_sublane(transform, off_val=8):
    def case():
        def kernel(off, src, o_ref, sem):
            o = transform(off[0])
            cp = pltpu.make_async_copy(
                src.at[:, pl.ds(o, 16), :], o_ref, sem)
            cp.start()
            cp.wait()

        x = jnp.arange(4 * 64 * 256, dtype=jnp.int32).reshape(4, 64, 256)
        out = jax.jit(lambda o, x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((4, 16, 256), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        )(o, x))(jnp.array([off_val], jnp.int32), x)
        assert bool(jnp.all(out == x[:, off_val:off_val + 16, :])), "values"
    return case


def case_dyn_from_fori_carry():
    """Offset = fori index * 8 + smem scalar — like the real kernel."""
    def kernel(off, src, out_hbm, stage, sem_i, sem_o):
        def body(c, _):
            o = pl.multiple_of(off[c] * 8, 8)
            cp = pltpu.make_async_copy(
                src.at[:, pl.ds(o, 16), :], stage, sem_i)
            cp.start()
            cp.wait()
            stage[:] = stage[:] + 1
            co = pltpu.make_async_copy(
                stage, out_hbm.at[:, pl.ds(c * 16, 16), :], sem_o)
            co.start()
            co.wait()
            return 0
        jax.lax.fori_loop(0, 4, body, 0)

    x = jnp.arange(4 * 64 * 256, dtype=jnp.int32).reshape(4, 64, 256)
    offs = jnp.array([0, 1, 3, 5], jnp.int32)
    out = jax.jit(lambda o, x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 64, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((4, 16, 256), jnp.int32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
    )(o, x))(offs, x)
    import numpy as np
    ref = np.zeros((4, 64, 256), np.int32)
    xs = np.asarray(x)
    for c in range(4):
        ref[:, c * 16:(c + 1) * 16] = xs[:, offs[c] * 8:offs[c] * 8 + 16] + 1
    assert bool((np.asarray(out) == ref).all()), "values"


CASES = {
    "mult8": make_dyn_sublane(lambda o: pl.multiple_of(o, 8)),
    "mult8_mul": make_dyn_sublane(lambda o: pl.multiple_of(o, 8) * 1),
    "times8": make_dyn_sublane(lambda o: o * 8, off_val=1),
    "plain_again": make_dyn_sublane(lambda o: o),
    "fori_carry": lambda: case_dyn_from_fori_carry(),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    for n in names:
        try_case(n, CASES[n])
