"""Bisect the Mosaic compile crashes from probe_mosaic.py into single ops."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_case(name, fn):
    try:
        fn()
        print(f"{name}: OK")
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:300]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


def case_lane_slice_odd():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:, 5:5 + 256]

    x = jnp.arange(8 * 512, dtype=jnp.int32).reshape(8, 512)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert bool(jnp.all(out == x[:, 5:261])), "wrong values"


def case_lane_slice_3d():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:, :, 5:5 + 256]

    x = jnp.arange(4 * 8 * 512, dtype=jnp.int32).reshape(4, 8, 512)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 8, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert bool(jnp.all(out == x[:, :, 5:261])), "wrong values"


def case_bcast_where_3d():
    def kernel(t_ref, x_ref, o_ref):
        o_ref[:] = jnp.where((t_ref[:] == 3)[None], x_ref[:], 0)

    x = jnp.arange(4 * 8 * 256, dtype=jnp.int32).reshape(4, 8, 256)
    t = (jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)) % 7
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 8, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, x)
    assert bool(jnp.all(out == jnp.where((t == 3)[None], x, 0)))


def case_sublane_slice_3d():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:, 3:3 + 8, :]

    x = jnp.arange(4 * 16 * 256, dtype=jnp.int32).reshape(4, 16, 256)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 8, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    assert bool(jnp.all(out == x[:, 3:11, :]))


def case_dma_static():
    def kernel(src, o_ref, sem):
        cp = pltpu.make_async_copy(src.at[:, 8:8 + 16, :], o_ref, sem)
        cp.start()
        cp.wait()

    x = jnp.arange(4 * 64 * 256, dtype=jnp.int32).reshape(4, 64, 256)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 16, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )(x)
    assert bool(jnp.all(out == x[:, 8:24, :]))


def case_dma_dyn_sublane():
    def kernel(off, src, o_ref, sem):
        cp = pltpu.make_async_copy(
            src.at[:, pl.ds(off[0], 16), :], o_ref, sem)
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
    )(o, x))(jnp.array([8], jnp.int32), x)
    assert bool(jnp.all(out == x[:, 8:24, :]))


def case_dma_dyn_lane():
    def kernel(off, src, o_ref, sem):
        cp = pltpu.make_async_copy(
            src.at[:, :, pl.ds(off[0], 128)], o_ref, sem)
        cp.start()
        cp.wait()

    x = jnp.arange(4 * 16 * 512, dtype=jnp.int32).reshape(4, 16, 512)
    out = jax.jit(lambda o, x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 16, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )(o, x))(jnp.array([8], jnp.int32), x)
    assert bool(jnp.all(out == x[:, :, 8:136]))


def case_dma_out():
    def kernel(src, out_hbm, stage, sem_i, sem_o):
        cp = pltpu.make_async_copy(src.at[:, 0:16, :], stage, sem_i)
        cp.start()
        cp.wait()
        stage[:] = stage[:] + 1
        co = pltpu.make_async_copy(stage, out_hbm.at[:, 16:32, :], sem_o)
        co.start()
        co.wait()

    x = jnp.arange(4 * 64 * 256, dtype=jnp.int32).reshape(4, 64, 256)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 64, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((4, 16, 256), jnp.int32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
    )(x)
    assert bool(jnp.all(out[:, 16:32, :] == x[:, 0:16, :] + 1))


def case_fori_dma():
    def kernel(src, out_hbm, stage, sem_i, sem_o):
        def body(c, _):
            cp = pltpu.make_async_copy(
                src.at[:, pl.ds(c * 16, 16), :], stage, sem_i)
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
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 64, 256), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((4, 16, 256), jnp.int32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
    )(x)
    assert bool(jnp.all(out == x + 1))


CASES = {k[5:]: v for k, v in list(globals().items())
         if k.startswith("case_")}

if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    for n in names:
        try_case(n, CASES[n])
