"""Pallas TPU kernel for the blockwise fit (stage K2).

The XLA path (:mod:`bmfr_tpu.ops.fitter`) expresses the Householder QR as 10
sequential batched reflections, each of which round-trips the whole
``[n_blocks, 13, 1024]`` tensor through HBM (~1 GB of traffic per frame).
This kernel keeps a *chunk* of blocks fully VMEM-resident and runs the
entire scale -> noise -> QR -> back-substitution chain in one pass, so each
block's 53 KB matrix is read from HBM exactly once and only the 120-byte
weight/min-max results are written back.

Grid: ``(n_blocks / CHUNK,)`` — one grid step fits CHUNK blocks. VMEM per
step: CHUNK * 13 * 1024 * 4 B = 425 KB at CHUNK=8, well under the ~16 MB
budget, leaving the pipeline room to double-buffer the input DMA.

Semantics follow opencl/bmfr.cl:490-700 exactly like the XLA path (scale at
:511-542, reflections at :549-656, the noise-once rule at :625-627, back
substitution at :659-699); equivalence against the XLA path and the literal
oracle is tested in ``tests/test_fitter_pallas.py``.

With reduced-precision storage (``tmp_data_dtype != float32``) the
reference re-rounds ``tmp_data`` between every Householder reflection
(the half-precision STOREs inside the QR loop, opencl/bmfr.cl:255-265,
:560, :653). This kernel reproduces those rounding points: bf16 storage
uses a native downcast; f16 storage uses :func:`round_to_f16` — a
bit-exact manual round-to-nearest-even emulation (Mosaic has no f16
vector type), validated against ``astype(float16)`` in
``tests/test_fitter_pallas.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rng import feature_noise

DEFAULT_CHUNK = 8


def round_to_f16(x):
    """Round f32 values to the nearest f16-representable value (RNE),
    returning f32 — bit-identical to ``x.astype(f16).astype(f32)``.

    Normal range uses the classic mantissa-mask trick (add half-ulp plus
    the round-to-even bit, clear the dropped 13 bits; the carry into the
    exponent handles binade boundaries). Subnormal f16 range rounds on
    the fixed 2^-24 grid via the add-magic-constant trick. Overflow goes
    to inf like a half store does; NaN/inf pass through.
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = bits & jnp.uint32(0x80000000)
    absb = bits & jnp.uint32(0x7FFFFFFF)
    exp = absb >> 23

    # normal f16 range (|x| >= 2^-14 <-> f32 exponent >= 113)
    lsb = (absb >> 13) & 1
    rn = (absb + jnp.uint32(0xFFF) + lsb) & ~jnp.uint32(0x1FFF)
    rn = jnp.where(rn > jnp.uint32(0x477FE000),
                   jnp.uint32(0x7F800000), rn)   # > 65504 -> inf

    # subnormal range: round |x| * 2^24 to the nearest even integer
    ax = jax.lax.bitcast_convert_type(absb, jnp.float32)
    magic = jnp.float32(12582912.0)              # 1.5 * 2^23
    k = (ax * jnp.float32(16777216.0) + magic) - magic
    rs = jax.lax.bitcast_convert_type(
        k * jnp.float32(5.9604644775390625e-08), jnp.uint32)  # * 2^-24

    r = jnp.where(exp >= 113, rn, rs)
    r = jnp.where(exp == 255, absb, r)           # NaN / inf passthrough
    return jax.lax.bitcast_convert_type(sign | r, jnp.float32)


def _quantize(cfg, x):
    """Storage-dtype rounding at the reference's re-store points."""
    if cfg.tmp_data_dtype == "float16":
        return round_to_f16(x)
    if cfg.tmp_data_dtype == "bfloat16":
        return x.astype(jnp.bfloat16).astype(jnp.float32)
    return x


def _lanes_out(cfg):
    """Exported lanes of the reduced system: one VPU lane group, but never
    more than the block has pixels (block_edge=8 -> 64 pixels < 128)."""
    return min(128, cfg.block_pixels)


def _fitter_kernel(cfg, tmp_ref, noise_ref, w_ref, mm_ref):
    F = cfg.feature_count
    B = cfg.buffer_count
    bp = cfg.block_pixels
    lo = cfg.features_not_scaled_count
    n_sc = cfg.features_scaled_count

    data = tmp_ref[:].astype(jnp.float32)          # [C, B, bp]

    # --- per-block min/max scaling (opencl/bmfr.cl:511-542) ---
    sub = data[:, lo:F, :]
    bmin = jnp.min(sub, axis=-1)                   # [C, n_sc]
    bmax = jnp.max(sub, axis=-1)
    mm_ref[:] = jnp.stack([bmin, bmax], axis=-1)
    denom = jnp.where(jnp.abs(bmax - bmin) > 1.0, bmax - bmin, 1.0)
    scaled = (sub - bmin[..., None]) / denom[..., None]
    data = jnp.concatenate([data[:, :lo, :], scaled, data[:, F:, :]], axis=1)
    # storage round after the in-place rescale (the reference stores the
    # rescaled features back through the half-precision path,
    # opencl/bmfr.cl:536-541)
    data = _quantize(cfg, data)

    # --- regularization noise on feature columns 1..F-1
    #     (opencl/bmfr.cl:625-627; row 0 of noise_ref is zero) ---
    noise = noise_ref[:]                           # [F, bp]
    zeros = jnp.zeros((B - F, bp), jnp.float32)
    data = data + jnp.concatenate([noise, zeros], axis=0)[None, :, :]

    elem = jax.lax.broadcasted_iota(jnp.int32, (1, bp), 1)  # [1, bp]

    # --- Householder QR, F unrolled reflection steps
    #     (opencl/bmfr.cl:549-656) ---
    for col in range(F):
        v = data[:, col, :]                        # [C, bp]
        tail = jnp.where(elem > col, v, 0.0)
        sigma = jnp.sum(tail * tail, axis=-1)      # [C]
        pivot = v[:, col]
        vec_len = jnp.sqrt(sigma + pivot * pivot)
        head = pivot - vec_len
        u_len_sq = sigma + head * head
        u = jnp.where(elem == col, head[:, None], tail)  # [C, bp]

        rest = data[:, col + 1:, :]                # [C, B-col-1, bp]
        dots = jnp.sum(rest * u[:, None, :], axis=-1)    # [C, B-col-1]
        coef = (2.0 / u_len_sq)[:, None, None]
        rest = rest - coef * dots[:, :, None] * u[:, None, :]
        # the reference's per-reflection half re-store
        # (opencl/bmfr.cl:653 via the STORE macro :255-265)
        rest = _quantize(cfg, rest)

        new_col = jnp.where(elem < col, v, 0.0)
        new_col = jnp.where(elem == col, vec_len[:, None], new_col)
        # (avoid zero-size concatenate operands — Mosaic rejects them)
        pieces = [new_col[:, None, :], rest]
        if col > 0:
            pieces.insert(0, data[:, :col, :])
        data = jnp.concatenate(pieces, axis=1)

    # --- export the reduced system. R[row e, col f] = data[:, f, e] lives
    # in the first F lanes; the (tiny) back substitution
    # (opencl/bmfr.cl:659-699) runs outside the kernel as one batched
    # triangular solve — per-element lane extraction is Mosaic-hostile.
    w_ref[:] = data[:, :, :_lanes_out(cfg)]


def fit_blocks_pallas(cfg, tmp_blocks, frame, chunk=DEFAULT_CHUNK):
    """Drop-in replacement for the XLA ``fit_blocks`` (same signature/outputs)."""
    nb = cfg.n_blocks
    B = cfg.buffer_count
    F = cfg.feature_count
    bp = cfg.block_pixels
    n_sc = cfg.features_scaled_count

    if tmp_blocks.dtype == jnp.float16:
        # Mosaic has no f16 vector type; upcast outside the kernel (the
        # values are identical — the storage rounding already happened).
        tmp_blocks = tmp_blocks.astype(jnp.float32)

    noise = feature_noise(frame, F, bp, cfg.buffer_count, cfg.noise_amount)

    nb_pad = ((nb + chunk - 1) // chunk) * chunk
    if nb_pad != nb:
        pad = jnp.ones((nb_pad - nb, B, bp), tmp_blocks.dtype)
        tmp_blocks = jnp.concatenate([tmp_blocks, pad], axis=0)

    grid = (nb_pad // chunk,)
    kernel = functools.partial(_fitter_kernel, cfg)
    lanes = _lanes_out(cfg)

    reduced, mins_maxs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, B, bp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, bp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, B, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, n_sc, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb_pad, B, lanes), jnp.float32),
            jax.ShapeDtypeStruct((nb_pad, n_sc, 2), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(tmp_blocks, noise)

    reduced = reduced[:nb]
    # back substitution (opencl/bmfr.cl:659-699) as a batched triangular
    # solve on the tiny exported system
    R = jnp.triu(jnp.swapaxes(reduced[:, :F, :F], 1, 2))
    rhs = jnp.swapaxes(reduced[:, F:B, :F], 1, 2)
    weights = jax.lax.linalg.triangular_solve(
        R, rhs, left_side=True, lower=False)
    return weights, mins_maxs[:nb]
