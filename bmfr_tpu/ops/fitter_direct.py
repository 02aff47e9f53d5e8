"""Planes-direct fitter: blockwise QR without the block-layout transpose.

Round-2 profiling showed the block layout (`blockify_planes`'s
reshape+transpose of the 52 MB feature volume) costing more device time
than the fit itself (~1.4 ms vs 0.8 ms; docs/PERF_NOTES.md). The
transpose only exists to linearize each 32x32 block's pixels into a
1024-lane vector for the original kernel. This path keeps the feature
volume in image layout end to end:

* per-block min/max + rescale + storage rounding + noise run in XLA as
  strided reductions / block-broadcast elementwise ops over the jittered
  view (no data movement beyond one pad+slice — opencl/bmfr.cl:511-542
  semantics);
* the Pallas kernel fits 8 blocks per step directly on ``[13, 32, 256]``
  windows (one block row x 8 adjacent blocks): per-block reductions are
  one MXU matmul with a block-indicator matrix plus a sublane reduce,
  per-block scalars broadcast back through its transpose — the
  block-pixel index ``e = x_in + 32*y_in`` (opencl/bmfr.cl:89-97) maps
  to (row ``e//32``, lane ``e%32``), so the Householder pivot/tail masks
  become 2-D iota tests;
* the reduced systems come back as each window's row-0 lanes and are
  solved by the same batched triangular solve as the other fitter paths.

Semantics equal ``fit_blocks`` (same scale conditional, noise-once rule,
reflection order, per-reflection storage rounding); equivalence is
pinned in tests/test_fitter_direct.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rng import feature_noise
from .fitter_pallas import _quantize

#: blocks fitted per kernel step (8 x 32 lanes = 2 native lane groups)
CHUNK = 8
LANES = CHUNK * 32

#: export rows: buffer_count (13) padded to the 8-aligned DMA tiling
_EXPORT_ROWS = 16


def _pads_for_direct(cfg):
    """Lane padding of the jittered view to whole chunks."""
    nbx = cfg.blocks_x
    nbx_pad = -(-nbx // CHUNK) * CHUNK
    return nbx_pad, nbx_pad * cfg.block_edge


def scale_view(cfg, view):
    """Per-block min/max rescale of the scaled feature rows, in image
    layout (strided reductions + block-broadcast; bmfr.cl:511-542).

    view: f32 ``[buffer_count, mh, mw_pad]`` jittered feature planes.
    Returns (scaled view, mins_maxs ``f32[n_blocks, n_scaled, 2]``).
    """
    be = cfg.block_edge
    lo = cfg.features_not_scaled_count
    hi = cfg.feature_count
    nby = cfg.blocks_y
    nbx_pad = view.shape[2] // be
    sub = view[lo:hi]
    blocks = sub.reshape(hi - lo, nby, be, nbx_pad, be)
    bmin = blocks.min(axis=(2, 4))            # [n_sc, nby, nbx_pad]
    bmax = blocks.max(axis=(2, 4))
    denom = jnp.where(jnp.abs(bmax - bmin) > 1.0, bmax - bmin, 1.0)
    bmin_px = jnp.repeat(jnp.repeat(bmin, be, axis=1), be, axis=2)
    den_px = jnp.repeat(jnp.repeat(denom, be, axis=1), be, axis=2)
    scaled = (sub - bmin_px) / den_px
    view = jnp.concatenate([view[:lo], scaled, view[hi:]], axis=0)

    mm = jnp.stack([bmin, bmax], axis=-1)     # [n_sc, nby, nbx_pad, 2]
    mm = mm.transpose(1, 2, 0, 3)[:, : cfg.blocks_x]
    return view, mm.reshape(cfg.n_blocks, hi - lo, 2)


def _qr_kernel(cfg, n_chunks, ncx, src_hbm, out_hbm, x, stage, sem_i,
               sem_o):
    F = cfg.feature_count
    B = cfg.buffer_count
    be = cfg.block_edge

    lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, CHUNK), 0)
    bcol = jax.lax.broadcasted_iota(jnp.int32, (LANES, CHUNK), 1)
    G = (lane // be == bcol).astype(jnp.float32)        # [LANES, CHUNK]
    GT = G.T                                            # [CHUNK, LANES]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (be, LANES), 0)
    c_in = jax.lax.broadcasted_iota(jnp.int32, (be, LANES), 1) % be

    def blocksum(m):
        """[rows, LANES] -> per-block sums [rows//be? ...]: here used on
        [be, LANES] or [nf*be, LANES]; returns [..., CHUNK]."""
        return jnp.dot(m, G, preferred_element_type=jnp.float32)

    def body(i, _):
        by = i // ncx
        cx = i % ncx
        di = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(by * be, be), pl.ds(cx * LANES, LANES)],
            x, sem_i)
        di.start()
        di.wait()

        data = x[...]                                   # [B, be, LANES]
        for col in range(F):
            v = data[col]                               # [be, LANES]
            tailm = (r_iota > 0) | (c_in > col)
            tail = jnp.where(tailm, v, 0.0)
            sigma = jnp.sum(blocksum(tail * tail), axis=0)     # [CHUNK]
            pivot = blocksum(
                jnp.where(c_in == col, v, 0.0)[0:1])[0]        # [CHUNK]
            vec_len = jnp.sqrt(sigma + pivot * pivot)
            head = pivot - vec_len
            u_len_sq = sigma + head * head
            head_l = jnp.dot(head[None, :], GT)                # [1,LANES]
            pivm = (r_iota == 0) & (c_in == col)
            u = jnp.where(tailm, v, 0.0) + jnp.where(pivm, head_l, 0.0)

            rest = data[col + 1:]                       # [nf, be, LANES]
            nf = B - col - 1
            prod = (rest * u[None]).reshape(nf * be, LANES)
            dots = blocksum(prod).reshape(nf, be, CHUNK).sum(axis=1)
            dl = jnp.dot(dots, GT)                      # [nf, LANES]
            coef_l = jnp.dot((2.0 / u_len_sq)[None, :], GT)
            rest = rest - (coef_l * dl)[:, None, :] * u[None]
            rest = _quantize(cfg, rest)

            new_col = (jnp.where((r_iota == 0) & (c_in < col), v, 0.0)
                       + jnp.where(pivm, jnp.dot(vec_len[None, :], GT),
                                   0.0))
            pieces = [new_col[None], rest]
            if col > 0:
                pieces.insert(0, data[:col])
            data = jnp.concatenate(pieces, axis=0)

        # row-0 lanes hold the reduced system; pad rows to the 8-aligned
        # DMA tiling
        stage[...] = jnp.concatenate(
            [data[:, 0, :], jnp.zeros((_EXPORT_ROWS - B, LANES),
                                      jnp.float32)], axis=0)
        do = pltpu.make_async_copy(stage, out_hbm.at[i], sem_o)
        do.start()
        do.wait()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def fit_blocks_direct(cfg, view, frame, interpret=None):
    """Fit all blocks from the jittered image-layout feature view.

    view: ``[buffer_count, mh, mw]`` f32 from
    :func:`bmfr_tpu.ops.blockify.blockify_view` (unscaled features +
    accumulated color). Returns (weights ``f32[n_blocks, F, 3]``,
    mins_maxs ``f32[n_blocks, n_scaled, 2]``) like ``fit_blocks``.
    """
    assert cfg.block_edge == 32, "direct fitter requires 32x32 blocks"
    B = cfg.buffer_count
    F = cfg.feature_count
    be = cfg.block_edge
    nby = cfg.blocks_y
    nbx = cfg.blocks_x
    nbx_pad, mw_pad = _pads_for_direct(cfg)
    mh = view.shape[1]

    if view.shape[2] != mw_pad:
        # pad the ragged block columns with ones (fitted then discarded)
        view = jnp.pad(view, ((0, 0), (0, 0), (0, mw_pad - view.shape[2])),
                       constant_values=1.0)

    view, mins_maxs = scale_view(cfg, view)
    view = _quantize(cfg, view)

    # regularization noise, tiled to image layout: noise[f, e] lives at
    # (y % be, x % be) with e = x_in + be*y_in (bmfr.cl:89-97, :625-627)
    noise = feature_noise(frame, F, cfg.block_pixels, B,
                          cfg.noise_amount)              # [F, bp]
    noise_tile = noise.reshape(F, be, be)
    noise_img = jnp.tile(noise_tile, (1, nby, nbx_pad))
    view = view.at[:F].add(noise_img)

    ncx = mw_pad // LANES
    n_chunks = nby * ncx

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(_qr_kernel, cfg, n_chunks, ncx)
    reduced = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_chunks, _EXPORT_ROWS, LANES),
                                       jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((B, be, LANES), jnp.float32),
            pltpu.VMEM((_EXPORT_ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(view)

    # [n_chunks, rows, LANES] -> per-block reduced [n_blocks, B, be]
    red = reduced[:, :B].reshape(nby, ncx, B, CHUNK, be)
    red = red.transpose(0, 1, 3, 2, 4).reshape(nby, nbx_pad, B, be)
    red = red[:, :nbx].reshape(cfg.n_blocks, B, be)

    R = jnp.triu(jnp.swapaxes(red[:, :F, :F], 1, 2))
    rhs = jnp.swapaxes(red[:, F:B, :F], 1, 2)
    weights = jax.lax.linalg.triangular_solve(
        R, rhs, left_side=True, lower=False)
    return weights, mins_maxs
