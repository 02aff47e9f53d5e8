"""Planes-direct fused fitter: feature build + scale + noise + blockwise
QR straight from the jittered image view — no block-layout transpose, no
13-plane feature volume in HBM.

Round-2/3 xplane traces showed the block layout (`blockify_planes`'s
reshape+copy+reshape of the 52 MB feature volume) costing ~1.2 ms/frame
— more than the fit itself (0.8 ms) — purely to linearize each 32x32
block's pixels into a 1024-lane vector (docs/PERF_NOTES.md). This path
never builds that volume: the kernel DMAs 32-row slabs of the *raw*
jittered planes (normals, positions, accumulated color — 9 planes,
36 MB) and runs the complete K1-store -> scale -> noise -> QR chain of
opencl/bmfr.cl per block in VMEM:

* feature evaluation (opencl/bmfr.cl:447-453) uses the same
  FEATURE_REGISTRY as every other path, applied to the slab rows;
* the K1 store contract (NaN->0, half clamp + rounding,
  opencl/bmfr.cl:455-476) is applied in-kernel;
* per-block min/max (opencl/bmfr.cl:511-542) reduces sublanes then the
  32-lane block segments with masked log-step lane rolls, leaving every
  lane of a segment holding its block's value — so the rescale needs no
  scatter-back and the mins/maxs export is a strided lane slice;
* the regularization noise (opencl/bmfr.cl:625-627) arrives as a
  VMEM-resident lane-tiled table (the block-pixel index
  ``e = x_in + 32*y_in`` maps to (sublane ``e//32``, lane ``e%32``));
* Householder reflections (opencl/bmfr.cl:549-656) keep pixels in the
  2-D (32 sublanes x 32-lane segment) layout: per-block reductions are
  an exact-f32 sublane sum + segment-roll butterfly (_seg_allsum),
  leaving each block's scalar replicated across its lanes so no
  broadcast-back is needed. (An earlier MXU indicator-matmul reduction
  was retired round 4: its default precision rounds operands to bf16 —
  catastrophic for the normal equations, silently lossy for the QR —
  and its exact HIGHEST variant costs 6 MXU passes, +0.7 ms/frame.);
* the reduced systems come back in each block's sublane-0 lanes and are
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

from ..features import FEATURE_REGISTRY
from ..rng import feature_noise
from .fitter_pallas import _quantize

#: blocks fitted per kernel step (16 x 32 lanes = 4 native lane groups)
CHUNK = 16
LANES = CHUNK * 32

#: export rows: buffer_count (13) padded to the 8-aligned DMA tiling
_EXPORT_ROWS = 16

#: Fetch slack of the jitter-origin DMA path: Mosaic requires dynamic
#: copy origins provably (8, 128)-aligned and (8, 128)-multiple sizes
#: (scripts/probe_dma_align.py), so the kernel fetches
#: ``[be + 8, LANES + 128]`` windows from the aligned-down origin and
#: removes the residual with two in-kernel rolls. The jitter origins
#: are in [0, 30] at defaults (blockify.jitter_origin), so the row
#: residual is < 8 and the lane residual < 128 always.
DMA_SLACK = (8, 128)


def _pads_for_direct(cfg):
    """Lane padding of the jittered view to whole chunks."""
    nbx = cfg.blocks_x
    nbx_pad = -(-nbx // CHUNK) * CHUNK
    return nbx_pad, nbx_pad * cfg.block_edge


def _norm_view_origin(cfg, view9, origin, mw_pad):
    """Normalize the (view, origin) calling contract.

    ``origin=None``: ``view9`` is the pre-sliced jittered view
    (``blockify_view``), fetched from (0, 0) with exact static tile
    origins — constant-pad ragged lane columns as before. Returns
    ``(view9, org4, rolled=False)`` with ``org4`` zeros.

    Otherwise ``view9`` is the mirror-padded planes (``blockify_padded``
    with ``slack=DMA_SLACK``) and ``origin`` the ``jitter_origin``
    i32[2]; the jitter rides the tile DMA origins, aligned down to
    (8, 128) with the residual removed by in-kernel rolls. Returns
    ``(view9, org4, rolled=True)`` where ``org4`` is
    ``[oy_aligned, ox_aligned, row_resid, lane_resid]``."""
    nby = cfg.blocks_y
    if origin is None:
        if view9.shape[2] != mw_pad:
            view9 = jnp.pad(
                view9, ((0, 0), (0, 0), (0, mw_pad - view9.shape[2])),
                constant_values=1.0)
        return view9, jnp.zeros((4,), jnp.int32), False
    assert view9.shape[1] >= nby * cfg.block_edge + DMA_SLACK[0] and \
        view9.shape[2] >= mw_pad + DMA_SLACK[1], (view9.shape, mw_pad)
    origin = origin.astype(jnp.int32)
    org_al = origin & ~jnp.asarray([7, 127], jnp.int32)
    return view9, jnp.concatenate([org_al, origin - org_al]), True


def _seg_reduce(x, op, be):
    """Reduce each ``be``-lane segment of the last axis with ``op``,
    leaving the segment value in every lane: masked log-step suffix
    pass, then a masked prefix pass (rolls never cross segments)."""
    lanes = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) % be
    sh = 1
    while sh < be:
        y = pltpu.roll(x, shift=lanes - sh, axis=x.ndim - 1)  # y[l]=x[l+sh]
        x = jnp.where(lane < be - sh, op(x, y), x)
        sh *= 2
    sh = 1
    while sh < be:
        y = pltpu.roll(x, shift=sh, axis=x.ndim - 1)          # y[l]=x[l-sh]
        x = jnp.where(lane >= sh, op(x, y), x)
        sh *= 2
    return x


def _seg_allsum(x, be):
    """Exact f32 sum within each ``be``-lane segment of the last axis,
    every lane ending with its segment's total: log-step recursive
    doubling over segment-cyclic shifts (two global rolls + a boundary
    select per step). Replaces the indicator-matmul block reduction —
    the default MXU pass rounds operands to bf16, whose lost mantissa
    cancels catastrophically in the normal equations (the round-4
    full-res cholesky parity collapse: 1077/1152 blocks NaN->zeroed),
    and the exact ``Precision.HIGHEST`` matmul costs 6 MXU passes
    (+0.7 ms/frame measured). The roll butterfly is exact f32 on the
    VPU at ~2*log2(be) cheap lane permutes."""
    lanes = x.shape[-1]
    ax = x.ndim - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, ax) % be
    sh = 1
    while sh < be:
        a = pltpu.roll(x, shift=lanes - sh, axis=ax)   # a[l] = x[l+sh]
        b = pltpu.roll(x, shift=be - sh, axis=ax)      # b[l] = x[l+sh-be]
        x = x + jnp.where(lane < be - sh, a, b)
        sh *= 2
    return x


def _seg_bcast_from(x, r, be):
    """Broadcast the value at lane offset ``r`` of every ``be``-lane
    segment to all lanes of its segment (log-step doubling; ``r`` is
    static)."""
    lanes = x.shape[-1]
    ax = x.ndim - 1
    if r:
        x = pltpu.roll(x, shift=lanes - r, axis=ax)    # y[l] = x[l+r]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, ax) % be
    sh = 1
    while sh < be:
        y = pltpu.roll(x, shift=sh, axis=ax)           # y[l] = x[l-sh]
        x = jnp.where(lane >= sh, y, x)
        sh *= 2
    return x


def _build_block_data(cfg, raw, noise_vmem, want_basis, r_iota_unused=None):
    """The shared front half of every direct kernel: K1 feature build +
    store contract + per-block scale + regularization noise on one
    ``[9, be, LANES]`` chunk. Returns ``(data, basis, rmin, rmax)``
    (``basis`` is None unless ``want_basis``)."""
    F = cfg.feature_count
    B = cfg.buffer_count
    be = cfg.block_edge
    lo = cfg.features_not_scaled_count

    n3 = raw[0:3]
    p3 = raw[3:6]
    accum = raw[6:9]

    # K1 feature build + store contract (bmfr.cl:447-476)
    rows = [FEATURE_REGISTRY[name](n3, p3)
            for name in cfg.all_features]
    feat_f32 = jnp.stack(rows, axis=0)                  # [F, be, LANES]
    data = jnp.concatenate([feat_f32, accum], axis=0)   # [B, be, LANES]
    data = jnp.where(jnp.isnan(data), 0.0, data)
    if cfg.tmp_data_dtype == "float16":
        data = jnp.clip(data, -65504.0, 65504.0)
    data = _quantize(cfg, data)

    # per-block min/max + rescale (bmfr.cl:511-542); after _seg_reduce
    # every lane of a block segment holds its block's min/max, so the
    # rescale is pure elementwise
    sub = data[lo:F]                                    # [n_sc, be, LANES]
    rmin = _seg_reduce(jnp.min(sub, axis=1), jnp.minimum, be)
    rmax = _seg_reduce(jnp.max(sub, axis=1), jnp.maximum, be)
    denom = jnp.where(jnp.abs(rmax - rmin) > 1.0, rmax - rmin, 1.0)
    scaled = (sub - rmin[:, None, :]) / denom[:, None, :]
    basis = None
    if want_basis:
        # K3's reconstruction basis: the reference's weighted_sum
        # RECOMPUTES the features per pixel from the raw f32
        # normals/positions buffers (opencl/bmfr.cl:724-729) and
        # rescales in registers with K2's mins_maxs — so the basis is
        # built from the PRE-quantize f32 feature rows, never from the
        # stored-precision data. Under float32 tmp this is identical to
        # the stored rows; under float16/bfloat16 tmp it keeps the
        # fused reconstruct equal to weighted_sum_image (only the
        # min/max come from the quantized store, as in the reference).
        sc32 = (feat_f32[lo:F] - rmin[:, None, :]) / denom[:, None, :]
        basis = jnp.concatenate([feat_f32[:lo], sc32], axis=0)
    data = jnp.concatenate([data[:lo], scaled, data[F:]], axis=0)
    data = _quantize(cfg, data)

    # regularization noise (bmfr.cl:625-627; lane-tiled, row 0 zero)
    data = data + jnp.concatenate(
        [noise_vmem[...],
         jnp.zeros((B - F, be, LANES), jnp.float32)], axis=0)
    return data, basis, rmin, rmax


def _dma_in(rolled, ncx, be, org_smem, src_hbm, x2, sem_i, i, slot):
    """Input window DMA of one ``[9, be, LANES]`` chunk (shared by the
    QR and Cholesky kernels). With ``rolled``, the per-frame jitter
    rides the DMA origin: the fetch starts at the (8, 128)-aligned-down
    origin with a ``DMA_SLACK``-enlarged shape — Mosaic rejects dynamic
    origins it cannot prove aligned (scripts/probe_dma_align.py) — and
    :func:`_unroll_window` removes the residual in VMEM, so the caller
    never materializes the 36 MB jittered view copy."""
    by = i // ncx
    cx = i % ncx
    if rolled:
        src = src_hbm.at[
            :, pl.ds(pl.multiple_of(org_smem[0] + by * be, 8),
                     be + DMA_SLACK[0]),
            pl.ds(pl.multiple_of(org_smem[1] + cx * LANES, 128),
                  LANES + DMA_SLACK[1])]
    else:
        src = src_hbm.at[:, pl.ds(by * be, be),
                         pl.ds(cx * LANES, LANES)]
    return pltpu.make_async_copy(src, x2.at[slot], sem_i.at[slot])


def _unroll_window(rolled, be, org_smem, x2, slot):
    """Remove the DMA alignment residual: two in-kernel rolls + slice
    (no-op on the exact static-origin path)."""
    raw = x2[slot]
    if not rolled:
        return raw                                      # [9, be, LANES]
    rows = be + DMA_SLACK[0]
    lanes = LANES + DMA_SLACK[1]
    raw = pltpu.roll(raw, shift=rows - org_smem[2], axis=1)
    raw = pltpu.roll(raw, shift=lanes - org_smem[3], axis=2)
    return raw[:, :be, :LANES]


def _qr_kernel(cfg, n_chunks, ncx, reconstruct, rolled, org_smem,
               src_hbm, noise_vmem, *refs):
    if reconstruct:
        (recon_hbm, x2, fstage, sem_i, sem_f) = refs
    else:
        (out_hbm, mm_hbm, x2, stage, mmstage, sem_i, sem_o,
         sem_m) = refs
    F = cfg.feature_count
    B = cfg.buffer_count
    be = cfg.block_edge
    lo = cfg.features_not_scaled_count
    n_sc = cfg.features_scaled_count

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (be, LANES), 0)
    c_in = jax.lax.broadcasted_iota(jnp.int32, (be, LANES), 1) % be

    dma_in = functools.partial(_dma_in, rolled, ncx, be, org_smem,
                               src_hbm, x2, sem_i)
    dma_in(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_chunks)
        def _():
            dma_in(i + 1, 1 - slot).start()

        dma_in(i, slot).wait()
        raw = _unroll_window(rolled, be, org_smem, x2, slot)
        data, basis, rmin, rmax = _build_block_data(
            cfg, raw, noise_vmem, want_basis=reconstruct)
        if not reconstruct:
            mmstage[...] = jnp.concatenate(
                [rmin, rmax,
                 jnp.zeros((_EXPORT_ROWS - 2 * n_sc, LANES),
                           jnp.float32)], axis=0)

        # Householder QR (bmfr.cl:549-656). All per-block reductions and
        # broadcasts run as exact-f32 segment rolls (lane-replicated
        # [1, LANES] scalars) — see _seg_allsum for why not the MXU.
        for col in range(F):
            v = data[col]                               # [be, LANES]
            tailm = (r_iota > 0) | (c_in > col)
            tail = jnp.where(tailm, v, 0.0)
            sigma = _seg_allsum(jnp.sum(tail * tail, axis=0,
                                        keepdims=True), be)  # [1, LANES]
            pivot = _seg_bcast_from(v[0:1], col, be)          # [1, LANES]
            vec_len = jnp.sqrt(sigma + pivot * pivot)
            head = pivot - vec_len
            u_len_sq = sigma + head * head
            pivm = (r_iota == 0) & (c_in == col)
            u = jnp.where(tailm, v, 0.0) + jnp.where(pivm, head, 0.0)

            rest = data[col + 1:]                       # [nf, be, LANES]
            dots = _seg_allsum(jnp.sum(rest * u[None], axis=1),
                               be)                      # [nf, LANES]
            rest = rest - ((2.0 / u_len_sq) * dots)[:, None, :] * u[None]
            rest = _quantize(cfg, rest)

            new_col = (jnp.where((r_iota == 0) & (c_in < col), v, 0.0)
                       + jnp.where(pivm, vec_len, 0.0))
            pieces = [new_col[None], rest]
            if col > 0:
                pieces.insert(0, data[:col])
            data = jnp.concatenate(pieces, axis=0)

        if not reconstruct:
            # sublane-0 lanes hold the reduced system
            stage[...] = jnp.concatenate(
                [data[:, 0, :], jnp.zeros((_EXPORT_ROWS - B, LANES),
                                          jnp.float32)], axis=0)
            do = pltpu.make_async_copy(stage, out_hbm.at[i], sem_o)
            dm = pltpu.make_async_copy(mmstage, mm_hbm.at[i], sem_m)
            do.start()
            dm.start()
            do.wait()
            dm.wait()
            return 0

        # In-kernel back substitution + reconstruction (K3 fused).
        # The reduced system sits in sublane 0: R[r, c] at lane offset
        # r of channel c, (Q^T b)[r, ch] at lane offset r of channel
        # F+ch — solve R w = Q^T b per block (opencl/bmfr.cl:657-712),
        # then color = sum_f w[f] * basis[f] (bmfr.cl:724-747), all
        # without leaving VMEM.
        redl = data[:, 0, :]                            # [B, LANES]
        Rrows = []                                      # [F][B, LANES]
        for r in range(F):
            Rrows.append(_seg_bcast_from(redl, r, be))
        w = [None] * F
        for c in reversed(range(F)):
            acc = Rrows[c][F:B]                         # y[c]: [3, LANES]
            for c2 in range(c + 1, F):
                acc = acc - Rrows[c][c2][None] * w[c2]
            w[c] = acc / Rrows[c][c][None]              # [3, LANES]

        color = jnp.zeros((3, be, LANES), jnp.float32)
        for f in range(F):
            color = color + basis[f][None] * w[f][:, None, :]
        fstage[...] = jnp.maximum(color, 0.0)
        df = pltpu.make_async_copy(fstage, recon_hbm.at[
            :, pl.ds((i // ncx) * be, be),
            pl.ds((i % ncx) * LANES, LANES)], sem_f)
        df.start()
        df.wait()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def fit_blocks_direct(cfg, view9, frame, interpret=None, origin=None):
    """Fit all blocks from the raw jittered image-layout planes.

    view9: ``[9, mh, mw]`` f32 from ``blockify_view`` over the
    concatenated (normals, positions, accumulated color) planes —
    *unquantized*; the K1 store contract runs in-kernel. With
    ``origin`` (``jitter_origin`` i32[2]), ``view9`` is instead the
    ``blockify_padded`` planes and the jitter rides the tile DMA
    origins. Returns (weights ``f32[n_blocks, F, 3]``, mins_maxs
    ``f32[n_blocks, n_scaled, 2]``) like ``fit_blocks``.
    """
    assert cfg.block_edge == 32, "direct fitter requires 32x32 blocks"
    B = cfg.buffer_count
    F = cfg.feature_count
    be = cfg.block_edge
    n_sc = cfg.features_scaled_count
    nby = cfg.blocks_y
    nbx = cfg.blocks_x
    nbx_pad, mw_pad = _pads_for_direct(cfg)
    view9, origin, rolled = _norm_view_origin(cfg, view9, origin, mw_pad)
    in_shape = ((2, 9, be + DMA_SLACK[0], LANES + DMA_SLACK[1])
                if rolled else (2, 9, be, LANES))

    # lane-tiled noise: noise[f, e] lives at (sublane e//be, lane e%be)
    # in every block segment (bmfr.cl:89-97, :625-627)
    noise = feature_noise(frame, F, cfg.block_pixels, B,
                          cfg.noise_amount)              # [F, bp]
    noise_lanes = jnp.tile(noise.reshape(F, be, be), (1, 1, CHUNK))

    ncx = mw_pad // LANES
    n_chunks = nby * ncx

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(_qr_kernel, cfg, n_chunks, ncx, False,
                               rolled)
    reduced, mm = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, _EXPORT_ROWS, LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, _EXPORT_ROWS, LANES),
                                 jnp.float32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  # HBM-pinned: under pl.ANY Mosaic may promote the
                  # 46 MB source into VMEM, where the dynamic-origin
                  # window DMA cannot lower
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM(in_shape, jnp.float32),
            pltpu.VMEM((_EXPORT_ROWS, LANES), jnp.float32),
            pltpu.VMEM((_EXPORT_ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(origin, view9, noise_lanes)

    # [n_chunks, rows, LANES] -> per-block reduced [n_blocks, B, be]
    red = reduced[:, :B].reshape(nby, ncx, B, CHUNK, be)
    red = red.transpose(0, 1, 3, 2, 4).reshape(nby, nbx_pad, B, be)
    red = red[:, :nbx].reshape(cfg.n_blocks, B, be)

    # mins/maxs: every lane of a segment holds the block value
    mmv = mm[:, :2 * n_sc, ::be]                        # [nc, 12, CHUNK]
    mmv = (mmv.reshape(nby, ncx, 2, n_sc, CHUNK)
           .transpose(0, 1, 4, 3, 2).reshape(nby, nbx_pad, n_sc, 2))
    mins_maxs = mmv[:, :nbx].reshape(cfg.n_blocks, n_sc, 2)

    R = jnp.triu(jnp.swapaxes(red[:, :F, :F], 1, 2))
    rhs = jnp.swapaxes(red[:, F:B, :F], 1, 2)
    weights = jax.lax.linalg.triangular_solve(
        R, rhs, left_side=True, lower=False)
    return weights, mins_maxs


def fit_reconstruct_direct(cfg, view9, frame, interpret=None,
                           origin=None):
    """Fully fused K2+K3: fit every block AND reconstruct the filtered
    color in one kernel pass — back substitution and the weighted sum
    run in VMEM right after the QR, so no reduced-system export, no
    XLA triangular solve, no image-space feature re-evaluation, no
    block-weight upsample (the ~0.85 ms/frame ``weighted_sum_image``
    path disappears; docs/PERF_NOTES.md round 3).

    view9: ``[9, mh, mw]`` f32 from ``blockify_view`` (normals,
    positions, accumulated color) — or, with ``origin``
    (``jitter_origin`` i32[2]), the ``blockify_padded`` planes with the
    jitter riding the tile DMA origins. Returns the filtered color in
    the jittered margins-grid view layout ``f32[3, mh, mw_pad]``; the
    caller slices the image window back out with the inverse jitter
    (same mapping as unblockify_planes / opencl/bmfr.cl:718-722).
    """
    assert cfg.block_edge == 32, "direct fitter requires 32x32 blocks"
    B = cfg.buffer_count
    F = cfg.feature_count
    be = cfg.block_edge
    nby = cfg.blocks_y
    nbx_pad, mw_pad = _pads_for_direct(cfg)
    view9, origin, rolled = _norm_view_origin(cfg, view9, origin, mw_pad)
    in_shape = ((2, 9, be + DMA_SLACK[0], LANES + DMA_SLACK[1])
                if rolled else (2, 9, be, LANES))

    noise = feature_noise(frame, F, cfg.block_pixels, B,
                          cfg.noise_amount)              # [F, bp]
    noise_lanes = jnp.tile(noise.reshape(F, be, be), (1, 1, CHUNK))

    ncx = mw_pad // LANES
    n_chunks = nby * ncx

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(_qr_kernel, cfg, n_chunks, ncx, True,
                               rolled)
    recon = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, nby * be, mw_pad),
                                       jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  # HBM-pinned: under pl.ANY Mosaic may promote the
                  # 46 MB source into VMEM, where the dynamic-origin
                  # window DMA cannot lower
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(in_shape, jnp.float32),
            pltpu.VMEM((3, be, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(origin, view9, noise_lanes)
    return recon


def _chol_kernel(cfg, n_chunks, ncx, rolled, org_smem, src_hbm,
                 noise_vmem, recon_hbm, x2, fstage, sem_i, sem_f):
    """Fused K2+K3 with the normal-equations solver: Gram + rhs via
    exact-f32 segment-roll reductions (:func:`_seg_allsum` — the
    default-precision MXU indicator matmul's bf16 rounding cancelled to
    negative pivots on near-degenerate blocks, NaN-zeroing 93% of a
    full-res frame), a lane-parallel 13x13 Cholesky on lane-replicated
    per-block scalars, and the in-VMEM reconstruction — the
    ``solver="cholesky"`` semantics of :func:`bmfr_tpu.ops.fitter.
    cholesky_weights` (mathematically the same least-squares solution
    as the QR path, opencl/bmfr.cl:549-699) at ~10x less VPU work than
    the 13-reflection Householder loop."""
    F = cfg.feature_count
    B = cfg.buffer_count
    be = cfg.block_edge

    dma_in = functools.partial(_dma_in, rolled, ncx, be, org_smem,
                               src_hbm, x2, sem_i)
    dma_in(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_chunks)
        def _():
            dma_in(i + 1, 1 - slot).start()

        dma_in(i, slot).wait()
        raw = _unroll_window(rolled, be, org_smem, x2, slot)
        data, basis, _rmin, _rmax = _build_block_data(
            cfg, raw, noise_vmem, want_basis=True)

        # Per-block Gram rows + rhs: row f of [A; b]^T [A; b] restricted
        # to the needed triangle — prod over the remaining channels,
        # reduced exactly per block segment (sublane sum + roll
        # butterfly), lane-replicated. [B-f, LANES] per row.
        rows = []                                       # [F][B-f, LANES]
        for f in range(F):
            rest = data[f:]                             # [B-f, be, LANES]
            rows.append(_seg_allsum(
                jnp.sum(rest * data[f][None], axis=1), be))

        def at(f1, f2):
            # Gram/rhs entry (f1 <= f2): row f1, offset f2 - f1
            return rows[f1][f2 - f1]                    # [LANES]

        # Lane-parallel Cholesky G = L L^T over the lane-replicated
        # per-block scalars (cholesky_weights semantics; NaN -> 0
        # below). Vector ops are full-width regardless, so the 32x
        # lane redundancy is free.
        L = [[None] * F for _ in range(F)]
        for j in range(F):
            d = at(j, j)
            for k in range(j):
                d = d - L[j][k] * L[j][k]
            L[j][j] = jnp.sqrt(d)
            for i2 in range(j + 1, F):
                v = at(j, i2)
                for k in range(j):
                    v = v - L[i2][k] * L[j][k]
                L[i2][j] = v / L[j][j]

        # Solve L y = c, L^T w = y for the 3 color channels.
        w = []                                          # [F][3, LANES]
        for ch in range(3):
            y = [None] * F
            for i2 in range(F):
                v = at(i2, F + ch)
                for k in range(i2):
                    v = v - L[i2][k] * y[k]
                y[i2] = v / L[i2][i2]
            x = [None] * F
            for i2 in reversed(range(F)):
                v = y[i2]
                for k in range(i2 + 1, F):
                    v = v - L[k][i2] * x[k]
                x[i2] = v / L[i2][i2]
            w.append(x)
        # w[ch][f]: [LANES], already lane-replicated per block;
        # singular blocks (NaN) -> zero weights
        wl = []                                         # [F][3, LANES]
        for f in range(F):
            wf = jnp.stack([w[0][f], w[1][f], w[2][f]], axis=0)
            wl.append(jnp.where(jnp.isnan(wf), 0.0, wf))

        color = jnp.zeros((3, be, LANES), jnp.float32)
        for f in range(F):
            color = color + basis[f][None] * wl[f][:, None, :]
        fstage[...] = jnp.maximum(color, 0.0)
        df = pltpu.make_async_copy(fstage, recon_hbm.at[
            :, pl.ds((i // ncx) * be, be),
            pl.ds((i % ncx) * LANES, LANES)], sem_f)
        df.start()
        df.wait()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def fit_reconstruct_cholesky(cfg, view9, frame, interpret=None,
                             origin=None):
    """Fully fused K2+K3 with ``solver="cholesky"`` semantics (see
    :func:`_chol_kernel`). Same layout contract as
    :func:`fit_reconstruct_direct`."""
    assert cfg.block_edge == 32, "direct fitter requires 32x32 blocks"
    B = cfg.buffer_count
    F = cfg.feature_count
    be = cfg.block_edge
    nby = cfg.blocks_y
    nbx_pad, mw_pad = _pads_for_direct(cfg)
    view9, origin, rolled = _norm_view_origin(cfg, view9, origin, mw_pad)
    in_shape = ((2, 9, be + DMA_SLACK[0], LANES + DMA_SLACK[1])
                if rolled else (2, 9, be, LANES))

    noise = feature_noise(frame, F, cfg.block_pixels, B,
                          cfg.noise_amount)              # [F, bp]
    noise_lanes = jnp.tile(noise.reshape(F, be, be), (1, 1, CHUNK))

    ncx = mw_pad // LANES
    n_chunks = nby * ncx

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(_chol_kernel, cfg, n_chunks, ncx, rolled)
    recon = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, nby * be, mw_pad),
                                       jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  # HBM-pinned: under pl.ANY Mosaic may promote the
                  # 46 MB source into VMEM, where the dynamic-origin
                  # window DMA cannot lower
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(in_shape, jnp.float32),
            pltpu.VMEM((3, be, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(origin, view9, noise_lanes)
    return recon
