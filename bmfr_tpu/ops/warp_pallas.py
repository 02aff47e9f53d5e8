"""Fused Pallas temporal-warp kernel — the clipped row-pair gather of all
recurrent channels in one pass, replacing XLA's gather ops.

The reference resolves its temporal taps in-kernel at full memory
parallelism (opencl/bmfr.cl:374-419, :801-832, :929-960). On this TPU
stack XLA lowers the equivalent gather to ~6-9 ns/index serial loops
(~6 ms per gather op at 1280x720 amortized — docs/PERF_NOTES.md), which
round 1 left as the dominant frame cost. This kernel exploits what the
XLA gather cannot: *temporal reprojection is coherent*. Measured on real
reprojection fields (scripts/probe_fields.py), per-16x256-tile
displacement spread is p50 ~3 px and p99 ~13-19 px, so almost every
pixel resolves from a small per-tile window:

  1. per tile, DMA a motion-bounded window of the packed source into
     VMEM at an (8, 128)-ALIGNED origin — Mosaic requires provably
     aligned dynamic copy origins (see "Mosaic facts" below; an exact
     unaligned-origin variant, "v4", never compiled on hardware),
  2. two in-kernel dynamic rolls (``pltpu.roll`` with traced shifts,
     ~noise-level cost) remove the 8-row / 128-lane alignment slack so
     the window lines up with the tile's true origin,
  3. resolve the source row with shifted-sublane-slice selects driven by
     a per-source-column selector plane (``row1`` rides along as the
     ``k+1`` slice — source padding makes ``row1 = row0 + 1`` always),
  4. resolve the source column with shifted-lane-slice selects driven by
     a per-pixel relative-displacement plane,

all dense VPU work at vector throughput, with the select depth chosen
per tile from size classes (`lax.switch`) so gentle tiles pay only a few
select layers.

Exactness: the kernel path is bit-identical to the XLA gather for every
*covered* pixel. Pixels the per-axis decomposition cannot serve —
window misses, and "fold" conflicts where two pixels of one row claim
the same source column with different source rows (~0.5% of pixels on
real fields) — are detected in the XLA-side plan, compacted tile-major,
their exact values recomputed with a small K-index gather, and MERGED
INSIDE the kernel as each output tile is staged (two one-hot factors on
the MXU; round-5 replaced the post-hoc XLA scatter, whose serialized
updates + 59 MB layout-copy chain owned 0.66 ms/frame of device span —
BENCH 4.058 -> 3.395 ms). Heavier frames
rescatter on top under ``lax.cond``; if the uncovered count exceeds all
fix-up tiers (camera teleports), the whole frame falls back to the
exact XLA gather — so the kernel is bit-identical to ``gather_planes``
everywhere, for every pixel whose taps the pipeline consumes, at every
coverage level.

The source is the same x-pair-packed int32 representation as warp mode
``packed_x_bf16`` (two bf16 horizontal taps per 32-bit lane): one
resolved word per (row, pixel) yields both horizontal taps, and the
caller's unpack/mask logic is shared verbatim with the XLA packed mode.

Mosaic facts this kernel is built on (measured; scripts/probe_v5.py,
scripts/probe_dma_align.py, docs/PERF_NOTES.md): grid steps cost ~37 us
(hence one invocation with a ``fori_loop`` over tiles at ~1.3 us each);
dynamic HBM->VMEM copy origins MUST be provably (8, 128)-aligned — wrap
them in ``pl.multiple_of`` — and dynamic-origin slice sizes must be
(8, 128)-multiples; Mosaic rejects anything else at compile time
(probe_dma_align.py — a round-3 "v4" kernel briefly used exact
unaligned origins based on a dead-code-eliminated measurement of that
probe and never compiled on hardware; the alignment slack is instead
removed with two in-kernel rolls); two-axis dynamic DMA offsets work;
``pltpu.roll`` accepts traced shifts; ``lax.switch`` on an SMEM scalar
selects between unrolled bodies.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Tile geometry: output tiles resolved per fori step.
TH = 16
TC = 256

#: Fixed select depths. A pixel is kernel-covered when its row selector
#: s is in [0, KY) and its column selector t is in [0, KX); the in-kernel
#: dynamic sublane/lane rolls remove the DMA-alignment slack, so these
#: cover the measured p99 per-tile displacement spread (~13 y / ~19 x on
#: real fields needs KX wiggle; outliers go to the fix-up path). Depth is
#: static because Mosaic flattens data-dependent vector branches — an
#: adaptive lax.switch pays every class for every tile (measured).
KY = 16
KX = 20

#: Window extents: rows >= TH + KY + row1 slot + 8-alignment slack,
#: lanes >= TC + KX + 128-alignment slack + roll headroom.
WH = 48
TW = 512

#: Top padding of the source in rows: guarantees the padded row index
#: b + P_T - loc is nonnegative for b >= -1, so window origins never
#: clamp against 0 (b = clip(iy, -1, H-1); row -1 / row H are don't-care
#: taps served from the zero padding).
P_T = 24

#: Left padding of the source in lanes: the column window origin
#: xo = min(ixc - lx) can reach -(TC - 1) for leftward motion, so the
#: 128-aligned DMA origin can reach -256.
P_L = 256

#: Fix-up capacity: compacted uncovered pixels per frame. Real fields
#: show ~3.4-3.9k conflict/miss pixels on steady frames
#: (scripts/bench_warp.py); the search and scatter both scale with K,
#: and overflow falls back to the exact full gather — so 2x headroom.
FIXUP_K = 8192

#: In-kernel fix-up slab: lanes of the per-tile transported fix-entry
#: window. The steady-tier entries are compacted tile-major, so a
#: tile's entries are one contiguous run of the transport array; the
#: kernel DMAs a fixed [16, FSLAB] window at the run's start aligned
#: down to 128 lanes (Mosaic's dynamic-origin constraint), so runs of
#: up to FSLAB - 128 entries per tile are servable in-kernel. Measured
#: steady-frame per-tile maxima on the orbit scene are ~220 px
#: (scripts/probe_fields.py fields; bench mean uncovered ~2.3k/frame)
#: — ~1.7x headroom; larger runs ride the heavy-tier condition.
FSLAB = 512

# A plain python int, NOT a jnp scalar: a module-level jax array that a
# traced function closes over is exactly the kind of cross-trace constant
# JAX's trace caches can corrupt (observed: after an eager interpret-mode
# shard_map, a later scan trace picked this const up as a stale
# ShardMapTracer/JitTracer — 'must override: ShardMapTracer').
_BIG = 2**30


def _ceil(a, m):
    return -(-a // m) * m


class _WarpPlan(NamedTuple):
    """Static geometry + per-frame tensors feeding the kernel."""

    src_pad: jnp.ndarray    # [C, Hp, Wp] i32 packed source, zero-padded
    sel: jnp.ndarray        # [NT*2*TH, TW] i32: per tile, u rows then t rows
    wo: jnp.ndarray         # [NT] i32 window row origins (8-aligned)
    xo128: jnp.ndarray      # [NT] i32 window lane DMA origins (128-aligned)
    ra: jnp.ndarray         # [NT] i32 lane roll amounts in [0, 127]
    resid: jnp.ndarray      # [NT] i32 sublane roll amounts in [0, 7]
    s_max: jnp.ndarray      # [NT] i32 max covered row selector per tile
    t_max: jnp.ndarray      # [NT] i32 max covered column selector per tile
    uncovered: jnp.ndarray  # [H, W] bool — needs the fix-up path
    n_uncovered: jnp.ndarray  # [] i32


def _tiles(x, nty, ntx, fill):
    """[H, W] -> [nty*ntx, TH, TC] with padding."""
    H, W = x.shape
    xp = jnp.pad(x, ((0, nty * TH - H), (0, ntx * TC - W)),
                 constant_values=fill)
    return (xp.reshape(nty, TH, ntx, TC).transpose(0, 2, 1, 3)
            .reshape(nty * ntx, TH, TC))


def _untile(x, nty, ntx, H, W):
    """[nty*ntx, TH, TC] -> [H, W]."""
    return (x.reshape(nty, ntx, TH, TC).transpose(0, 2, 1, 3)
            .reshape(nty * TH, ntx * TC)[:H, :W])


def _shift_lanes(x, j, fill):
    """x[..., l] -> x[..., l - j] (j >= 0 static), zero-history fill."""
    if j == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (j,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-j]], axis=-1)


def _unshift_lanes(x, j, fill):
    """x[..., l] -> x[..., l + j] (j >= 0 static)."""
    if j == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (j,), fill, x.dtype)
    return jnp.concatenate([x[..., j:], pad], axis=-1)


def _plan(src_packed, iy, ix):
    """XLA-side index preprocessing: per-tile window origins and size
    classes, the per-source-column row-selector plane (scattered with
    static lane shifts), the per-pixel column selector, and the
    per-pixel coverage mask. Pure vector int math, no gathers."""
    i32 = jnp.int32
    C, H, W = src_packed.shape
    nty, ntx = -(-H // TH), -(-W // TC)
    NT = nty * ntx
    Hp = _ceil(P_T + H + WH, 8)
    Wp = _ceil(P_L + max(W, TC) + TW - 128, 128)

    row = jnp.arange(H, dtype=i32)[:, None]
    col = jnp.arange(W, dtype=i32)[None, :]
    valid = (iy >= -1) & (iy <= H - 1) & (ix >= -1) & (ix <= W - 1)
    b = jnp.clip(iy, -1, H - 1)
    ixc = jnp.clip(ix, 0, W - 1)
    loc = row % TH
    lx = col % TC

    d = b + P_T - loc          # padded-space row selector base
    dx = ixc - lx              # column selector base (absolute)

    vt = _tiles(valid, nty, ntx, False)
    dt = _tiles(jnp.where(valid, d, _BIG), nty, ntx, _BIG)
    dxt = _tiles(jnp.where(valid, dx, _BIG), nty, ntx, _BIG)

    def tmin(x):
        m = jnp.min(x.reshape(NT, -1), axis=1)
        return jnp.where(m >= _BIG, 0, m)

    dmin = tmin(dt)                                   # [NT]
    wo = jnp.clip(dmin & ~i32(7), 0, Hp - WH)
    resid = dmin - wo                                 # [0, 7]
    # column origin may be negative (leftward motion); the left padding
    # keeps the 128-aligned DMA origin in range
    xo = jnp.clip(tmin(dxt), -P_L, Wp - P_L - TW)
    xo128 = jnp.clip(xo & ~i32(127), -P_L, Wp - P_L - TW)
    ra = xo - xo128                                   # [0, 127]

    dmin_t = dmin[:, None, None]
    xo_t = xo[:, None, None]
    # the kernel's sublane/lane rolls remove the alignment slack, so the
    # selectors are relative to the exact per-tile minima
    s = jnp.where(vt, dt - dmin_t, -1)                # [NT, TH, TC]
    t = jnp.where(vt, dxt - xo_t, -1)

    in_win = vt & (s >= 0) & (s < KY) & (t >= 0) & (t < KX)
    s_max = jnp.max(jnp.where(in_win, s, -1).reshape(NT, -1), axis=1)
    t_max = jnp.max(jnp.where(in_win, t, -1).reshape(NT, -1), axis=1)

    # Row-selector scatter: u[loc, lx + t] = s of the claiming pixel.
    # Static lane shifts over the column depth; claims never cross tile
    # boundaries (positions lx + t <= TC - 1 + KX).
    SW = TC + KX
    sclaim = jnp.where(in_win, s, -1)
    spad = jnp.pad(sclaim, ((0, 0), (0, 0), (0, SW - TC)),
                   constant_values=-1)
    tpad = jnp.pad(jnp.where(in_win, t, -1),
                   ((0, 0), (0, 0), (0, SW - TC)), constant_values=-1)
    u = jnp.full((NT, TH, SW), -1, i32)
    for j in range(KX):
        cj = jnp.where(tpad == j, spad, -1)
        u = jnp.maximum(u, _shift_lanes(cj, j, i32(-1)))

    # Per-pixel claim consistency: the kernel serves position lx + t with
    # u there; a pixel whose s lost the claim goes to fix-up.
    u_at = jnp.full((NT, TH, SW), -1, i32)
    for j in range(KX):
        u_at = jnp.where(tpad == j, _unshift_lanes(u, j, i32(-1)), u_at)
    served = in_win & (u_at[:, :, :TC] == s)

    uncovered_t = vt & ~served
    uncovered = _untile(uncovered_t, nty, ntx, H, W)
    n_uncovered = jnp.sum(uncovered.astype(i32))

    # Kernel selector planes: u indexed by pre-roll window lane
    # (position lx + t, roll applied to the window in-kernel), t by
    # output pixel. Non-claims select nothing.
    u_sel = jnp.pad(u, ((0, 0), (0, 0), (0, TW - SW)), constant_values=-1)
    t_sel = jnp.pad(jnp.where(served, t, -1),
                    ((0, 0), (0, 0), (0, TW - TC)), constant_values=-1)
    sel = jnp.concatenate([u_sel, t_sel], axis=1).reshape(NT * 2 * TH, TW)

    src_pad = jnp.pad(src_packed,
                      ((0, 0), (P_T, Hp - P_T - H), (P_L, Wp - P_L - W)))

    # the kernel's DMA lane origin is in padded coordinates
    return _WarpPlan(src_pad=src_pad, sel=sel, wo=wo,
                     xo128=(xo128 + P_L).astype(i32), ra=ra.astype(i32),
                     resid=resid.astype(i32), s_max=s_max.astype(i32),
                     t_max=t_max.astype(i32),
                     uncovered=uncovered, n_uncovered=n_uncovered)


def _warp_kernel(C, nty, ntx,
                 wo_ref, ra_ref, resid_ref,
                 src_hbm, sel_hbm, out_hbm,
                 win, sel, stage, sem_w, sem_s, sem_o):
    NT = nty * ntx

    def body(i, _):
        wo = pl.multiple_of(wo_ref[i], 8)
        xo = pl.multiple_of(ra_ref[NT + i], 128)  # [ra ; xo128] packed
        dw = pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(wo, WH), pl.ds(xo, TW)], win, sem_w)
        dw.start()
        ds = pltpu.make_async_copy(
            sel_hbm.at[pl.ds(i * 2 * TH, 2 * TH), :], sel, sem_s)
        ds.start()
        dw.wait()
        ds.wait()

        # two dynamic rolls remove the DMA-alignment slack, aligning the
        # window to the tile's exact minimum displacement in both axes
        ra = ra_ref[i]
        rs = resid_ref[i]
        winr = pltpu.roll(win[...], shift=TW - ra, axis=2)
        winr = pltpu.roll(winr, shift=WH - rs, axis=1)
        u = sel[0:TH][None]
        t = sel[TH:2 * TH, :TC][None]

        acc0 = jnp.zeros((C, TH, TW), jnp.int32)
        acc1 = jnp.zeros((C, TH, TW), jnp.int32)
        for k in range(KY):
            cmp = u == k
            acc0 = jnp.where(cmp, winr[:, k:k + TH, :], acc0)
            acc1 = jnp.where(cmp, winr[:, k + 1:k + 1 + TH, :], acc1)

        o0 = jnp.zeros((C, TH, TC), jnp.int32)
        o1 = jnp.zeros((C, TH, TC), jnp.int32)
        for j in range(KX):
            cmpj = t == j
            o0 = jnp.where(cmpj, acc0[:, :, j:j + TC], o0)
            o1 = jnp.where(cmpj, acc1[:, :, j:j + TC], o1)
        stage[0] = o0
        stage[1] = o1

        ty = i // ntx
        tx = i % ntx
        do = pltpu.make_async_copy(
            stage,
            out_hbm.at[:, :, pl.ds(ty * TH, TH), pl.ds(tx * TC, TC)],
            sem_o)
        do.start()
        do.wait()
        return 0

    jax.lax.fori_loop(0, NT, body, 0)


def cumsum_mxu(x):
    """Inclusive prefix sum of an i32 vector on the MXU.

    XLA lowers ``jnp.cumsum`` on a 921k vector to a log-step shift
    chain costing ~1.1 ms/frame (scripts/probe_fixup.py). A prefix sum
    is a triangular matmul: reshape to ``[n/128, 128]`` rows, multiply
    by the 128x128 upper-triangular ones matrix for the in-row prefix
    (one MXU pass), and add recursively-prefix-summed row totals.
    Exact while the total stays below 2^24 (f32 integer range) — the
    caller's masks sum to <= H*W = 921600.
    """
    i32 = jnp.int32
    n = x.shape[0]
    L = 128
    if n <= 2 * L:
        return jnp.cumsum(x)
    nr = -(-n // L)
    m = jnp.pad(x, (0, nr * L - n)).reshape(nr, L).astype(jnp.float32)
    tri = (jnp.arange(L)[:, None] <= jnp.arange(L)[None, :]).astype(
        jnp.float32)
    # HIGHEST: recursion levels carry integer values > 2^8, which a
    # default-precision (bf16-pass) MXU matmul could round
    pre = jnp.dot(m, tri, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    rowtot = pre[:, -1].astype(i32)
    off = cumsum_mxu(rowtot) - rowtot
    return (pre.astype(i32) + off[:, None]).reshape(-1)[:n]


def compact_indices(mask_flat, k):
    """First ``k`` indices of set bits in ``mask_flat`` (i32), plus the
    total count. Two-level rank search: `jnp.nonzero` lowers to a
    scatter-add with one update per input element (~8 ms at 921k) and
    `jnp.searchsorted` to log2(n) k-sized gather rounds; here the
    256-element block containing each rank comes from one comparison
    matrix (no gathers) and the in-block position from ONE row-granular
    gather + compare-count — round-5 xplane showed the former 10
    sequential in-block halving gathers (element-granular, dependency-
    chained) owned ~0.25 ms/frame of the compaction's 0.356; the row
    gather vectorizes over lanes and the compare fuses into its reduce.
    The prefix sum itself runs on the MXU (:func:`cumsum_mxu`).
    """
    i32 = jnp.int32
    n = mask_flat.shape[0]
    BS = 256
    nb = -(-n // BS)
    cs = cumsum_mxu(mask_flat.astype(i32))
    total = cs[-1]
    cs_pad = jnp.pad(cs, (0, nb * BS - n), constant_values=cs[-1])
    csb = cs_pad[BS - 1 :: BS]                       # block-end ranks
    q = jnp.arange(1, k + 1, dtype=i32)
    # block of the q-th set bit: #blocks whose end-rank < q. Blocks
    # before it hold only ranks < q; blocks after start at >= q — so
    # global rank position = bidx*BS + in-block count of cs < q.
    bidx = jnp.sum((csb[None, :] < q[:, None]).astype(i32), axis=1)
    rows = cs_pad.reshape(nb, BS)[jnp.clip(bidx, 0, nb - 1)]  # [k, BS]
    pos = bidx * BS + jnp.sum((rows < q[:, None]).astype(i32), axis=1)
    # overflow ranks pad with n-1 (not 0) so the index list stays
    # sorted — the fix-up scatter then runs with indices_are_sorted
    # (padded slots rewrite pixel n-1 with its own bit-identical value)
    idx = jnp.where(q <= total, jnp.clip(pos, 0, n - 1),
                    n - 1).astype(i32)
    return idx, total


def _bf16_lo(u):
    """Low bf16 half of a packed i32 word -> f32 (bit placement)."""
    return jax.lax.bitcast_convert_type(
        (u.astype(jnp.uint32) & jnp.uint32(0xFFFF)) << 16, jnp.float32)


def _bf16_hi(u):
    return jax.lax.bitcast_convert_type(
        u.astype(jnp.uint32) & jnp.uint32(0xFFFF0000), jnp.float32)


#: Output plane indices of the fused blend (see blend_from_taps).
BLEND_PLANES = 13


def blend_from_rows(cfg, row0, row1, cur6, bits, fx, fy):
    """The fused temporal-blend math on x-pair-packed resolved rows.

    row0/row1: i32 ``[16, ...]`` x-pair-packed words at the tap rows
    (prev positions 0:3, normals 3:6, noisy 6:9, spp 9, out 10:13,
    result 13:16 — the pipeline's recurrent stack order). Unpacks the
    horizontal tap pairs and defers to :func:`blend_from_taps`; used by
    the whole-frame fallback (2 XLA gather ops) and as the independent
    reference formulation in tests.
    """
    lo0, hi0 = _bf16_lo(row0), _bf16_hi(row0)
    lo1, hi1 = _bf16_lo(row1), _bf16_hi(row1)
    return blend_from_taps(cfg, lo0, hi0, lo1, hi1, cur6, bits, fx, fy)


def blend_from_taps(cfg, t0, t1, t2, t3, cur6, bits, fx, fy):
    """Resolved f32 tap stacks -> the 13 per-stage blend planes. Shared
    verbatim between the Pallas kernel (in-VMEM), the compact fix-up,
    and the whole-frame fallback, so all three paths agree bitwise.

    t0..t3: f32 ``[16, ...]`` tap values in reference tap order
    ((0,0),(1,0),(0,1),(1,1) — opencl/bmfr.cl:359-363), channel stack
    as in :func:`blend_from_rows`. All paths produce identical values
    because bf16 rounding is per channel scalar, independent of how the
    words were packed (x-pairs or channel-pairs).
    cur6: f32 ``[6, ...]`` current positions 0:3 + normals 3:6.
    bits: i32 mask bitfield — 0..3 K1 tap in-bounds, 4..7 K5 tap masks,
    8 the ix<0 edge: there the +x taps re-read the x-clipped column, so
    t1/t3 fall back to t0/t2 (mirrors opencl/bmfr.cl:380-381 clipping).
    fx/fy: f32 bilinear fractions.

    Output planes: 0-2 K1 weighted prev-color sum, 3 K1 spp sum,
    4 K1/K4 total weight, 5 accept bits, 6-8 K4 weighted out sum,
    9-11 K5 weighted result sum, 12 K5 total weight. Divisions and
    alphas stay downstream (bmfr.cl:421-445, :836-849, :922-967).

    Don't-care domain: at pixels whose reprojection is fully off screen
    (ix/iy < -1 or >= W/H) the K5 sums may differ between the kernel
    (zero padding) and a clipped-gather evaluation — taa's off_screen
    passthrough discards them either way (opencl/bmfr.cl:884-890).
    """
    f32 = jnp.float32
    negb = (((bits >> 8) & 1) > 0)[None]
    taps = (t0, jnp.where(negb, t0, t1),
            t2, jnp.where(negb, t2, t3))

    w = ((1.0 - fx) * (1.0 - fy), fx * (1.0 - fy),
         (1.0 - fx) * fy, fx * fy)

    shape = t0.shape[1:]
    pc = jnp.zeros((3,) + shape, f32)
    spp_sum = jnp.zeros(shape, f32)
    tw = jnp.zeros(shape, f32)
    accept = jnp.zeros(shape, jnp.int32)
    k4 = jnp.zeros((3,) + shape, f32)
    k5 = jnp.zeros((3,) + shape, f32)
    k5w = jnp.zeros(shape, f32)
    pos_lim = f32(cfg.position_limit_squared)
    nrm_lim = f32(cfg.normal_limit_squared)

    for i in range(4):
        t = taps[i]
        inb = ((bits >> i) & 1) > 0
        pd = t[0:3] - cur6[0:3]
        nd = t[3:6] - cur6[3:6]
        ok = (inb
              & ((pd[0] * pd[0] + pd[1] * pd[1] + pd[2] * pd[2])
                 < pos_lim)
              & ((nd[0] * nd[0] + nd[1] * nd[1] + nd[2] * nd[2])
                 < nrm_lim))
        wgt = jnp.where(ok, w[i], 0.0)
        pc = pc + wgt[None] * t[6:9]
        spp_sum = spp_sum + wgt * t[9]
        tw = tw + wgt
        accept = accept | jnp.where(ok, jnp.int32(1 << i), 0)
        k4 = k4 + wgt[None] * t[10:13]
        wm = jnp.where(((bits >> (4 + i)) & 1) > 0, w[i], 0.0)
        k5 = k5 + wm[None] * t[13:16]
        k5w = k5w + wm

    return jnp.concatenate([
        pc, spp_sum[None], tw[None], accept.astype(f32)[None],
        k4, k5, k5w[None]], axis=0)


def _mask_bits(iy, ix, H, W):
    """The per-pixel mask bitfield consumed by blend_from_rows."""
    i32 = jnp.int32
    bits = jnp.zeros(iy.shape, i32)
    from .gather import TAP_OFFSETS, in_bounds

    for i, (dx, dy) in enumerate(TAP_OFFSETS):
        bits |= jnp.where(in_bounds(iy + dy, ix + dx, H, W),
                          i32(1 << i), 0)
    # K5's tap masks (taa's border logic, opencl/bmfr.cl:929-960)
    x_lo = ix >= 0
    x_hi = ix < W - 1
    y_lo = iy >= 0
    y_hi = iy < H - 1
    for i, m in enumerate((y_lo & x_lo, y_lo & x_hi,
                           y_hi & x_lo, y_hi & x_hi)):
        bits |= jnp.where(m, i32(1 << (4 + i)), 0)
    bits |= jnp.where(ix < 0, i32(1 << 8), 0)
    return bits


def _fix_values_at(cfg, plan, cur6, pfxy, yk, xk, H, W):
    """Exact per-point recompute of the 13 blend planes at pixel list
    ``(yk, xk)``: 2-D point gathers of the reprojection pair + cur6
    (gather cost is per op, riders ~free — docs/PERF_NOTES.md), aux
    recomputed at the points, one gather over the 4 concatenated tap
    index sets, then the exact bf16-identical :func:`blend_from_taps`.
    Shared by the in-kernel steady merge and the heavy fix-up tiers, so
    every tier writes bit-identical values.
    """
    from .gather import floor_int

    pfk = pfxy[:, yk, xk]                 # [2, k]
    ixk = floor_int(pfk[0])
    iyk = floor_int(pfk[1])
    fxk = pfk[0] - ixk.astype(jnp.float32)
    fyk = pfk[1] - iyk.astype(jnp.float32)
    bitsk = _mask_bits(iyk, ixk, H, W)
    cur6k = cur6[:, yk, xk]               # [6, k]
    # taps come from the padded source (so the unpadded pack has no
    # consumers and its pad fuses away); 2-D point indexing — the flat
    # `reshape(8, Hp*Wp)[:, flat]` form forced a 47 MB plane-
    # interleaving relayout copy of the source every frame (round-5
    # xplane: 0.065 ms/frame), the 2-D gather reads the T(8,128)
    # source layout in place
    k = yk.shape[0]
    iy0 = jnp.clip(iyk, 0, H - 1) + P_T3
    iy1 = jnp.clip(iyk + 1, 0, H - 1) + P_T3
    ix0 = jnp.clip(ixk, 0, W - 1) + P_L
    ix1 = jnp.clip(ixk + 1, 0, W - 1) + P_L
    yy = jnp.concatenate([iy0, iy0, iy1, iy1])
    xx = jnp.concatenate([ix0, ix1, ix0, ix1])
    words = plan.src_pad[:, yy, xx]
    tv = [_unpack_ch_pairs(words[:, i * k:(i + 1) * k])
          for i in range(4)]
    return blend_from_taps(
        cfg, tv[0], tv[1], tv[2], tv[3], cur6k, bitsk, fxk, fyk)


#: Select-depth phases (KY, KX, roll-window rows): tiles are classed
#: into the smallest phase whose depths cover their per-tile selector
#: spread. Measured on real orbit fields (scripts/probe_spread.py):
#: (4,8) fits ~47% of tiles, (8,12) ~82%, (16,20) all. Mosaic flattens
#: data-dependent vector branches, so depth adaptivity lives in three
#: sequential fori phases over a class-sorted tile list, inside ONE
#: pallas_call (uniform window DMA keeps one global prefetch chain).
DEPTH_PHASES = ((4, 8, 32), (8, 12, 32), (16, 20, 40))

#: Uniform per-tile window rows DMA'd: TH + KY_max + row1 slot + 7 roll
#: slack, ceil to 8. Mosaic REJECTS dynamic copy origins it cannot
#: prove (8, 128)-aligned — measured, scripts/probe_dma_align.py (the
#: v4 "exact unaligned origins" kernel never compiled on hardware; its
#: probe's kernel output was dead-code-eliminated) — so origins are
#: aligned down and the slack removed with two in-kernel rolls.
WH3 = 40

#: Stage-1 lane extent: after the in-kernel rolls only lanes
#: [0, TC + KX_max + 1) = 277 are live; 3 lane groups hold them.
W1 = 384

#: Top padding of the fused kernel's source in rows (b >= -1 and
#: loc <= TH-1 keep b + P_T3 - loc >= 0).
P_T3 = 16


def padded_src_shape(H, W):
    """(Hp, Wp) of the fused kernel's padded ch-pair source layout.
    A recurrent state carried in this layout (pipeline PackedState)
    skips the per-frame 41 MB pad entirely. Wp covers the largest
    128-aligned window origin plus the TW-lane fetch."""
    return (_ceil(P_T3 + H + WH3, 8),
            _ceil(P_L + max(W, TC) + TW - 128, 128))


class _BlendPlan(NamedTuple):
    """Static geometry + per-frame tensors for the fused blend kernel."""

    src_pad: jnp.ndarray    # [8, Hp, Wp] i32 ch-pair packed, zero-padded
    sel_u: jnp.ndarray      # [NT*TH, TW] i32 claim map (window lanes)
    sel_rest: jnp.ndarray   # [NT*4*TH, TC] i32: t, fx, fy, bits rows
    wo: jnp.ndarray         # [NT] i32 window row origins (8-aligned)
    raxo: jnp.ndarray       # [2*NT] i32: lane rolls [0,128) ; DMA origins
    resid: jnp.ndarray      # [NT] i32 sublane rolls [0, 8)
    order: jnp.ndarray      # [NT] i32 tiles sorted by depth class
    bounds: jnp.ndarray     # [4] i32 phase partition of `order`
    uncovered: jnp.ndarray  # [H, W] bool
    uncovered_t: jnp.ndarray  # [NT, TH, TC] bool (tile-major twin)
    n_uncovered: jnp.ndarray  # [] i32
    counts: jnp.ndarray     # [3] i32 tiles per phase


def _plan_blend(src8, iy, ix, fx, fy, bits):
    """XLA-side index preprocessing for the fused blend kernel: per-tile
    window origins and depth classes, the claim map, per-pixel column
    selectors, coverage. Pure vector int math, no gathers.

    ``src8`` is the ch-pair pack, either image-shaped ``[8, H, W]`` (the
    plan pads it) or already in the padded kernel layout ``[8, Hp, Wp]``
    (a PackedState carry — no per-frame pad runs).

    The x+1 taps resolve through a second claim map that is exactly the
    one-lane right shift of the first (``u2[q] = u[q-1]``): a pixel
    claiming its x-tap at window lane ``p`` claims its x+1 tap at
    ``p+1`` with the same row selector — so the shifted map serves it by
    construction and no extra fold class exists. The kernel derives u2
    in-VMEM; only ``u`` is transported.
    """
    i32 = jnp.int32
    H, W = iy.shape
    nty, ntx = -(-H // TH), -(-W // TC)
    NT = nty * ntx
    Hp, Wp = padded_src_shape(H, W)

    row = jnp.arange(H, dtype=i32)[:, None]
    col = jnp.arange(W, dtype=i32)[None, :]
    valid = (iy >= -1) & (iy <= H - 1) & (ix >= -1) & (ix <= W - 1)
    b = jnp.clip(iy, -1, H - 1)
    ixc = jnp.clip(ix, 0, W - 1)
    loc = row % TH
    lx = col % TC

    d = b + P_T3 - loc         # padded-space row selector base
    dx = ixc - lx              # column selector base (absolute)

    vt = _tiles(valid, nty, ntx, False)
    dt = _tiles(jnp.where(valid, d, _BIG), nty, ntx, _BIG)
    dxt = _tiles(jnp.where(valid, dx, _BIG), nty, ntx, _BIG)

    def tmin(x):
        m = jnp.min(x.reshape(NT, -1), axis=1)
        return jnp.where(m >= _BIG, 0, m)

    # selectors are relative to the true per-tile minima; the DMA
    # origins are aligned down to (8, 128) — Mosaic rejects dynamic
    # origins it cannot prove aligned (probe_dma_align.py) — and the
    # kernel removes the slack with two rolls
    dmin = tmin(dt)                                   # [NT]
    wo = jnp.clip(dmin & ~i32(7), 0, Hp - WH3)
    resid = dmin - wo                                 # [0, 7]
    xo = jnp.clip(tmin(dxt), -P_L, Wp - P_L - TW)
    xo128 = jnp.clip(xo & ~i32(127), -P_L, Wp - P_L - TW)
    ra = xo - xo128                                   # [0, 127]

    dmin_t = dmin[:, None, None]
    xo_t = xo[:, None, None]
    s = jnp.where(vt, dt - dmin_t, -1)                # [NT, TH, TC]
    t = jnp.where(vt, dxt - xo_t, -1)

    in_win = jnp.logical_and(
        vt & (s >= 0) & (s < KY), (t >= 0) & (t < KX))
    s_max = jnp.max(jnp.where(in_win, s, -1).reshape(NT, -1), axis=1)
    t_max = jnp.max(jnp.where(in_win, t, -1).reshape(NT, -1), axis=1)

    # Row-selector scatter: u[loc, lx + t] = s of the claiming pixel.
    # The 2*KX shift passes are bandwidth-bound; s and t are tiny ints
    # (< 21, exact in bf16's 8-bit mantissa), so the whole build runs in
    # bf16 at half the bytes and converts to i32 once at the end.
    bf = jnp.bfloat16
    SW = TC + KX
    m1 = bf(-1)
    sclaim = jnp.where(in_win, s.astype(bf), m1)
    spad = jnp.pad(sclaim, ((0, 0), (0, 0), (0, SW - TC)),
                   constant_values=m1)
    tpad = jnp.pad(jnp.where(in_win, t.astype(bf), m1),
                   ((0, 0), (0, 0), (0, SW - TC)), constant_values=m1)
    u = jnp.full((NT, TH, SW), m1, bf)
    for j in range(KX):
        cj = jnp.where(tpad == bf(j), spad, m1)
        u = jnp.maximum(u, _shift_lanes(cj, j, m1))

    # Per-pixel claim consistency: the kernel serves position lx + t
    # with u there; a pixel whose s lost the claim goes to fix-up.
    u_at = jnp.full((NT, TH, SW), m1, bf)
    for j in range(KX):
        u_at = jnp.where(tpad == bf(j), _unshift_lanes(u, j, m1), u_at)
    served = in_win & (u_at[:, :, :TC] == sclaim)
    u = u.astype(i32)

    uncovered_t = vt & ~served
    uncovered = _untile(uncovered_t, nty, ntx, H, W)
    n_uncovered = jnp.sum(uncovered.astype(i32))

    # Depth classes and the phase-sorted tile order.
    cls = jnp.full((NT,), len(DEPTH_PHASES) - 1, i32)
    for p in range(len(DEPTH_PHASES) - 2, -1, -1):
        ky, kx, _ = DEPTH_PHASES[p]
        cls = jnp.where((s_max < ky) & (t_max < kx), i32(p), cls)
    order = jnp.argsort(cls, stable=True).astype(i32)
    counts = jnp.stack(
        [jnp.sum((cls == p).astype(i32)) for p in range(len(DEPTH_PHASES))])
    z = jnp.zeros((), i32)
    bounds = jnp.stack([z, counts[0], counts[0] + counts[1], i32(NT)])

    sel_u = jnp.pad(u, ((0, 0), (0, 0), (0, TW - SW)),
                    constant_values=-1).reshape(NT * TH, TW)
    t_sel = jnp.where(served, t, -1)
    fx_t = jax.lax.bitcast_convert_type(_tiles(fx, nty, ntx, 0.0),
                                        jnp.int32)
    fy_t = jax.lax.bitcast_convert_type(_tiles(fy, nty, ntx, 0.0),
                                        jnp.int32)
    bits_t = _tiles(bits, nty, ntx, 0)
    sel_rest = jnp.concatenate(
        [t_sel, fx_t, fy_t, bits_t], axis=1).reshape(NT * 4 * TH, TC)

    if src8.shape[1:] == (H, W):
        src_pad = jnp.pad(
            src8, ((0, 0), (P_T3, Hp - P_T3 - H), (P_L, Wp - P_L - W)))
    else:
        assert src8.shape[1:] == (Hp, Wp), src8.shape
        src_pad = src8

    return _BlendPlan(
        src_pad=src_pad, sel_u=sel_u, sel_rest=sel_rest, wo=wo,
        raxo=jnp.concatenate([ra, (xo128 + P_L)]).astype(i32),
        resid=resid.astype(i32), order=order, bounds=bounds,
        uncovered=uncovered, uncovered_t=uncovered_t,
        n_uncovered=n_uncovered, counts=counts)


def _unpack_ch_pairs(o):
    """i32 ch-pair words ``[8, ...]`` -> f32 ``[16, ...]`` channel stack
    (inverse of :func:`bmfr_tpu.ops.warp.pack_pairs_bf16`; leading-axis
    reshape only, Mosaic-safe)."""
    lo = _bf16_lo(o)
    hi = _bf16_hi(o)
    return jnp.stack([lo, hi], axis=1).reshape((16,) + o.shape[1:])


def _blend_kernel3(cfg, nty, ntx,
                   bounds_ref, tiles_ref, wo_ref, raxo_ref, resid_ref,
                   fixoff_ref,
                   src_hbm, selu_hbm, selr_hbm, cur_hbm, fix_hbm,
                   out_hbm,
                   win2, selu2, selr2, cur2, fix2, stage,
                   sem_w, sem_u, sem_r, sem_c, sem_f, sem_o):
    """The fused warp+blend kernel: one invocation, three sequential
    select-depth phases over the class-sorted tile list, double-buffered
    input DMAs with one prefetch chain crossing phase boundaries (the
    window DMA shape is uniform; only the roll/select extents differ per
    phase). Per tile: the window DMA starts at the tile's selector
    minima aligned down to (8, 128) (Mosaic rejects dynamic origins it
    cannot prove aligned — probe_dma_align.py), two dynamic rolls remove
    the alignment slack, KY shifted-sublane selects resolve the source
    row (row1 rides as the k+1 slice; the x+1 claims use the one-lane-
    shifted map), KX shifted-lane selects resolve the column, the
    unpacked taps run :func:`blend_from_taps` in-VMEM, the tile's
    steady-tier fix entries merge in (the inline one-hot MXU merge in
    the loop body below), and a double-buffered DMA stores the 13
    planes.
    """
    NT = nty * ntx

    def dmas(k, slot):
        i = tiles_ref[k]
        wo = pl.multiple_of(wo_ref[i], 8)
        xo = pl.multiple_of(raxo_ref[NT + i], 128)
        fo = pl.multiple_of(fixoff_ref[i], 128)
        ty = i // ntx
        tx = i % ntx
        return (
            pltpu.make_async_copy(
                src_hbm.at[:, pl.ds(wo, WH3), pl.ds(xo, TW)],
                win2.at[slot], sem_w.at[slot]),
            pltpu.make_async_copy(
                selu_hbm.at[pl.ds(i * TH, TH), :],
                selu2.at[slot], sem_u.at[slot]),
            pltpu.make_async_copy(
                selr_hbm.at[pl.ds(i * 4 * TH, 4 * TH), :],
                selr2.at[slot], sem_r.at[slot]),
            pltpu.make_async_copy(
                cur_hbm.at[:, pl.ds(ty * TH, TH), pl.ds(tx * TC, TC)],
                cur2.at[slot], sem_c.at[slot]),
            pltpu.make_async_copy(
                fix_hbm.at[:, pl.ds(fo, FSLAB)],
                fix2.at[slot], sem_f.at[slot]),
        )

    for d in dmas(0, 0):
        d.start()

    def make_body(ky, kx, whp):
        def body(k, _):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < NT)
            def _():
                for d in dmas(k + 1, 1 - slot):
                    d.start()

            for d in dmas(k, slot):
                d.wait()

            i = tiles_ref[k]
            ra = raxo_ref[i]
            rs = resid_ref[i]
            winr = pltpu.roll(win2[slot, :, :whp, :], shift=TW - ra,
                              axis=2)
            winr = pltpu.roll(winr, shift=whp - rs, axis=1)
            winr = winr[:, :, :W1]

            u = selu2[slot, :, :W1]
            lane = jax.lax.broadcasted_iota(jnp.int32, (TH, W1), 1)
            u2 = jnp.where(lane == 0, -1, pltpu.roll(u, shift=1, axis=1))
            u = u[None]
            u2 = u2[None]
            t = selr2[slot, 0:TH, :][None]

            z = jnp.zeros((8, TH, W1), jnp.int32)
            acc0, acc1, acc2, acc3 = z, z, z, z
            for k2 in range(ky):
                r0 = winr[:, k2:k2 + TH, :]
                r1 = winr[:, k2 + 1:k2 + 1 + TH, :]
                c0 = u == k2
                c2 = u2 == k2
                acc0 = jnp.where(c0, r0, acc0)
                acc1 = jnp.where(c0, r1, acc1)
                acc2 = jnp.where(c2, r0, acc2)
                acc3 = jnp.where(c2, r1, acc3)

            zc = jnp.zeros((8, TH, TC), jnp.int32)
            o00, o01, o10, o11 = zc, zc, zc, zc
            for j in range(kx):
                cj = t == j
                o00 = jnp.where(cj, acc0[:, :, j:j + TC], o00)
                o01 = jnp.where(cj, acc1[:, :, j:j + TC], o01)
                o10 = jnp.where(cj, acc2[:, :, j + 1:j + 1 + TC], o10)
                o11 = jnp.where(cj, acc3[:, :, j + 1:j + 1 + TC], o11)

            fxp = jax.lax.bitcast_convert_type(
                selr2[slot, TH:2 * TH, :], jnp.float32)
            fyp = jax.lax.bitcast_convert_type(
                selr2[slot, 2 * TH:3 * TH, :], jnp.float32)
            bits = selr2[slot, 3 * TH:4 * TH, :]

            ty = i // ntx
            tx = i % ntx
            dst = out_hbm.at[:, pl.ds(ty * TH, TH), pl.ds(tx * TC, TC)]

            # double-buffered output store: drain the store issued two
            # tiles ago on this stage slot before overwriting it, then
            # fire-and-forget — the serial start();wait() pattern put
            # ~225 DMA latencies on the critical path
            @pl.when(k >= 2)
            def _():
                pltpu.make_async_copy(
                    stage.at[slot], dst, sem_o.at[slot]).wait()

            val = blend_from_taps(
                cfg, _unpack_ch_pairs(o00), _unpack_ch_pairs(o10),
                _unpack_ch_pairs(o01), _unpack_ch_pairs(o11),
                cur2[slot], bits, fxp, fyp)

            # Steady-tier fix merge: the tile's fix entries (values
            # recomputed pre-kernel by the exact fix-up blend) land via
            # two one-hot factors — row one-hot applied on the VPU,
            # column one-hot contracted on the MXU. Each output pixel
            # receives at most ONE entry (positions are unique within
            # a tile), so the "sum" is a single product; the f32 values
            # ride as an exact 3-way bf16 split (the same rounding trap
            # the fitters hit in round 4 — bf16(v1)+bf16(v2)+bf16(v3)
            # reconstructs any finite f32 exactly, and {0,1} one-hots
            # are bf16-exact). Entries of other tiles (and padding,
            # tile id -1) zero out through the validity factor; tiles
            # with NO entries (fixoff's per-tile count half) skip the
            # whole build + contraction — steady-frame entries (~2.3k
            # px) cluster in a fraction of the 225 tiles, and the
            # [40*TH, FSLAB]x[TC, FSLAB] dot costs ~168 MFLOP/tile
            # (~0.19 ms/frame MXU if run on every tile).
            stage[slot] = val

            @pl.when(fixoff_ref[NT + i] > 0)
            def _merge_fix_entries():
                bf = jnp.bfloat16
                f32 = jnp.float32
                fv = fix2[slot]                  # [16, FSLAB] f32
                # rows 13/14/15 carry the entry's tile-local row,
                # column and tile id as plain f32 NUMBERS (exact for
                # ints < 2^24; ours are < 4096). Bitcast int32
                # transport was the round-5 no-op bug: small ints
                # bitcast to f32 are denormals, and the XLA-side
                # pad/concat fusion producing fix_hbm flushes them to
                # zero on TPU (probe_fixhbm.py) — normal-range float
                # encoding is flush-proof.
                er = fv[13:14]                   # [1, FSLAB] f32
                ec = fv[14:15]
                etile = fv[15:16]
                # validity as ARITHMETIC 0/1 (never an i1 vector: a
                # [1, FSLAB] mask born at a sublane-offset slice cannot
                # be relayed out to the replicated broadcast layout —
                # "Invalid relayout ... replicated in destination")
                validf = (1 - jnp.minimum(
                    jnp.abs(etile - i.astype(f32)), 1)).astype(bf)
                eq = lambda a, b: (1 - jnp.minimum(
                    jnp.abs(a - b), 1)).astype(bf)
                # (tpu.iota is integer-only — build i32, convert)
                ohr = eq(er, jax.lax.broadcasted_iota(
                    jnp.int32, (TH, FSLAB), 0).astype(f32)) * validf
                # column one-hot built pre-transposed ([TC, FSLAB], e
                # on lanes — no lane<->sublane reshape) and contracted
                # over lanes on both sides
                ohc = eq(ec, jax.lax.broadcasted_iota(
                    jnp.int32, (TC, FSLAB), 0).astype(f32)) * validf
                vals = fv[0:13]                  # [13, FSLAB] f32
                v1 = vals.astype(bf)
                r1 = vals - v1.astype(f32)
                v2 = r1.astype(bf)
                v3 = (r1 - v2.astype(f32)).astype(bf)
                one = jnp.full((1, FSLAB), 1.0, bf)
                # [(14+13+13), TH, FSLAB] -> one MXU contraction
                tmp = (jnp.concatenate([v1, one, v2, v3], axis=0)
                       [:, None, :] * ohr[None])
                upd = jax.lax.dot_general(
                    tmp.reshape(40 * TH, FSLAB), ohc,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=f32).reshape(40, TH, TC)
                hit = upd[13]
                fixed = upd[0:13] + upd[14:27] + upd[27:40]
                stage[slot] = jnp.where(hit[None] > 0.5, fixed, val)

            pltpu.make_async_copy(
                stage.at[slot], dst, sem_o.at[slot]).start()
            return 0

        return body

    for p, (ky, kx, whp) in enumerate(DEPTH_PHASES):
        jax.lax.fori_loop(bounds_ref[p], bounds_ref[p + 1],
                          make_body(ky, kx, whp), 0)

    # drain the last (up to) two in-flight output stores
    for s in range(min(NT, 2)):
        pltpu.make_async_copy(
            stage.at[s],
            out_hbm.at[:, pl.ds(0, TH), pl.ds(0, TC)],
            sem_o.at[s]).wait()


def warp_blend_pallas(cfg, stacked, cur6, pfx, pfy, *, src8=None,
                      fixup_k=FIXUP_K, interpret=None):
    """Fused temporal warp + per-stage blend.

    stacked: f32 ``[16, H, W]`` recurrent channels (pipeline stack
    order); cur6: f32 ``[6, H, W]`` current positions+normals;
    pfx/pfy: the reprojected coordinates. Returns ``(planes, stats)``:
    the 13 blend planes of :func:`blend_from_taps` as f32 ``[13, H, W]``
    plus an i32 ``[6]`` engagement record ``[n_uncovered, fallback_flag,
    tiles_phase0, tiles_phase1, tiles_phase2, kernel_served_pixels]``.

    ``src8``: optionally the ch-pair bf16 pack of the recurrent stack
    (``pack_pairs_bf16(stacked)``), e.g. a :class:`PackedState` carried
    across frames — then ``stacked`` may be ``None`` and no per-frame
    pack runs (pack(unpack(x)) is the identity on bf16 payloads, so tap
    values are bit-identical either way). It may be image-shaped
    ``[8, H, W]`` or already in the padded kernel layout
    (:func:`padded_src_shape`) — the padded carry also skips the
    per-frame 41 MB pad.

    Three-tier exactness contract on the blended outputs: kernel for
    covered pixels, compact fix-up for window-miss/fold pixels, whole-
    frame XLA fallback on overflow — every tier runs blend_from_taps on
    bit-identical bf16-rounded tap values.
    """
    from .gather import floor_int
    from .warp import gather_taps, pack_pairs_bf16

    i32 = jnp.int32
    H, W = cur6.shape[1:]
    ix = floor_int(pfx)
    iy = floor_int(pfy)
    fx = pfx - ix.astype(jnp.float32)
    fy = pfy - iy.astype(jnp.float32)
    bits = _mask_bits(iy, ix, H, W)

    if src8 is None:
        with jax.named_scope("warp_pack"):
            src8 = pack_pairs_bf16(stacked)          # [8, H, W] i32
    nty, ntx = -(-H // TH), -(-W // TC)
    Hk, Wk = nty * TH, ntx * TC
    with jax.named_scope("warp_plan"):
        plan = _plan_blend(src8, iy, ix, fx, fy, bits)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    cur_pad = jnp.pad(cur6, ((0, 0), (0, Hk - H), (0, Wk - W)))

    # the reprojected-coordinate pair, gathered at the fix-up points
    # and used to RECOMPUTE iy/ix/fx/fy/bits there (round-4 xplane
    # attribution: gathering the 5 precomputed aux planes cost 0.61
    # ms/frame, almost all of it the per-plane reshape(1,-1) relayouts
    # feeding the aux concat — the point-local recompute is identical
    # math on [k] vectors and needs only this 7 MB stack)
    pfxy = jnp.stack([pfx, pfy], axis=0)

    # Steady frames carry ~2-4k uncovered pixels (fold conflicts +
    # window misses); the steady tier merges them INSIDE the kernel
    # (below), the full tier keeps headroom, and a 4x tier absorbs
    # claim-degenerate frames (near-axis-aligned camera angles produce
    # ~25k fold conflicts; measured on the orbit scene's frame 1) at
    # ~3 ms instead of the ~15 ms whole-frame fallback.
    tiers = (fixup_k // 2, fixup_k, 4 * fixup_k)
    NT = nty * ntx

    # ---- steady-tier transport: fix entries merged in-kernel ----
    # Entries are compacted in TILE-major order, so each tile's entries
    # are one contiguous run [a_t, b_t) of the transport array; the
    # kernel DMAs a fixed [16, FSLAB] lane window at a_t aligned down
    # to 128 and filters by the entry's tile id. Values are computed
    # pre-kernel (they depend only on the plan + source, never on the
    # kernel output) by the same _fix_values_at as the heavy tiers, so
    # the merge is bit-identical to a post-hoc scatter — without the
    # scatter's serialized updates and 59 MB relayout copies.
    k0 = tiers[0]
    kpad = -(-k0 // 128) * 128 + FSLAB
    with jax.named_scope("warp_fixup_compact"):
        idx_tm, total_tm = compact_indices(
            plan.uncovered_t.reshape(-1), k0)
        cnt_t = jnp.sum(plan.uncovered_t.astype(i32), axis=(1, 2))
        a_t = jnp.cumsum(cnt_t) - cnt_t                      # [NT]
        fo128 = jnp.clip(a_t & ~i32(127), 0, kpad - FSLAB)
        max_cnt = jnp.max(cnt_t)
    with jax.named_scope("warp_fixup"):
        tile_e = idx_tm // (TH * TC)
        within = idx_tm - tile_e * (TH * TC)
        rr = within // TC
        ty_e = tile_e // ntx
        yk0 = ty_e * TH + rr
        xk0 = (tile_e - ty_e * ntx) * TC + (within - rr * TC)
        fix0 = _fix_values_at(cfg, plan, cur6, pfxy,
                              jnp.minimum(yk0, H - 1),
                              jnp.minimum(xk0, W - 1), H, W)
        # overflow ranks pad with the last in-bounds pixel; tile id -1
        # marks them invalid so the kernel never merges padding (the
        # [k0, kpad) slab slack is padded -1 too — a zero pad would
        # read as tile id 0). Rows 13/14/15 = entry row, column, tile
        # id as plain f32 NUMBERS — int32-bitcast transport flushed to
        # zero in the XLA producer fusion on TPU (denormal patterns;
        # probe_fixhbm.py), float encoding of ints < 2^24 is exact and
        # flush-proof.
        q = jnp.arange(1, k0 + 1, dtype=i32)
        tile_id = jnp.pad(jnp.where(q <= total_tm, tile_e, -1),
                          (0, kpad - k0), constant_values=-1)
        f32 = jnp.float32
        fix_hbm = jnp.concatenate([
            jnp.pad(jnp.concatenate(
                [fix0, rr.astype(f32)[None],
                 (within - rr * TC).astype(f32)[None]], axis=0),
                ((0, 0), (0, kpad - k0))),
            tile_id.astype(f32)[None]], axis=0)              # [16, kpad]
        fixoff = jnp.concatenate([fo128, cnt_t]).astype(i32)

    kernel = functools.partial(_blend_kernel3, cfg, nty, ntx)
    scratch = [
        pltpu.VMEM((2, 8, WH3, TW), jnp.int32),
        pltpu.VMEM((2, TH, TW), jnp.int32),
        pltpu.VMEM((2, 4 * TH, TC), jnp.int32),
        pltpu.VMEM((2, 6, TH, TC), jnp.float32),
        pltpu.VMEM((2, 16, FSLAB), jnp.float32),
        pltpu.VMEM((2, BLEND_PLANES, TH, TC), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    out_shape = jax.ShapeDtypeStruct((BLEND_PLANES, Hk, Wk), jnp.float32)

    # The kernel runs unconditionally (one compiled pallas_call, shared
    # by every fix-up tier; a rare fallback frame wastes its ~1 ms).
    with jax.named_scope("warp_kernel"):
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 6
            + [pl.BlockSpec(memory_space=pl.ANY)] * 5,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(plan.bounds, plan.order, plan.wo, plan.raxo, plan.resid,
          fixoff, plan.src_pad, plan.sel_u, plan.sel_rest, cur_pad,
          fix_hbm)
        blended = out[:, :H, :W]

    def make_fixup(k):
        # Heavy-tier compact fix-up at capacity ``k``: per-point value
        # recompute (:func:`_fix_values_at`) + sorted 2-D scatter into
        # the [13, H, W] kernel output. Only overflow frames (~1 in 60)
        # take this path — steady frames merge in-kernel (see
        # warp_blend_pallas), which killed the scatter's 0.58 ms/frame
        # relayout chain (round-5 xplane: pad 13->16 + two 59 MB layout
        # copies + the serialized 4096-index scatter).
        def fixup(_):
            with jax.named_scope("warp_fixup_compact"):
                idx, _ = compact_indices(plan.uncovered.ravel(), k)
            with jax.named_scope("warp_fixup"):
                yk = idx // W
                xk = idx - yk * W
                fix = _fix_values_at(cfg, plan, cur6, pfxy, yk, xk, H, W)
            with jax.named_scope("warp_fixup_scatter"):
                # idx is sorted, so (yk, xk) is lexicographically
                # sorted; overflow ranks pad with pixel n-1 — duplicate
                # indices, but every duplicate writes the identical
                # recomputed value, so set() is order-independent
                return blended.at[:, yk, xk].set(
                    fix, indices_are_sorted=True)
        return fixup

    def full_fallback(_):
        with jax.named_scope("warp_fallback"):
            # packed-state callers reconstruct the f32 stack from the
            # pack; the x-pair re-pack inside gather_taps re-rounds
            # bf16(bf16(x)) = bf16(x), so taps stay bit-identical
            stk = stacked if stacked is not None else _unpack_ch_pairs(
                plan.src_pad[:, P_T3:P_T3 + H, P_L:P_L + W])
            taps = gather_taps(stk, iy, ix, mode="packed_x_bf16")
            return blend_from_taps(cfg, taps[0], taps[1], taps[2],
                                   taps[3], cur6, bits, fx, fy)

    # The steady tier IS the kernel output: its fix entries merged
    # in-kernel (bit-identical to the post-hoc scatter it replaced).
    # It overflows when the frame exceeds the transport capacity k0 or
    # any single tile's entry run exceeds the aligned slab window —
    # then the heavy tiers rescatter on top (their values repeat the
    # merged subset identically, so layering is order-independent).
    steady_overflow = ((plan.n_uncovered > tiers[0])
                       | (max_cnt > FSLAB - 128))
    in_kernel = plan.n_uncovered <= tiers[-1]
    tier = (steady_overflow.astype(i32)
            + (plan.n_uncovered > tiers[1]).astype(i32)
            + (plan.n_uncovered > tiers[2]).astype(i32))
    impl = getattr(cfg, "warp_tier_impl", "switch")
    if impl == "switch":
        # round-3 structure: one flat lax.switch (not nested conds —
        # every cond level copies its 48 MB plane operands)
        planes = jax.lax.switch(
            tier, [lambda _: blended, make_fixup(tiers[1]),
                   make_fixup(tiers[2]), full_fallback], None)
    elif impl == "steady_only":
        # measurement-only: no overflow handling (a teleport frame
        # keeps stale taps) — bounds the dispatch structure's cost
        planes = blended
    else:  # steady_cond
        def heavy(_):
            t2 = ((plan.n_uncovered > tiers[1]).astype(i32)
                  + (plan.n_uncovered > tiers[2]).astype(i32))
            return jax.lax.switch(
                t2, [make_fixup(tiers[1]), make_fixup(tiers[2]),
                     full_fallback], None)

        planes = jax.lax.cond(
            steady_overflow, heavy, lambda _: blended, None)
    served = jnp.where(in_kernel, i32(H * W) - plan.n_uncovered, i32(0))
    stats = jnp.concatenate([
        plan.n_uncovered[None], (~in_kernel).astype(i32)[None],
        plan.counts, served[None]])
    return planes, stats


def warp_rows_pallas(src_packed, iy, ix, *, fixup_k=FIXUP_K,
                     interpret=None):
    """Clipped row-pair gather of an x-pair-packed source.

    Returns ``(row0, row1)`` — int32 ``[C, H, W]`` each — bit-identical
    to ``gather_planes(src_packed, iy, ix)`` / ``(iy + 1, ix)`` (the two
    gather ops of warp mode ``packed_x_bf16``) for every pixel whose
    corresponding tap is in screen bounds (masked-out taps are
    don't-cares). Kernel + compact fix-up on the fast path; whole-frame
    XLA fallback under ``lax.cond`` when fix-up capacity overflows.
    """
    from .gather import gather_planes

    i32 = jnp.int32
    C, H, W = src_packed.shape
    nty, ntx = -(-H // TH), -(-W // TC)
    plan = _plan(src_packed, iy, ix)
    Hk, Wk = nty * TH, ntx * TC

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(_warp_kernel, C, nty, ntx)

    iy0 = jnp.clip(iy, 0, H - 1)
    iy1 = jnp.clip(iy + 1, 0, H - 1)
    ixc = jnp.clip(ix, 0, W - 1)
    flat0 = (iy0 * W + ixc).ravel()
    flat1 = (iy1 * W + ixc).ravel()
    src_flat = src_packed.reshape(C, H * W)

    def with_fixup(_):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((2, C, Hk, Wk), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((C, WH, TW), jnp.int32),
                pltpu.VMEM((2 * TH, TW), jnp.int32),
                pltpu.VMEM((2, C, TH, TC), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(plan.wo, jnp.concatenate([plan.ra, plan.xo128]),
          plan.resid, plan.src_pad, plan.sel)

        # Compact fix-up: gather the uncovered pixels' exact values and
        # scatter them over the kernel output in one fused 2C-channel
        # scatter (compaction: see compact_indices).
        idx, _ = compact_indices(plan.uncovered.ravel(), fixup_k)
        v = jnp.concatenate(
            [src_flat[:, flat0[idx]], src_flat[:, flat1[idx]]], axis=0)
        rows = out[:, :, :H, :W].reshape(2 * C, H * W)
        rows = rows.at[:, idx].set(v)
        return rows[:C].reshape(C, H, W), rows[C:].reshape(C, H, W)

    def full_fallback(_):
        return (gather_planes(src_packed, iy, ix),
                gather_planes(src_packed, iy + 1, ix))

    return jax.lax.cond(plan.n_uncovered <= fixup_k, with_fixup,
                        full_fallback, None)
