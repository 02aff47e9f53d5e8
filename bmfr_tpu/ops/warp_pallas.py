"""Pallas TPU kernel: the temporal-reprojection bilinear tap engine.

The three temporal stages (K1 accumulate_noisy, K4 accumulate_filtered, K5
TAA — opencl/bmfr.cl:374-419, :801-832, :929-960) all need the same
primitive: for every pixel, fetch the four bilinear taps of previous-frame
buffers at reprojected coordinates. On GPUs that is a texture fetch; on TPU
a naive ``lax.gather`` runs at ~10 ms per [720,1280] index set on v5e —
two orders of magnitude off budget.

This kernel restructures the warp TPU-natively:

* **Row resolve by candidate shift**: real motion fields are vertically
  bounded — ``src_row = dst_row + dy`` with ``|dy| <= dy_range``. The
  kernel iterates the candidate ``dy`` values (a ``fori`` loop over
  ``2*dy_range+1`` iterations), shifts all source planes by ``dy`` with a
  cheap full-plane roll, and selects rows where the per-pixel integer
  motion matches.

* **Lane resolve by hardware dynamic-gather**: within a shifted plane the
  remaining x-displacement is resolved per 128-lane band with Mosaic's
  ``tpu.dynamic_gather`` (``jnp.take_along_axis`` on ``[H, 128]`` tiles,
  the one shape the v5e VPU gathers natively), trying the three
  neighbouring bands (|dx| < 128).

* **Channel packing**: two bf16 channels ride in each 32-bit lane, halving
  gather work. f32 exactness is available via ``precision="float32"``
  (one channel per lane, bitcast through int32).

Pixels whose motion exceeds (dy_range, 128) get ``valid=False`` — callers
must treat those taps as rejected. The reference would still accept such
taps if the geometry tests passed; for real camera motion at 60 Hz the
ranges are generous, and the `dy_range` is a config knob. Equivalence with
the oracle on in-range motion is tested in tests/test_warp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _pack_pairs_bf16(planes):
    """[C, H, W] f32 -> [ceil(C/2), H, W] int32 with two bf16 per lane."""
    C = planes.shape[0]
    if C % 2:
        planes = jnp.concatenate(
            [planes, jnp.zeros_like(planes[:1])], axis=0)
        C += 1
    lo = planes[0::2].astype(jnp.bfloat16)
    hi = planes[1::2].astype(jnp.bfloat16)
    lo_b = jax.lax.bitcast_convert_type(lo, jnp.uint16).astype(jnp.uint32)
    hi_b = jax.lax.bitcast_convert_type(hi, jnp.uint16).astype(jnp.uint32)
    return (lo_b | (hi_b << 16)).astype(jnp.int32)


def _unpack_pair_bf16(packed):
    """int32 [...,] -> (f32 lo, f32 hi)."""
    u = packed.astype(jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        (u & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16)
    hi = jax.lax.bitcast_convert_type(
        (u >> 16).astype(jnp.uint16), jnp.bfloat16)
    return lo.astype(jnp.float32), hi.astype(jnp.float32)


def _warp_kernel(n_packs, H, W, dy_range, srcs_ref, iy_ref, ix_ref, *outs):
    """One grid step == whole image.

    srcs_ref: int32 [n_packs, H, W] packed source planes.
    iy/ix: int32 [H, W] integer tap coordinates (floor of reprojection).
    outs: n_packs x int32 [2, H, W] (dx=0, dx=1 tap values) + valid u8? —
    valid mask is computed by the caller from iy/ix bounds and dy range.
    """
    n_bands = W // LANES
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    dy_rel = iy_ref[:] - row                      # [H, W]

    # accumulators, one int32 [H, W] per (pack, dx)
    acc = [[jnp.zeros((H, W), jnp.int32) for _ in range(2)]
           for _ in range(n_packs)]
    accs = [a for pair in acc for a in pair]

    def body(d, accs):
        dy = d - dy_range
        ymask = dy_rel == dy                       # [H, W]
        rolled = [pltpu.roll(srcs_ref[p], -dy, 0) for p in range(n_packs)]
        new_accs = list(accs)
        for band in range(n_bands):
            j0 = band * LANES
            gx = ix_ref[:, j0 : j0 + LANES]
            ym_b = ymask[:, j0 : j0 + LANES]
            for qq in (-1, 0, 1):
                sb = band + qq
                if sb < 0 or sb >= n_bands:
                    continue
                rem = gx - sb * LANES
                # dx=0 needs rem in [0, 128); dx=1 needs rem+1 in [0, 128)
                for dx in (0, 1):
                    r = rem + dx
                    sel = ym_b & (r >= 0) & (r < LANES)
                    rc = jnp.clip(r, 0, LANES - 1)
                    for p in range(n_packs):
                        src_band = rolled[p][:, sb * LANES : (sb + 1) * LANES]
                        g = jnp.take_along_axis(src_band, rc, axis=1)
                        idx = p * 2 + dx
                        cur = new_accs[idx]
                        cur_b = cur[:, j0 : j0 + LANES]
                        upd = jnp.where(sel, g, cur_b)
                        new_accs[idx] = jax.lax.dynamic_update_slice(
                            cur, upd, (0, j0))
        return new_accs

    accs = jax.lax.fori_loop(0, 2 * dy_range + 1, body, accs)
    for i, out_ref in enumerate(outs):
        out_ref[:] = accs[i]


def warp_taps_packed(packed_srcs, iy, ix, dy_range=12):
    """Run the warp kernel.

    packed_srcs: int32 [n_packs, H, W]; iy/ix: int32 [H, W] floor tap coords.
    Returns int32 [n_packs, 2, H, W]: per pack, values at (iy+0..1? no —
    (iy, ix+dx) for dx in {0, 1}). The caller calls twice (once with iy,
    once with iy+1) or uses the row dimension... see `warp_bilinear`.
    """
    n_packs, H, W = packed_srcs.shape
    kernel = functools.partial(_warp_kernel, n_packs, H, W, dy_range)
    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_packs),
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.int32)] * (2 * n_packs),
        interpret=jax.default_backend() != "tpu",
    )(packed_srcs, iy, ix)
    return jnp.stack(outs).reshape(n_packs, 2, H, W)


def warp_bilinear_taps(planes, pfx, pfy, dy_range=12, precision="bfloat16"):
    """All four bilinear taps of ``planes`` at reprojected coordinates.

    planes: f32 [C, H, W]; pfx/pfy: f32 [H, W].
    Returns (taps f32 [4, C, H, W] in reference tap order
    ((0,0),(1,0),(0,1),(1,1) — opencl/bmfr.cl:359-363), valid bool [4, H, W]
    where False marks taps outside the kernel's motion range — callers must
    reject them).
    """
    C, H, W = planes.shape
    ix = jnp.floor(pfx).astype(jnp.int32)
    iy = jnp.floor(pfy).astype(jnp.int32)

    if precision == "float32":
        packed = jax.lax.bitcast_convert_type(planes, jnp.int32)
        n_packs = C
    else:
        packed = _pack_pairs_bf16(planes)
        n_packs = packed.shape[0]

    row = jnp.arange(H, dtype=jnp.int32)[:, None]
    col = jnp.arange(W, dtype=jnp.int32)[None, :]

    taps = []
    valids = []
    for dy in (0, 1):
        got = warp_taps_packed(packed, iy + dy, ix, dy_range)  # [P, 2, H, W]
        for dx in (0, 1):
            vals = got[:, dx]
            if precision == "float32":
                tap = jax.lax.bitcast_convert_type(vals, jnp.float32)
            else:
                lo, hi = _unpack_pair_bf16(vals)
                tap = jnp.stack([lo, hi], axis=1).reshape(-1, H, W)[:C]
            taps.append(tap)
            ok = (jnp.abs((iy + dy) - row) <= dy_range) & (
                jnp.abs((ix + dx) - col) < LANES)
            valids.append(ok)
    # reference order: (0,0),(1,0),(0,1),(1,1) = (dy0,dx0),(dy0,dx1),...
    taps = jnp.stack([taps[0], taps[1], taps[2], taps[3]])
    valid = jnp.stack([valids[0], valids[1], valids[2], valids[3]])
    return taps, valid
