"""Probe: per-tile select-depth demand and neighbor-claim fold rates on
the real (synthetic-orbit) reprojection fields.

Answers two round-3 design questions for the warp kernel:
 1. bucket mix — joint histogram of per-tile (s_max, t_max) at 16x256
    tiles, i.e. how many tiles fit a (KY, KX) in {(4,6?),(8,12),(16,20)};
 2. channel-pair packing viability — with ch-pair packed words the x+1
    tap resolves from window column p+1, which requires the row claim at
    p+1 to equal the pixel's own row selector (after a one-step gap
    fill). Counts pixels that fail that but were served by the current
    x-pair scheme.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

TH, TC = 16, 256
KY, KX = 16, 20


def tile_stats(iy, ix, H, W):
    nty, ntx = -(-H // TH), -(-W // TC)
    NT = nty * ntx
    pad_y, pad_x = nty * TH - H, ntx * TC - W

    def tiles(a, fill):
        a = np.pad(a, ((0, pad_y), (0, pad_x)), constant_values=fill)
        return (a.reshape(nty, TH, ntx, TC).transpose(0, 2, 1, 3)
                .reshape(NT, TH, TC))

    row = np.arange(H, dtype=np.int64)[:, None]
    col = np.arange(W, dtype=np.int64)[None, :]
    valid = (iy >= -1) & (iy <= H - 1) & (ix >= -1) & (ix <= W - 1)
    b = np.clip(iy, -1, H - 1)
    ixc = np.clip(ix, 0, W - 1)
    BIG = 1 << 30
    d = b - (row % TH)                  # row selector base
    dx = ixc - (col % TC)               # col selector base

    vt = tiles(valid, False)
    dt = tiles(np.where(valid, d, BIG), BIG)
    dxt = tiles(np.where(valid, dx, BIG), BIG)

    dmin = dt.reshape(NT, -1).min(1)
    dmin[dmin >= BIG] = 0
    xo = dxt.reshape(NT, -1).min(1)
    xo[xo >= BIG] = 0

    s = np.where(vt, dt - dmin[:, None, None], -1)
    t = np.where(vt, dxt - xo[:, None, None], -1)
    in_win = vt & (s >= 0) & (s < KY) & (t >= 0) & (t < KX)
    s_max = np.where(in_win, s, -1).reshape(NT, -1).max(1)
    t_max = np.where(in_win, t, -1).reshape(NT, -1).max(1)

    # claim map u[loc, p], p = lx + t in [0, TC + KX)
    SW = TC + KX
    u = np.full((NT, TH, SW), -1, np.int64)
    lx = np.arange(TC)[None, :]
    p = np.where(in_win, lx + t, -1)
    for j in range(KX):
        sel = p - lx == j
        cj = np.where(sel & in_win, s, -1)
        shifted = np.full_like(u[:, :, :TC], -1)
        u_sl = u[:, :, j:j + TC]
        np.maximum(u_sl, cj, out=u_sl)
    served_old = in_win & (np.take_along_axis(
        u.reshape(NT * TH, SW),
        np.clip(p, 0, SW - 1).reshape(NT * TH, TC), axis=1)
        .reshape(NT, TH, TC) == s)

    # one-step gap fill to the right: u[q] = u[q-1] where unclaimed
    uf = u.copy()
    unc = uf[:, :, 1:] < 0
    uf[:, :, 1:] = np.where(unc, uf[:, :, :-1], uf[:, :, 1:])
    pn = np.clip(p + 1, 0, SW - 1).reshape(NT * TH, TC)
    u_at_n = np.take_along_axis(uf.reshape(NT * TH, SW), pn, axis=1)\
        .reshape(NT, TH, TC)
    served_new = served_old & (u_at_n == s)

    return dict(
        s_max=s_max, t_max=t_max,
        n_valid=int(vt.sum()),
        unc_old=int((vt & ~served_old).sum()),
        unc_new=int((vt & ~served_new).sum()),
    )


def main():
    from bmfr_tpu.config import BMFRConfig
    from bmfr_tpu.io.fixtures import synthetic_sequence
    from bmfr_tpu.ops.gather import floor_int
    from bmfr_tpu.ops.reproject import reproject_coords

    H, W = 720, 1280
    cfg = BMFRConfig(image_width=W, image_height=H).validate()
    sc = synthetic_sequence(width=W, height=H, frames=8)
    pos = jnp.asarray(np.moveaxis(sc["positions"], -1, 1))
    cams = jnp.asarray(sc["camera_matrices"])
    offs = jnp.asarray(sc["pixel_offsets"])

    @jax.jit
    def field(p, c, o):
        pfx, pfy = reproject_coords(cfg, p, c, o)
        return floor_int(pfy), floor_int(pfx)

    all_sm, all_tm = [], []
    for f in range(1, 8):
        iy, ix = field(pos[f], cams[f - 1], offs[f])
        st = tile_stats(np.asarray(iy).astype(np.int64),
                        np.asarray(ix).astype(np.int64), H, W)
        all_sm.append(st["s_max"])
        all_tm.append(st["t_max"])
        print(f"frame {f}: unc_old={st['unc_old']} "
              f"unc_new={st['unc_new']} "
              f"(+{st['unc_new'] - st['unc_old']}) of {st['n_valid']}")

    sm = np.concatenate(all_sm)
    tm = np.concatenate(all_tm)
    print("\ns_max percentiles:",
          {q: int(np.percentile(sm, q)) for q in (25, 50, 75, 90, 95, 99, 100)})
    print("t_max percentiles:",
          {q: int(np.percentile(tm, q)) for q in (25, 50, 75, 90, 95, 99, 100)})
    for ky, kx in [(2, 4), (4, 6), (4, 8), (6, 8), (8, 10), (8, 12),
                   (12, 16), (16, 20)]:
        fit = ((sm < ky) & (tm < kx)).mean()
        print(f"  fits ({ky:2d},{kx:2d}): {fit:6.1%}")


if __name__ == "__main__":
    main()
