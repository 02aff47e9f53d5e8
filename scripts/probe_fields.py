"""Diagnose warp-kernel coverage on the synthetic scene's real
reprojection fields: which constraint fails (y-window, x-window,
scatter conflicts), and what per-tile displacement spreads look like at
candidate tile geometries."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def tile_stats(name, disp, th, tw, H, W):
    """Per-tile spread percentile report for a displacement plane."""
    nh, nw = -(-H // th), -(-W // tw)
    pad = np.full((nh * th, nw * tw), np.nan, np.float32)
    pad[:H, :W] = disp
    t = pad.reshape(nh, th, nw, tw).transpose(0, 2, 1, 3).reshape(nh * nw, -1)
    spread = np.nanmax(t, axis=1) - np.nanmin(t, axis=1)
    spread = spread[~np.isnan(spread)]
    qs = np.percentile(spread, [50, 90, 99, 100])
    print(f"  {name} tile {th}x{tw}: spread p50={qs[0]:.1f} p90={qs[1]:.1f} "
          f"p99={qs[2]:.1f} max={qs[3]:.1f}")
    return spread


def conflict_stats(iy, ix, th, tw, H, W):
    """Within a tile, count source columns claimed by >1 output pixel of
    the same row with different source rows (the scatter-conflict)."""
    iy0 = np.clip(iy, 0, H - 1)
    ixc = np.clip(ix, 0, W - 1)
    n_conf = 0
    n_fold = 0  # same-row pixels sharing a source column at all
    for y0 in range(0, H, th):
        for x0 in range(0, W, tw):
            sy = slice(y0, min(y0 + th, H))
            sx = slice(x0, min(x0 + tw, W))
            for r in range(sy.stop - sy.start):
                cols = ixc[y0 + r, sx]
                rows = iy0[y0 + r, sx]
                order = np.argsort(cols, kind="stable")
                cs, rs = cols[order], rows[order]
                same = cs[1:] == cs[:-1]
                n_fold += int(same.sum())
                n_conf += int((same & (rs[1:] != rs[:-1])).sum())
    return n_conf, n_fold


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

    for t in range(1, 4):
        pfx, pfy = reproject_coords(cfg, pos[t], cams[t - 1], offs[t])
        iy = np.asarray(floor_int(pfy))
        ix = np.asarray(floor_int(pfx))
        row = np.arange(H)[:, None] + np.zeros((1, W), int)
        col = np.arange(W)[None, :] + np.zeros((H, 1), int)
        valid = (iy >= -1) & (iy <= H - 1) & (ix >= -1) & (ix <= W - 1)
        dy = np.where(valid, iy - row, np.nan).astype(np.float32)
        dx = np.where(valid, ix - col, np.nan).astype(np.float32)
        print(f"frame {t}: valid={valid.mean()*100:.1f}%  "
              f"dy range [{np.nanmin(dy):.0f},{np.nanmax(dy):.0f}]  "
              f"dx range [{np.nanmin(dx):.0f},{np.nanmax(dx):.0f}]")
        for th, tw in [(16, 1280), (16, 256), (16, 128), (8, 128)]:
            tile_stats("dy", dy, th, tw, H, W)
            tile_stats("dx", dx, th, tw, H, W)
        nc, nf = conflict_stats(iy, ix, 16, 256, H, W)
        print(f"  scatter conflicts (16x256): {nc} px, folds: {nf} px "
              f"({nc/(H*W)*100:.3f}% / {nf/(H*W)*100:.3f}%)")


if __name__ == "__main__":
    main()
