"""Image fidelity metrics (PSNR / SSIM).

The reference computes no metrics — the paper reports PSNR/SSIM but the repo
leaves them to the user (SURVEY.md §4). The rebuild makes them first-class:
used by the fidelity harness (BASELINE config 3) to compare against clean
references and between backends/solvers/precisions.
"""

from __future__ import annotations

import numpy as np


def psnr(img, ref, peak=1.0):
    """PSNR in dB over all channels. Inputs any matching-shape arrays."""
    img = np.asarray(img, np.float64)
    ref = np.asarray(ref, np.float64)
    mse = np.mean((img - ref) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


def ssim(img, ref, peak=1.0):
    """Mean SSIM with an 8x8 box window (grayscale of channel mean).

    Lightweight implementation (no scipy dependency); adequate for
    regression tracking.
    """
    x = np.asarray(img, np.float64)
    y = np.asarray(ref, np.float64)
    if x.ndim == 3:
        # accept HWC or CHW
        ch_axis = -1 if x.shape[-1] in (1, 3, 4) else 0
        x = x.mean(axis=ch_axis)
        y = y.mean(axis=ch_axis)

    k1, k2 = 0.01, 0.03
    c1 = (k1 * peak) ** 2
    c2 = (k2 * peak) ** 2
    w = 8

    def box(a):
        H, W = a.shape
        Hc, Wc = H - H % w, W - W % w
        a = a[:Hc, :Wc].reshape(Hc // w, w, Wc // w, w)
        return a.mean(axis=(1, 3))

    mx, my = box(x), box(y)
    mxx, myy, mxy = box(x * x), box(y * y), box(x * y)
    vx = mxx - mx * mx
    vy = myy - my * my
    cxy = mxy - mx * my
    s = ((2 * mx * my + c1) * (2 * cxy + c2)) / (
        (mx * mx + my * my + c1) * (vx + vy + c2))
    return float(s.mean())
