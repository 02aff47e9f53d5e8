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


def _gaussian_kernel(size=11, sigma=1.5):
    r = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-(r * r) / (2.0 * sigma * sigma))
    return k / k.sum()


def _conv_valid(a, k):
    """Separable 'valid' 2-D convolution with a 1-D kernel (no scipy)."""
    n = k.size

    def conv_axis0(x):
        out = np.zeros((x.shape[0] - n + 1,) + x.shape[1:], np.float64)
        for i in range(n):
            out += k[i] * x[i : i + out.shape[0]]
        return out

    return conv_axis0(conv_axis0(a).T).T


def ssim(img, ref, peak=1.0, win_size=11, sigma=1.5):
    """Standard Gaussian-windowed SSIM (Wang et al. 2004): 11x11 window,
    sigma 1.5, K1=0.01, K2=0.03, per channel, averaged — comparable to
    published numbers (the BMFR paper reports SSIM; the reference repo
    computes none, SURVEY.md §4). Pure numpy, no scipy dependency.
    """
    x = np.asarray(img, np.float64)
    y = np.asarray(ref, np.float64)
    if x.ndim == 2:
        x = x[..., None]
        y = y[..., None]
    elif x.shape[0] in (1, 3, 4) and x.shape[-1] not in (1, 3, 4):
        x = np.moveaxis(x, 0, -1)   # accept CHW
        y = np.moveaxis(y, 0, -1)

    k = _gaussian_kernel(win_size, sigma)
    k1, k2 = 0.01, 0.03
    c1 = (k1 * peak) ** 2
    c2 = (k2 * peak) ** 2

    vals = []
    for c in range(x.shape[-1]):
        xc, yc = x[..., c], y[..., c]
        mx = _conv_valid(xc, k)
        my = _conv_valid(yc, k)
        mxx = _conv_valid(xc * xc, k)
        myy = _conv_valid(yc * yc, k)
        mxy = _conv_valid(xc * yc, k)
        vx = mxx - mx * mx
        vy = myy - my * my
        cxy = mxy - mx * my
        s = ((2 * mx * my + c1) * (2 * cxy + c2)) / (
            (mx * mx + my * my + c1) * (vx + vy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))
