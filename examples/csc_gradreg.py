#!/usr/bin/env python
"""Impulse-noise denoising with gradient-regularised CSC.

Equivalent of the reference's examples/scripts/csc/implsden_grd_clr.py
pattern on a synthetic grayscale image: the lowpass component is
represented by gradient-regularised coefficient maps (an impulse
filter with a smoothness penalty) appended to the learned filters, so
no separate tikhonov pre-filtering pass is needed.  Solved through the
``accel`` API (``sporco.cuda.cbpdngrd`` parity) which routes to the
fused spatial driver.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=64, Nd=8, M=8, iters=100):
    from sporco_tpu import accel
    from sporco_tpu.models import cbpdn as mc
    from sporco_tpu.utils.util import convdicts
    from sporco_tpu.utils.metric import psnr

    rng = np.random.default_rng(12345)
    # piecewise-smooth test image + salt & pepper noise
    x = np.linspace(-1, 1, N, dtype=np.float32)
    img = 0.5 + 0.5 * np.tanh(8 * (np.hypot(*np.meshgrid(x, x)) - 0.5))
    noisy = img.copy()
    spots = rng.random((N, N))
    noisy[spots < 0.03] = 0.0
    noisy[spots > 0.97] = 1.0

    D0 = convdicts()["G:8x8x32"][..., :M].astype(np.float32)
    # append an impulse filter whose (gradient-penalised) coefficient
    # map carries the smooth component
    imp = np.zeros((Nd, Nd, 1), np.float32)
    imp[0, 0, 0] = 1.0
    D = np.concatenate([D0, imp], axis=-1)
    wgrd = np.zeros(M + 1, np.float32)
    wgrd[-1] = 1.0          # penalise only the impulse map's gradient
    wl1 = np.ones((1, 1, 1, 1, M + 1), np.float32)
    wl1[..., -1] = 0.0      # and exempt it from the sparsity penalty

    opt = mc.ConvBPDNGradReg.options(max_iter=iters, rel_stop_tol=1e-4)
    X = np.asarray(accel.cbpdngrd(D, noisy, 2e-2, 1e1, opt=opt,
                                  wgrd=wgrd, wl1=wl1))
    b = mc.ConvBPDNGradReg(D, noisy, 2e-2, mu=1e1, opt=opt, wgrd=wgrd,
                           wl1=wl1)
    b.solve()
    rec = np.asarray(b.reconstruct()).squeeze()
    print(f"impulse-denoise: noisy PSNR {psnr(img, noisy):.2f} dB -> "
          f"denoised PSNR {psnr(img, rec):.2f} dB "
          f"(X nnz {(np.abs(X) > 1e-5).sum()})")
    return rec


if __name__ == "__main__":
    main()
