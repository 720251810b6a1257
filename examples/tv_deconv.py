#!/usr/bin/env python
"""Total-variation deconvolution and l1-TV denoising.

Equivalents of the reference's examples/scripts/tv/tvl2dcn_den.py
(TV-l2 deconvolution of a blurred, noisy image -- a pointwise DFT
solve per iteration) and tv/tvl1den_gry.py (TV-l1 denoising, robust to
salt & pepper noise).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=128, iters=200):
    from sporco_tpu.models import tv
    from sporco_tpu.utils.metric import psnr

    rng = np.random.default_rng(12345)
    img = np.zeros((N, N), np.float32)
    img[N // 4:3 * N // 4, N // 4:3 * N // 4] = 1.0
    img[3 * N // 8:5 * N // 8, 3 * N // 8:5 * N // 8] = 0.5

    # blur + gaussian noise, then TV-l2 deconvolve
    h = np.ones((5, 5), np.float32) / 25.0
    Hf = np.fft.rfft2(h, s=(N, N))
    blurred = np.fft.irfft2(np.fft.rfft2(img) * Hf, s=(N, N))
    noisy = (blurred
             + 0.02 * rng.standard_normal((N, N))).astype(np.float32)
    opt = tv.TVL2Deconv.options(max_iter=iters, rel_stop_tol=1e-4)
    b = tv.TVL2Deconv(h, noisy, lmbda=5e-3, opt=opt)
    b.solve()
    rec = np.asarray(b.getmin()).squeeze()
    print(f"TVL2Deconv: blurred PSNR {psnr(img, noisy):.2f} dB -> "
          f"{psnr(img, rec):.2f} dB in {len(b.getitstat())} iters")

    # salt & pepper noise, then TV-l1 denoise
    sp = img.copy()
    m = rng.random((N, N))
    sp[m < 0.05] = 0.0
    sp[m > 0.95] = 1.0
    opt1 = tv.TVL1Denoise.options(max_iter=iters, rel_stop_tol=1e-4)
    b1 = tv.TVL1Denoise(sp.astype(np.float32), lmbda=0.8, opt=opt1)
    b1.solve()
    rec1 = np.asarray(b1.getmin()).squeeze()
    print(f"TVL1Denoise: corrupted PSNR {psnr(img, sp):.2f} dB -> "
          f"{psnr(img, rec1):.2f} dB in {len(b1.getitstat())} iters")
    return rec, rec1


if __name__ == "__main__":
    main()
