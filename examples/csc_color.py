#!/usr/bin/env python
"""Colour-image convolutional sparse coding: three dictionary options.

Equivalent of the reference's examples/scripts/csc/cbpdn_clr_gd.py
(grayscale dictionary applied per channel), cbpdn_clr_cd.py (colour
dictionary), and cbpdn_clr_pd.py (product of a grayscale convolutional
dictionary and a colour-space basis, via ConvProdDictBPDN).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=64, M=8, iters=60):
    from sporco_tpu.models import cbpdn as mc
    from sporco_tpu.models import pdcsc
    from sporco_tpu.utils.util import convdicts
    from sporco_tpu.utils.metric import psnr

    rng = np.random.default_rng(12345)
    x = np.linspace(-1, 1, N, dtype=np.float32)
    r = np.hypot(*np.meshgrid(x, x))
    img = np.stack([0.5 + 0.4 * np.cos(6 * r),
                    0.5 + 0.4 * np.sin(5 * r),
                    0.5 - 0.4 * np.cos(4 * r)], axis=-1).astype(
                        np.float32)
    noisy = img + 0.05 * rng.standard_normal(img.shape).astype(
        np.float32)

    Dg = convdicts()["G:8x8x32"][..., :M].astype(np.float32)

    # grayscale dictionary, independent channels
    opt = mc.ConvBPDN.options(max_iter=iters, rel_stop_tol=1e-3)
    b = mc.ConvBPDN(Dg, noisy, lmbda=0.1, opt=opt)
    b.solve()
    rec_gd = np.asarray(b.reconstruct()).squeeze()
    if rec_gd.ndim == 3 and rec_gd.shape[0] == 3:
        rec_gd = np.moveaxis(rec_gd, 0, -1)
    print(f"gray dict / colour signal: PSNR "
          f"{psnr(img, rec_gd):.2f} dB (noisy {psnr(img, noisy):.2f})")

    # colour (multi-channel) dictionary
    Dc = rng.standard_normal((8, 8, 3, M)).astype(np.float32)
    Dc /= np.sqrt((Dc ** 2).sum(axis=(0, 1, 2), keepdims=True))
    bc = mc.ConvBPDN(Dc, noisy, lmbda=0.1, opt=opt)
    bc.solve()
    print(f"colour dict: final objective "
          f"{float(bc.getitstat().ObjFun[-1]):.4f}")

    # product dictionary: conv dict (x) colour basis B
    B = np.linalg.qr(rng.standard_normal((3, 3)))[0].astype(np.float32)
    optp = pdcsc.ConvProdDictBPDN.options(max_iter=iters,
                                          rel_stop_tol=1e-3)
    bp = pdcsc.ConvProdDictBPDN(Dg, B, noisy, lmbda=0.1, opt=optp,
                                dimK=0)
    bp.solve()
    print(f"product dict: final objective "
          f"{float(bp.getitstat().ObjFun[-1]):.4f}")
    return rec_gd


if __name__ == "__main__":
    main()
