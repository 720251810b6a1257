#!/usr/bin/env python
"""Impulse-noise colour denoising with a product dictionary (DCT basis).

The product dictionary is a grayscale convolutional dictionary acting
spatially and a DCT basis acting on the channel axis; an impulse
filter with gradient regularisation represents the lowpass component
inside the optimisation, and the l1 data fidelity rejects salt &
pepper outliers (analogue of the reference's
examples/scripts/csc/implsden_grd_pd_dct.py,
``sporco/admm/pdcsc.py:293``).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from sporco_tpu.models.pdcsc import ConvProdDictL1L1Grd
from sporco_tpu.utils import util
from sporco_tpu.utils.metric import psnr
from sporco_tpu.utils.signal import spnoise


def dct_basis(n):
    k = np.arange(n)
    B = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    B[0] /= np.sqrt(n)
    B[1:] *= np.sqrt(2.0 / n)
    return B.T.astype(np.float32)     # columns are DCT atoms


def main(N=64, frc=0.2, iters=60):
    ei = util.ExampleImages(scaled=True)
    img = np.asarray(ei.image("portrait.png", idxexp=np.s_[:N, :N]),
                     np.float32)
    noisy = np.asarray(spnoise(jax.random.PRNGKey(0), img, frc),
                       np.float32)

    # spatial dictionary + impulse filter for the lowpass component
    Dg = util.convdicts()["G:8x8x32"].astype(np.float32)
    imp = np.zeros((8, 8, 1), np.float32)
    imp[0, 0, 0] = 1.0
    D = np.concatenate([Dg, imp], axis=-1)
    B = dct_basis(3)                  # channel-axis DCT basis
    M = D.shape[-1]

    # l1 weight zero on the impulse map; gradient weight only there
    wl1 = np.ones((1, 1, 1, 1, M), np.float32)
    wl1[..., -1] = 0.0
    wgrd = np.zeros(M, np.float32)
    wgrd[-1] = 1.0

    b = ConvProdDictL1L1Grd(
        D, B, noisy, lmbda=1.4, mu=9.0, dimK=0,
        opt=ConvProdDictL1L1Grd.options(max_iter=iters, rho=1e1),
        wl1=wl1, wgrd=wgrd)
    b.solve()
    Sr = np.moveaxis(np.asarray(b.reconstruct()).squeeze(), 0, -1)
    p0, p1 = psnr(img, noisy), psnr(img, Sr)
    print(f"product-dict (DCT) impulse denoise: PSNR {p0:.2f} dB -> "
          f"{p1:.2f} dB")
    assert p1 > p0
    return Sr


if __name__ == "__main__":
    main(iters=150)
