#!/usr/bin/env python
"""Impulse-noise colour denoising with a product dictionary (PCA basis)
and joint sparsity.

Like ``csc_impulse_pd_dct.py`` but the channel-axis basis is learned
by PCA from the noisy image's own pixels, and the coefficient maps are
additionally regularised with an l2,1 joint-sparsity term across the
basis axis (analogue of the reference's
examples/scripts/csc/implsden_grd_pd_pca.py,
``sporco/admm/pdcsc.py:584``; PCA basis from ``sporco/linalg.py:914``).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from sporco_tpu.models.pdcsc import ConvProdDictL1L1GrdJoint
from sporco_tpu.ops.linalg import pca
from sporco_tpu.utils import util
from sporco_tpu.utils.metric import psnr
from sporco_tpu.utils.signal import spnoise


def main(N=64, frc=0.2, iters=60):
    ei = util.ExampleImages(scaled=True)
    img = np.asarray(ei.image("portrait.png", idxexp=np.s_[:N, :N]),
                     np.float32)
    noisy = np.asarray(spnoise(jax.random.PRNGKey(0), img, frc),
                       np.float32)

    # channel-axis PCA basis learned from the noisy pixels themselves
    pix = noisy.reshape(-1, 3).T      # (C, npixels)
    pcaB, _, _ = pca(pix, centre=False)
    B = np.asarray(pcaB, np.float32)  # full 3-component basis

    Dg = util.convdicts()["G:8x8x32"].astype(np.float32)
    imp = np.zeros((8, 8, 1), np.float32)
    imp[0, 0, 0] = 1.0
    D = np.concatenate([Dg, imp], axis=-1)
    M = D.shape[-1]

    wl1 = np.ones((1, 1, 1, 1, M), np.float32)
    wl1[..., -1] = 0.0
    wgrd = np.zeros(M, np.float32)
    wgrd[-1] = 1.0

    b = ConvProdDictL1L1GrdJoint(
        D, B, noisy, lmbda=1.4, mu=9.0, mu2=2e-2, dimK=0,
        opt=ConvProdDictL1L1GrdJoint.options(max_iter=iters, rho=1e1),
        wl1=wl1, wgrd=wgrd)
    b.solve()
    Sr = np.moveaxis(np.asarray(b.reconstruct()).squeeze(), 0, -1)
    p0, p1 = psnr(img, noisy), psnr(img, Sr)
    print(f"product-dict (PCA, joint) impulse denoise: PSNR "
          f"{p0:.2f} dB -> {p1:.2f} dB")
    assert p1 > p0
    return Sr


if __name__ == "__main__":
    main(iters=150)
