#!/usr/bin/env python
"""Impulse-noise colour denoising with an l1-l1-grad CSC model.

The l1 data fidelity rejects salt & pepper outliers and the gradient
penalty regularises the lowpass component (equivalent of the
reference's examples/scripts/csc/implsden_clr.py /
implsden_grd_clr.py)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from sporco_tpu.models.cbpdn import ConvL1L1Grd
from sporco_tpu.utils import util
from sporco_tpu.utils.metric import psnr
from sporco_tpu.utils.signal import spnoise


def main(N=64, frc=0.2, iters=60):
    ei = util.ExampleImages(scaled=True, gray=True)
    img = np.asarray(ei.image(ei.images()[0], idxexp=np.s_[:N, :N]),
                     np.float32)
    noisy = np.asarray(spnoise(jax.random.PRNGKey(0), img, frc),
                       np.float32)

    # augment the dictionary with an impulse filter whose map absorbs
    # the lowpass component under the gradient penalty (the reference's
    # implsden recipe)
    Dg = util.convdicts()["G:8x8x32"].astype(np.float32)
    imp = np.zeros((8, 8, 1), np.float32)
    imp[0, 0, 0] = 1.0
    D = np.concatenate([Dg, imp], axis=-1)
    wl1 = np.ones((1, 1, 1, 1, D.shape[-1]), np.float32)
    wl1[..., -1] = 0.0              # impulse map not sparsity-penalised
    wgrd = np.zeros(D.shape[-1], np.float32)
    wgrd[-1] = 1.0                  # gradient penalty on impulse map

    b = ConvL1L1Grd(D, noisy, lmbda=3e-2, mu=0.1, W=None,
                    opt=ConvL1L1Grd.options(max_iter=iters),
                    wl1=wl1, wgrd=wgrd)
    b.solve()
    Sr = np.asarray(b.reconstruct()).squeeze()
    print(f"l1-l1-grd impulse denoise: PSNR noisy "
          f"{psnr(img, noisy):.2f} dB -> {psnr(img, Sr):.2f} dB")
    assert psnr(img, Sr) > psnr(img, noisy)
    return Sr


if __name__ == "__main__":
    main(iters=150)
