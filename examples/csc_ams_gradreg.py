#!/usr/bin/env python
"""Masked CSC inpainting via AMS with in-problem lowpass (GradReg).

Additive Mask Simulation wrapping :class:`ConvBPDNGradReg`: instead of
pre-splitting the image with a lowpass filter (as ``csc_masked_inpaint``
does), the lowpass component is represented INSIDE the optimisation by
an impulse filter whose coefficient map carries a gradient penalty
(analogue of the reference's
examples/scripts/csc/cbpdn_ams_grd_gry.py,
``sporco/admm/cbpdn.py:2287,992``).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from sporco_tpu.models.cbpdn import AddMaskSim, ConvBPDNGradReg
from sporco_tpu.utils import util
from sporco_tpu.utils.metric import psnr
from sporco_tpu.utils.signal import rndmask


def main(N=64, frc=0.25, iters=60):
    ei = util.ExampleImages(scaled=True, gray=True)
    img = np.asarray(ei.image(ei.images()[0], idxexp=np.s_[:N, :N]),
                     np.float32)
    # random corruption mask: 1 = known pixel, 0 = missing
    W = np.asarray(rndmask(jax.random.PRNGKey(0), img.shape, frc),
                   np.float32)
    corrupt = W * img

    # dictionary + impulse filter carrying the lowpass via GradReg
    Dg = util.convdicts()["G:8x8x32"].astype(np.float32)
    imp = np.zeros((8, 8, 1), np.float32)
    imp[0, 0, 0] = 1.0
    D = np.concatenate([Dg, imp], axis=-1)
    M = D.shape[-1]
    # weights sized for the AMS-extended dictionary (M + 1: AMS appends
    # its own impulse filter): l1 free on OUR lowpass impulse map,
    # gradient penalty only there; the AMS impulse map gets neither
    wl1 = np.ones((1, 1, 1, 1, M + 1), np.float32)
    wl1[..., M - 1] = 0.0
    # small gradient penalty on every map helps inpainting (the
    # reference example's wgr recipe); full weight on the lowpass
    # impulse map, none on the AMS impulse
    wgrd = 2e-1 * np.ones(M + 1, np.float32)
    wgrd[M - 1] = 1.0
    wgrd[M] = 0.0

    lmbda, mu = 1e-2, 2e-1
    b = AddMaskSim(ConvBPDNGradReg, D, corrupt, W, lmbda=lmbda,
                   mu=mu, wl1=wl1, wgrd=wgrd,
                   opt={"MaxMainIter": iters,
                        "rho": 5e1 * lmbda + 1e-1, "RelaxParam": 1.8,
                        "RelStopTol": 5e-3,
                        "AutoRho": {"Enabled": False}})
    b.solve()
    Sr = np.asarray(b.reconstruct()).squeeze()
    p0, p1 = psnr(img, corrupt), psnr(img, Sr)
    print(f"AMS + GradReg inpainting: PSNR corrupt {p0:.2f} dB -> "
          f"{p1:.2f} dB")
    assert p1 > p0
    return Sr


if __name__ == "__main__":
    main(iters=200)
