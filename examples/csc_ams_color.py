#!/usr/bin/env python
"""Colour CSC inpainting via Additive Mask Simulation.

Reconstructs missing pixels of a colour image by masked sparse coding
with per-channel impulse filters (equivalent of the reference's
examples/scripts/csc/cbpdn_ams_clr.py)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.cbpdn import AddMaskSim, ConvBPDN
from sporco_tpu.utils import util
from sporco_tpu.utils.metric import psnr
import jax

from sporco_tpu.utils.signal import rndmask, tikhonov_filter


def main(N=64, frc=0.25, iters=60):
    ei = util.ExampleImages(scaled=True)
    img = np.asarray(ei.image("portrait.png", idxexp=np.s_[:N, :N]),
                     np.float32)
    mask = np.asarray(rndmask(jax.random.PRNGKey(0), img.shape[:2],
                              frc), np.float32)
    W = mask[..., None] * np.ones((1, 1, 3), np.float32)
    corrupted = W * img

    sl, sh = tikhonov_filter(corrupted, 5.0)
    sl, sh = np.asarray(sl), np.asarray(sh)

    D = util.convdicts()["RGB:8x8x3x64"].astype(np.float32)
    ams = AddMaskSim(ConvBPDN, D, sh, W, lmbda=0.05,
                     opt=ConvBPDN.options(max_iter=iters,
                                          rel_stop_tol=5e-3))
    ams.solve()
    Sr = np.asarray(ams.reconstruct()).squeeze() + sl
    obs_psnr = psnr(img, corrupted)
    rec_psnr = psnr(img, Sr)
    print(f"AMS colour inpainting ({100*(1-frc):.0f}% missing): "
          f"PSNR {obs_psnr:.2f} dB -> {rec_psnr:.2f} dB")
    assert rec_psnr > obs_psnr
    return Sr


if __name__ == "__main__":
    main(iters=150)
