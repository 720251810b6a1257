#!/usr/bin/env python
"""Convolutional sparse coding denoising demo.

Solves a ConvBPDN problem on a noisy image after Tikhonov lowpass/
highpass splitting (the standard CSC preprocessing), comparing the ADMM
and PGM/FISTA solvers (equivalent of the reference's
examples/scripts/csc/cbpdn_gry.py + cbpdn_pgm_gry.py).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from sporco_tpu.models import cbpdn as acbpdn
from sporco_tpu.models import pgm as pcbpdn
from sporco_tpu.utils import util, signal, metric


def main():
    ei = util.ExampleImages(scaled=True, gray=True)
    img = ei.image(ei.images()[0], idxexp=np.s_[:256, :256])
    rng = np.random.default_rng(0)
    imgn = img + 0.1 * rng.standard_normal(img.shape)

    sl_, sh = signal.tikhonov_filter(jnp.asarray(imgn, jnp.float32), 10.0)

    D = util.convdicts()[list(util.convdicts().keys())[0]]
    lmbda = 0.1

    opt = acbpdn.ConvBPDN.options(max_iter=100)
    b = acbpdn.ConvBPDN(D, np.asarray(sh), lmbda, opt=opt)
    b.solve()
    shr = b.reconstruct()
    imgr = np.asarray(sl_) + np.asarray(shr)
    print("ADMM:   solve %.2fs  PSNR %.2f dB" %
          (b.timer.elapsed("solve"),
           float(metric.psnr(img, imgr))))

    optp = pcbpdn.ConvBPDN.options(max_iter=100, backtrack="standard",
                                   L=10.0)
    bp = pcbpdn.ConvBPDN(D, np.asarray(sh), lmbda, opt=optp)
    bp.solve()
    shrp = bp.reconstruct()
    imgrp = np.asarray(sl_) + np.asarray(shrp)
    print("FISTA:  solve %.2fs  PSNR %.2f dB" %
          (bp.timer.elapsed("solve"),
           float(metric.psnr(img, imgrp))))


if __name__ == "__main__":
    main()
