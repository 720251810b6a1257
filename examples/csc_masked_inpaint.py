#!/usr/bin/env python
"""Image inpainting with masked convolutional sparse coding.

Compares the two masked-CSC formulations on a random-erasure inpainting
problem: mask decoupling (ConvBPDNMaskDcpl) and Additive Mask
Simulation (AddMaskSim wrapping a plain ConvBPDN) — equivalents of the
reference's examples/scripts/csc/cbpdn_md_gry.py and cbpdn_ams_gry.py.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from sporco_tpu.models import cbpdn
from sporco_tpu.utils import util, signal, metric


def main():
    ei = util.ExampleImages(scaled=True, gray=True)
    img = ei.image(ei.images()[0], idxexp=np.s_[:128, :128]).astype(
        np.float32)

    rng = np.random.default_rng(0)
    W = (rng.random(img.shape) > 0.25).astype(np.float32)  # keep 75%
    s = W * img

    # mask-normalised lowpass estimate (plain Tikhonov of W*img leaves
    # dark blotches at the erased pixels); highpass = observed - lowpass
    num = np.asarray(signal.tikhonov_filter(jnp.asarray(s), 5.0)[0])
    den = np.asarray(signal.tikhonov_filter(jnp.asarray(W), 5.0)[0])
    sl = num / np.maximum(den, 1e-3)
    sh = s - W * sl

    D = util.convdicts()[list(util.convdicts().keys())[0]].astype(
        np.float32)
    lmbda = 2e-2

    opt = cbpdn.ConvBPDN.options(max_iter=100, rel_stop_tol=5e-3)
    bmd = cbpdn.ConvBPDNMaskDcpl(D, sh, lmbda, W=W, opt=opt)
    bmd.solve()
    imgr_md = np.asarray(bmd.reconstruct()).squeeze() + sl

    bam = cbpdn.AddMaskSim(cbpdn.ConvBPDN, D, sh, W, lmbda, opt=opt)
    bam.solve()
    imgr_am = np.asarray(bam.reconstruct()).squeeze() + sl

    print(f"masked PSNR {metric.psnr(img, s):.2f} dB")
    print(f"MaskDcpl inpainted PSNR {metric.psnr(img, imgr_md):.2f} dB")
    print(f"AddMaskSim inpainted PSNR {metric.psnr(img, imgr_am):.2f} dB")


if __name__ == "__main__":
    main()
