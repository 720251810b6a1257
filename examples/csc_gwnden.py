#!/usr/bin/env python
"""Gaussian white noise denoising with joint-sparse colour CSC.

Denoises an RGB image by coding the highpass component against a
grayscale dictionary with joint sparsity coupling the channel
coefficient maps (equivalent of the reference's
examples/scripts/csc/gwnden_clr.py / gwnden_gry.py)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.cbpdn import ConvBPDNJoint
from sporco_tpu.utils import util
from sporco_tpu.utils.metric import psnr
from sporco_tpu.utils.signal import tikhonov_filter


def main(N=64, sigma=0.1, iters=60):
    ei = util.ExampleImages(scaled=True)
    img = np.asarray(ei.image("portrait.png", idxexp=np.s_[:N, :N]),
                     np.float32)
    rng = np.random.default_rng(0)
    noisy = img + sigma * rng.standard_normal(img.shape).astype(
        np.float32)

    sl, sh = tikhonov_filter(noisy, 5.0)
    sl, sh = np.asarray(sl), np.asarray(sh)
    D = util.convdicts()["G:8x8x32"].astype(np.float32)

    b = ConvBPDNJoint(D, sh, lmbda=2.0 * sigma, mu=2.0 * sigma,
                      opt=ConvBPDNJoint.options(max_iter=iters,
                                                rel_stop_tol=5e-3))
    b.solve()
    Sr = np.asarray(b.reconstruct()).squeeze() + sl
    print(f"joint-CSC GWN denoise: PSNR noisy {psnr(img, noisy):.2f} dB"
          f" -> {psnr(img, Sr):.2f} dB")
    assert psnr(img, Sr) > psnr(img, noisy)
    return Sr


if __name__ == "__main__":
    main(iters=150)
