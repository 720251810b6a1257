#!/usr/bin/env python
"""l1-TV deconvolution of a blurred image with salt & pepper noise.

The l1 data fidelity is robust to impulse noise (equivalent of the
reference's examples/scripts/tv/tvl1dcn_den.py)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.tv import TVL1Deconv
from sporco_tpu.utils import util
from sporco_tpu.utils.metric import psnr
import jax

from sporco_tpu.utils.signal import spnoise


def main(N=128, iters=100):
    ei = util.ExampleImages(scaled=True, gray=True)
    img = np.asarray(ei.image(ei.images()[0], idxexp=np.s_[:N, :N]),
                     np.float32)
    # blur kernel: normalised 5x5 box
    A = np.ones((5, 5), np.float32) / 25.0
    Af = np.fft.rfft2(A, s=img.shape)
    blurred = np.fft.irfft2(Af * np.fft.rfft2(img), s=img.shape)
    noisy = np.asarray(spnoise(jax.random.PRNGKey(0), blurred, 0.2),
                       np.float32)

    b = TVL1Deconv(A, noisy, lmbda=8e-3,
                   opt=TVL1Deconv.options(max_iter=iters, rho=10.0,
                                          rel_stop_tol=1e-4))
    X = np.asarray(b.solve())
    print(f"TV-l1 deconv: PSNR noisy {psnr(img, noisy):.2f} dB -> "
          f"restored {psnr(img, X):.2f} dB")
    assert psnr(img, X) > psnr(img, noisy)
    return X


if __name__ == "__main__":
    main(iters=200)
