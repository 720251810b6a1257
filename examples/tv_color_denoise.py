#!/usr/bin/env python
"""Colour (vector) TV denoising.

Denoises an RGB image with l2-TV where the gradient magnitude couples
the colour channels (equivalent of the reference's
examples/scripts/tv/tvl2den_clr.py / tvl1den_clr.py: the ``caxis``
option makes the TV norm vectorial over channels)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.tv import TVL2Denoise, TVL1Denoise
from sporco_tpu.utils import util
from sporco_tpu.utils.metric import psnr


def main(N=96, iters=60):
    ei = util.ExampleImages(scaled=True)
    img = np.asarray(ei.image("portrait.png", idxexp=np.s_[:N, :N]),
                     np.float32)
    rng = np.random.default_rng(0)
    noisy = img + 0.1 * rng.standard_normal(img.shape).astype(np.float32)

    b = TVL2Denoise(noisy, 0.08,
                    opt=TVL2Denoise.options(max_iter=iters),
                    axes=(0, 1), caxis=2)
    X2 = np.asarray(b.solve())
    print(f"vector TV-l2: PSNR noisy {psnr(img, noisy):.2f} dB -> "
          f"{psnr(img, X2):.2f} dB")
    assert psnr(img, X2) > psnr(img, noisy)

    b1 = TVL1Denoise(noisy, 0.6,
                     opt=TVL1Denoise.options(max_iter=iters),
                     axes=(0, 1), caxis=2)
    X1 = np.asarray(b1.solve())
    print(f"vector TV-l1: PSNR {psnr(img, X1):.2f} dB")
    return X2


if __name__ == "__main__":
    main(iters=150)
