#!/usr/bin/env python
"""Grayscale TV denoising: TV-L2 vs TV-L1 side by side.

Gaussian noise is handled by the l2 data fidelity, salt & pepper by
the l1 fidelity (analogues of the reference's
examples/scripts/tv/tvl2den_gry.py and tvl1den_gry.py,
``sporco/admm/tvl2.py:27`` / ``tvl1.py:27``).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from sporco_tpu.models.tv import TVL1Denoise, TVL2Denoise
from sporco_tpu.utils import util
from sporco_tpu.utils.metric import psnr
from sporco_tpu.utils.signal import spnoise


def main(N=64, iters=100):
    rng = np.random.default_rng(0)
    ei = util.ExampleImages(scaled=True, gray=True)
    img = np.asarray(ei.image(ei.images()[0], idxexp=np.s_[:N, :N]),
                     np.float32)

    # TV-L2 on Gaussian noise
    g = img + 0.06 * rng.standard_normal(img.shape).astype(np.float32)
    b2 = TVL2Denoise(g, 0.04,
                     opt=TVL2Denoise.options(max_iter=iters,
                                             rel_stop_tol=1e-4))
    x2 = np.asarray(b2.solve())
    p_g0, p_g1 = psnr(img, g), psnr(img, x2)

    # TV-L1 on salt & pepper noise
    s = np.asarray(spnoise(jax.random.PRNGKey(0), img, 0.2),
                   np.float32)
    b1 = TVL1Denoise(s, 0.8,
                     opt=TVL1Denoise.options(max_iter=iters,
                                             rel_stop_tol=1e-4))
    x1 = np.asarray(b1.solve())
    p_s0, p_s1 = psnr(img, s), psnr(img, x1)

    print(f"TV-L2 (gaussian): PSNR {p_g0:.2f} -> {p_g1:.2f} dB;  "
          f"TV-L1 (salt&pepper): PSNR {p_s0:.2f} -> {p_s1:.2f} dB")
    assert p_g1 > p_g0
    assert p_s1 > p_s0
    return x2, x1


if __name__ == "__main__":
    main(iters=300)
