#!/usr/bin/env python
"""TV denoising and Robust PCA demos (equivalents of the reference's
examples/scripts/tv/tvl2den_gry.py and misc/rpca_denoise.py)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from sporco_tpu.models import tv, rpca
from sporco_tpu.utils import util, metric


def main():
    ei = util.ExampleImages(scaled=True, gray=True)
    img = ei.image(ei.images()[0], idxexp=np.s_[:256, :256])
    rng = np.random.default_rng(0)
    imgn = img + 0.1 * rng.standard_normal(img.shape)

    b = tv.TVL2Denoise(np.asarray(imgn, np.float32), 0.08,
                       opt=tv.TVL2Denoise.options(max_iter=200))
    imgr = b.solve()
    print("TVL2:  solve %.2fs  PSNR %.2f dB (noisy: %.2f dB)" %
          (b.timer.elapsed("solve"), float(metric.psnr(img, imgr)),
           float(metric.psnr(img, imgn))))

    # robust PCA on a synthetic low-rank + sparse matrix
    U = rng.standard_normal((256, 8)).astype(np.float32)
    V = rng.standard_normal((8, 256)).astype(np.float32)
    L0 = U @ V
    Ssp = (rng.random((256, 256)) > 0.9) * \
        rng.standard_normal((256, 256)).astype(np.float32) * 5
    br = rpca.RobustPCA(L0 + Ssp,
                        opt=rpca.RobustPCA.options(max_iter=100))
    X, Y = br.solve()
    err = np.linalg.norm(np.asarray(X) - L0) / np.linalg.norm(L0)
    print("RPCA:  solve %.2fs  low-rank recovery rel err %.2e" %
          (br.timer.elapsed("solve"), err))


if __name__ == "__main__":
    main()
