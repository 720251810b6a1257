#!/usr/bin/env python
"""Misc utilities: l1-spline smoothing and Bayer demosaicing.

(1) Robust l1-spline fit of a smooth surface corrupted by sparse
outliers (equivalent of the reference's
examples/scripts/misc/spline.py); (2) bilinear demosaicing of a Bayer
mosaic (sporco.interp.bilinear_demosaic usage as in the PPP demosaic
examples).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models import spline
from sporco_tpu.utils import util, interp, metric


def main():
    # --- l1-spline under sparse outliers
    np.random.seed(12345)
    N, L = 64, 20
    x = np.cos(np.linspace(0, np.pi, N))[np.newaxis, :]
    U = (x * x.T).astype(np.float32)
    V = np.random.randn(N, N).astype(np.float32)
    t = np.sort(np.abs(V).ravel())[V.size - L]
    V[np.abs(V) < t] = 0
    D = U + V

    opt = spline.SplineL1.options(max_iter=250, rel_stop_tol=5e-4)
    b = spline.SplineL1(D, 0.1, opt=opt, Wdf=(V == 0))
    X = np.asarray(b.solve())
    print(f"spline: corrupted mse {np.mean((D - U) ** 2):.2e}  ->  "
          f"fit mse {np.mean((X - U) ** 2):.2e}")

    # --- Bayer demosaic
    ei = util.ExampleImages(scaled=True)
    img = ei.image(ei.images()[0], idxexp=np.s_[:128, :128])
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    img = img.astype(np.float32)
    mosaic = np.zeros(img.shape[:2], np.float32)
    mosaic[1::2, 1::2] = img[1::2, 1::2, 0]              # R
    mosaic[0::2, 1::2] = img[0::2, 1::2, 1]              # G
    mosaic[1::2, 0::2] = img[1::2, 0::2, 1]              # G
    mosaic[0::2, 0::2] = img[0::2, 0::2, 2]              # B
    demo = np.asarray(interp.bilinear_demosaic(mosaic))
    print(f"demosaic PSNR {metric.psnr(img, demo):.2f} dB")


if __name__ == "__main__":
    main()
