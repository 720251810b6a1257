#!/usr/bin/env python
"""CSC with a product dictionary (convolutional x standard).

Sparse-codes a colour image with a grayscale convolutional dictionary
acting spatially and a small orthogonal basis acting on the channel
axis (equivalent of the reference's
examples/scripts/csc/implsden_grd_pd_dct.py family: D X B^T with B a
DCT basis)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.pdcsc import ConvProdDictBPDN
from sporco_tpu.utils import util
from sporco_tpu.utils.signal import tikhonov_filter


def _dct_basis(n):
    k = np.arange(n)
    B = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    B[0] /= np.sqrt(n)
    B[1:] *= np.sqrt(2.0 / n)
    return B.T.astype(np.float32)     # columns are DCT atoms


def main(N=64, iters=40):
    ei = util.ExampleImages(scaled=True)
    img = np.asarray(ei.image("portrait.png", idxexp=np.s_[:N, :N]),
                     np.float32)
    _, sh = tikhonov_filter(img, 5.0)
    sh = np.asarray(sh, np.float32)

    D = util.convdicts()["G:8x8x32"].astype(np.float32)
    B = _dct_basis(3)                 # channel-axis DCT basis

    b = ConvProdDictBPDN(D, B, sh, lmbda=0.05, dimK=0,
                         opt=ConvProdDictBPDN.options(max_iter=iters))
    X = np.asarray(b.solve())
    # reconstruct() returns the internal (C, 1, Nv) layout; move the
    # channel axis back to the trailing position
    Sr = np.moveaxis(np.asarray(b.reconstruct()).squeeze(), 0, -1)
    err = np.linalg.norm(Sr - sh) / np.linalg.norm(sh)
    print(f"product-dict CSC: X {X.shape}, highpass reconstruction "
          f"rel err {err:.3f}")
    assert err < 0.8
    return X


if __name__ == "__main__":
    main(iters=100)
