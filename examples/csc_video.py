#!/usr/bin/env python
"""Video (3-D) convolutional sparse coding.

Sparse-codes a short video volume with a dictionary of 3-D
space-time filters (equivalent of the reference's
examples/scripts/cdl/cbpdndl_video.py capability surface: ``dimN=3``
convolutional representation, DFT-diagonalised over all three axes).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.cbpdn import ConvBPDN


def main(N=32, T=8, M=8, iters=30):
    rng = np.random.default_rng(0)
    # moving-blob synthetic video: a few drifting Gaussians
    yy, xx = np.mgrid[:N, :N]
    frames = []
    for t in range(T):
        f = np.zeros((N, N), np.float32)
        for b in range(3):
            cx = (5 + 3 * b * t / T * 4 + t) % N
            cy = (8 * b + 2 * t) % N
            f += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 8.0)
        frames.append(f)
    S = np.stack(frames, axis=-1)
    S += 0.02 * rng.standard_normal(S.shape).astype(np.float32)

    D = rng.standard_normal((5, 5, 3, M)).astype(np.float32)
    D /= np.sqrt((D ** 2).sum(axis=(0, 1, 2), keepdims=True))

    b = ConvBPDN(D, S, lmbda=0.1, dimN=3,
                 opt=ConvBPDN.options(max_iter=iters,
                                      rel_stop_tol=5e-3))
    X = np.asarray(b.solve())
    Sr = np.asarray(b.reconstruct()).squeeze()
    err = np.linalg.norm(Sr - S) / np.linalg.norm(S)
    spars = np.mean(np.abs(X) > 1e-5)
    print(f"video CSC: X {X.shape}, reconstruction rel err {err:.3f}, "
          f"density {spars:.3f}")
    assert err < 0.5
    return X


if __name__ == "__main__":
    main(iters=100)
