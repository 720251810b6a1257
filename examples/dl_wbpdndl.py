#!/usr/bin/env python
"""Weighted-l2 dictionary learning via the PGM solvers.

Learns a standard (non-convolutional) dictionary under a per-sample
reliability weighting (equivalent of the reference's
examples/scripts/dl/wbpdndl.py)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.dictlrn import WeightedBPDNDictLearn


def main(N=64, M=32, K=48, iters=100):
    rng = np.random.default_rng(12345)
    # ground-truth dictionary + sparse codes
    D0 = rng.standard_normal((N, M)).astype(np.float32)
    D0 /= np.sqrt((D0 ** 2).sum(axis=0, keepdims=True))
    X0 = np.zeros((M, K), np.float32)
    for k in range(K):
        X0[rng.choice(M, 4, replace=False), k] = \
            rng.standard_normal(4)
    S = D0 @ X0
    # a subset of entries is unreliable: noise there, downweighted
    W = np.ones((N, K), np.float32)
    bad = rng.random((N, K)) < 0.1
    S = S + bad * rng.standard_normal((N, K)).astype(np.float32)
    W[bad] = 0.05

    Dinit = rng.standard_normal((N, M)).astype(np.float32)
    d = WeightedBPDNDictLearn(Dinit, S, lmbda=0.05, W=W,
                              max_iter=iters, dtype=np.float32)
    d.solve()
    D = np.asarray(d.getdict())
    # weighted reconstruction error ignores the corrupted entries
    R = W * (D @ np.asarray(d.getcoef()) - S)
    err = np.linalg.norm(R) / np.linalg.norm(W * S)
    print(f"weighted BPDN dictlearn: dict {D.shape}, weighted "
          f"reconstruction rel err {err:.3f}")
    assert err < 0.75
    return D


if __name__ == "__main__":
    main(iters=300)
