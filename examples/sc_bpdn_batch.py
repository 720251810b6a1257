#!/usr/bin/env python
"""Batched BPDN: many problems in one program.

Solves a batch of BPDN instances (shared dictionary, one column of S
per problem) in a single jitted solve -- the natural TPU form for
small problems whose single-instance iteration would leave the chip
idle.  Semantics match the reference's native multi-signal BPDN
(``sporco/admm/bpdn.py:271``: S of shape (N, K) with one aggregate
stopping rule), so results are column-wise identical to solving each
instance separately with the same stopping behaviour.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.bpdn import BPDN


def main(N=64, M=128, K=32, nnz=8, iters=200):
    rng = np.random.default_rng(0)
    D = rng.standard_normal((N, M)).astype(np.float32)
    D /= np.sqrt((D ** 2).sum(axis=0, keepdims=True))
    X0 = np.zeros((M, K), np.float32)
    for k in range(K):
        X0[rng.choice(M, nnz, replace=False), k] = \
            rng.standard_normal(nnz)
    S = (D @ X0).astype(np.float32)

    b = BPDN(D, S, lmbda=1e-3,
             opt=BPDN.options(max_iter=iters, rel_stop_tol=1e-4))
    X = np.asarray(b.solve())

    errs = (np.linalg.norm(X - X0, axis=0)
            / np.maximum(np.linalg.norm(X0, axis=0), 1e-12))
    print(f"batched BPDN: {K} problems in one solve "
          f"({len(b.getitstat())} iterations); per-problem recovery "
          f"err median {np.median(errs):.2e} max {errs.max():.2e}")
    assert errs.max() < 5e-2
    return X


if __name__ == "__main__":
    main(iters=500)
