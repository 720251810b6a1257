#!/usr/bin/env python
"""Joint-sparse BPDN with hyperparameter grid search.

Recovers a jointly-sparse coefficient matrix (shared support across
signals) and selects the (lmbda, mu) pair by grid search (equivalent
of the reference's examples/scripts/sc/bpdnjnt_opt.py)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.bpdn import BPDNJoint
from sporco_tpu.parallel.gridsearch import grid_search


def main(N=128, M=256, K=8, L=12, iters=100):
    rng = np.random.default_rng(12345)
    D = rng.standard_normal((N, M)).astype(np.float32)
    D /= np.sqrt((D ** 2).sum(axis=0, keepdims=True))
    # shared support across the K signals
    sup = rng.choice(M, L, replace=False)
    X0 = np.zeros((M, K), np.float32)
    X0[sup] = rng.standard_normal((L, K))
    S = D @ X0 + 0.01 * rng.standard_normal((N, K)).astype(np.float32)

    lam_grid = np.logspace(-2, 0, 5).astype(np.float32)
    mu_grid = np.logspace(-2, 0, 5).astype(np.float32)

    def fiterr(prm):
        lam, mu = prm
        b = BPDNJoint(D, S, float(lam), float(mu),
                      opt=BPDNJoint.options(max_iter=iters,
                                            rel_stop_tol=1e-4))
        x = np.asarray(b.solve())
        return float(np.linalg.norm(x - X0) / np.linalg.norm(X0))

    (lam, mu), err, _, _ = grid_search(fiterr, (lam_grid, mu_grid))
    print(f"best (lmbda, mu) = ({lam:.3g}, {mu:.3g}), rel err {err:.3e}")

    b = BPDNJoint(D, S, float(lam), float(mu),
                  opt=BPDNJoint.options(max_iter=2 * iters,
                                        rel_stop_tol=1e-6))
    x = np.asarray(b.solve())
    # recovered support matches
    rows = np.argsort(-np.linalg.norm(x, axis=1))[:L]
    overlap = len(set(rows) & set(sup)) / L
    print(f"support overlap {overlap:.2f}")
    assert overlap >= 0.9
    return x


if __name__ == "__main__":
    main()
