#!/usr/bin/env python
"""BPDN regularisation-parameter selection walkthrough.

Sweeps lambda over a logarithmic grid with ``grid_search`` (solving
every BPDN instance in parallel), selects the value minimising the
recovery error against the known sparse ground truth, and shows the
functional-value decomposition (data fidelity vs l1 penalty) across
the sweep (analogue of the reference's
examples/scripts/sc/bpdn_opt.py).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.bpdn import BPDN
from sporco_tpu.parallel.gridsearch import grid_search


def main(N=64, M=128, nnz=8, n_lmbda=9, iters=100):
    rng = np.random.default_rng(0)
    D = rng.standard_normal((N, M)).astype(np.float32)
    D /= np.sqrt((D ** 2).sum(axis=0, keepdims=True))
    x0 = np.zeros((M, 1), np.float32)
    x0[rng.choice(M, nnz, replace=False)] = \
        rng.standard_normal((nnz, 1))
    s0 = D @ x0
    s = s0 + 0.02 * rng.standard_normal(s0.shape).astype(np.float32)

    lmbdas = np.logspace(-3, 0, n_lmbda)
    dfids, rl1s = [], []

    def fn(prm):
        (lmbda,) = prm
        b = BPDN(D, s, lmbda=float(lmbda),
                 opt=BPDN.options(max_iter=iters, rel_stop_tol=1e-4))
        x = np.asarray(b.solve())
        its = b.getitstat()
        dfids.append(float(its.DFid[-1]))
        rl1s.append(float(its.RegL1[-1]))
        return float(np.linalg.norm(x - x0) / np.linalg.norm(x0))

    (best_lmbda,), best_err, errs, _ = grid_search(fn, (lmbdas,))
    errs = np.asarray(errs)
    print("lambda sweep:")
    for lm, e, df, r1 in zip(lmbdas, errs, dfids, rl1s):
        print(f"  lambda {lm:8.4f}  recovery err {e:7.4f}  "
              f"dfid {df:9.4f}  l1 {r1:8.2f}")
    print(f"best lambda {best_lmbda:.4f} (err {best_err:.4f})")
    # the optimum must be interior (neither under- nor over-regularised
    # endpoint) and recover the support well
    assert errs.min() < 0.1
    assert errs.min() < errs[0] and errs.min() < errs[-1]
    return best_lmbda


if __name__ == "__main__":
    main(iters=300)
