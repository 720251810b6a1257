#!/usr/bin/env python
"""Sparse coding with BPDN, plus hyperparameter grid search.

Recovers a sparse vector from a random-dictionary observation and
selects the regularisation weight by a vmapped grid search (equivalent
of the reference's examples/scripts/sc/bpdn.py + bpdn_opt.py; the
reference fans the grid over a multiprocessing pool, here the whole
grid is one compiled program).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models import bpdn
from sporco_tpu.parallel.gridsearch import grid_search


def main():
    rng = np.random.default_rng(12345)
    N, M, L = 512, 4 * 512, 32
    D = rng.standard_normal((N, M)).astype(np.float32)
    x0 = np.zeros((M, 1), np.float32)
    x0[rng.choice(M, L, replace=False)] = rng.standard_normal((L, 1))
    s = D @ x0

    # grid search over lmbda: relative recovery error per grid point
    lam_grid = np.logspace(-3, 0, 10).astype(np.float32)

    def fiterr(prm):
        (lam,) = prm
        opt = bpdn.BPDN.options(max_iter=200, rel_stop_tol=1e-4)
        b = bpdn.BPDN(D, s, lmbda=float(lam), opt=opt)
        x = np.asarray(b.solve())
        return float(np.linalg.norm(x - x0) / np.linalg.norm(x0))

    (lam_opt,), err, fvmx, _ = grid_search(fiterr, (lam_grid,))
    print(f"optimal lmbda {lam_opt:.4g}  rel err {err:.3e}")

    opt = bpdn.BPDN.options(max_iter=500, rel_stop_tol=1e-6)
    b = bpdn.BPDN(D, s, lmbda=float(lam_opt), opt=opt)
    x1 = np.asarray(b.solve())
    its = b.getitstat()
    print(f"BPDN solved in {len(its)} iters; "
          f"obj {its.ObjFun[-1]:.5f}, "
          f"recovery rel err "
          f"{np.linalg.norm(x1 - x0) / np.linalg.norm(x0):.3e}")


if __name__ == "__main__":
    main()
