#!/usr/bin/env python
"""Constrained method-of-optimal-directions dictionary update.

Given sparse codes for a set of signals, fit the dictionary subject to
unit-norm atoms -- via ADMM (equivalent of the reference's
examples/scripts/dl/cmod.py) and via PGM (dl/cmod_pgm.py).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=64, M=96, K=512, L=8, iters=150):
    from sporco_tpu.models.cmod import CnstrMOD
    from sporco_tpu.models import pgm as mpgm

    rng = np.random.default_rng(12345)
    D0 = rng.standard_normal((N, M)).astype(np.float32)
    D0 /= np.sqrt((D0 ** 2).sum(axis=0, keepdims=True))
    # sparse codes and the signals they explain
    Z = np.zeros((M, K), np.float32)
    for k in range(K):
        Z[rng.choice(M, L, replace=False), k] = \
            rng.standard_normal(L)
    S = D0 @ Z

    opt = CnstrMOD.options(max_iter=iters, rel_stop_tol=1e-6)
    b = CnstrMOD(Z, S, opt=opt)
    D1 = np.asarray(b.solve())
    err = np.abs(np.abs((D1 * D0).sum(axis=0)) - 1.0).max()
    print(f"ADMM CMOD: {len(b.getitstat())} iters, max atom "
          f"misalignment {err:.2e}")

    opt2 = mpgm.CnstrMOD.options(max_iter=iters, rel_stop_tol=1e-6)
    b2 = mpgm.CnstrMOD(Z, S, opt=opt2)
    D2 = np.asarray(b2.solve())
    err2 = np.abs(np.abs((D2 * D0).sum(axis=0)) - 1.0).max()
    print(f"PGM CMOD: {len(b2.getitstat())} iters, max atom "
          f"misalignment {err2:.2e}")
    return D1, D2


if __name__ == "__main__":
    main()
