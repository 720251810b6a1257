#!/usr/bin/env python
"""ADMM vs PGM solver comparison on the same BPDN problem.

Solves one sparse recovery problem with both solver families and
compares objective trajectories and wall time (equivalent of the
reference's examples/scripts/sc/bpdn_cmp.py)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np

from sporco_tpu.models import bpdn as abpdn
from sporco_tpu.models import pgm as pbpdn


def main(N=256, M=512, L=24, iters=150):
    rng = np.random.default_rng(12345)
    D = rng.standard_normal((N, M)).astype(np.float32)
    D /= np.sqrt((D ** 2).sum(axis=0, keepdims=True))
    x0 = np.zeros((M, 1), np.float32)
    x0[rng.choice(M, L, replace=False)] = rng.standard_normal((L, 1))
    s = D @ x0
    lmbda = 0.02

    a = abpdn.BPDN(D, s, lmbda,
                   opt=abpdn.BPDN.options(max_iter=iters,
                                          rel_stop_tol=1e-6))
    t0 = time.time(); xa = np.asarray(a.solve()); ta = time.time() - t0
    ia = a.getitstat()

    # PGM needs a smaller Lipschitz estimate and more iterations to
    # match ADMM's accuracy on this conditioning (the comparison the
    # reference's bpdn_cmp.py demonstrates)
    b = pbpdn.BPDN(D, s, lmbda,
                   opt=pbpdn.BPDN.options(max_iter=4 * iters,
                                          rel_stop_tol=1e-7, L=50.0))
    t0 = time.time(); xb = np.asarray(b.solve()); tb = time.time() - t0
    ib = b.getitstat()

    ea = np.linalg.norm(xa - x0) / np.linalg.norm(x0)
    eb = np.linalg.norm(xb - x0) / np.linalg.norm(x0)
    print(f"ADMM: {len(ia)} iters, {ta:.3f}s, obj {ia.ObjFun[-1]:.5f}, "
          f"rel err {ea:.2e}")
    print(f"PGM : {len(ib)} iters, {tb:.3f}s, obj {ib.ObjFun[-1]:.5f}, "
          f"rel err {eb:.2e}")
    assert abs(ia.ObjFun[-1] - ib.ObjFun[-1]) \
        < 2e-2 * abs(ia.ObjFun[-1])
    return xa, xb


if __name__ == "__main__":
    main()
