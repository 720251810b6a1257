#!/usr/bin/env python
"""Sparse coding via PGM/FISTA, and a minimum-l1 recovery in an l2 ball.

Solves the same random-dictionary recovery with the accelerated
proximal-gradient BPDN (equivalent of the reference's
examples/scripts/sc/bpdn_pgm.py, with Barzilai-Borwein step size) and
then a noise-aware basis-pursuit variant ``min ||x||_1 s.t.
||Dx - s|| <= eps`` (sc/minl1prjl2.py analogue).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=256, M=1024, L=16, iters=200):
    from sporco_tpu.models import pgm as mpgm
    from sporco_tpu.models import bpdn as mbpdn

    rng = np.random.default_rng(12345)
    D = rng.standard_normal((N, M)).astype(np.float32)
    D /= np.sqrt((D ** 2).sum(axis=0, keepdims=True))
    x0 = np.zeros((M, 1), np.float32)
    x0[rng.choice(M, L, replace=False)] = rng.standard_normal((L, 1))
    s = D @ x0 + 0.005 * rng.standard_normal((N, 1)).astype(np.float32)

    # FISTA with Barzilai-Borwein step size
    opt = mpgm.BPDN.options(max_iter=iters, rel_stop_tol=1e-5,
                            stepsize="bb", L=100.0)
    b = mpgm.BPDN(D, s, lmbda=5e-2, opt=opt)
    x1 = np.asarray(b.solve())
    its = b.getitstat()
    print(f"PGM BPDN: {len(its)} iters, obj {its.ObjFun[-1]:.5f}, "
          f"rel err {np.linalg.norm(x1 - x0) / np.linalg.norm(x0):.3e}")

    # min ||x||_1 subject to ||Dx - s||_2 <= eps
    eps = 0.01 * np.sqrt(N)
    opt2 = mbpdn.MinL1InL2Ball.options(max_iter=iters,
                                       rel_stop_tol=1e-5)
    b2 = mbpdn.MinL1InL2Ball(D, s, epsilon=float(eps), opt=opt2)
    x2 = np.asarray(b2.solve())
    r = np.linalg.norm(D @ x2 - s)
    print(f"MinL1InL2Ball: ||Dx-s|| = {r:.4f} (eps {eps:.4f}), "
          f"||x||_1 = {np.abs(x2).sum():.4f}")
    return x1, x2


if __name__ == "__main__":
    main()
