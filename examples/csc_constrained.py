#!/usr/bin/env python
"""Constrained convolutional sparse coding.

Equivalents of the reference's examples/scripts/csc/cprjl1_gry.py
(ConvBPDNProjL1: minimise data fidelity subject to an l1-ball budget
``||x||_1 <= gamma``) and csc/cminl1_gry.py (ConvMinL1InL2Ball:
minimise ``||x||_1`` subject to a noise-aware reconstruction ball
``||Dx - s|| <= eps``).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=64, M=8, iters=80):
    from sporco_tpu.models import cbpdn as mc
    from sporco_tpu.utils.util import convdicts

    rng = np.random.default_rng(12345)
    D = convdicts()["G:8x8x32"][..., :M].astype(np.float32)
    X0 = np.zeros((N, N, M), np.float32)
    idx = rng.choice(N * N * M, 24, replace=False)
    X0.ravel()[idx] = rng.uniform(1.0, 2.0, 24)
    Df = np.fft.rfft2(D, s=(N, N), axes=(0, 1))
    S = np.fft.irfft2((np.fft.rfft2(X0, axes=(0, 1)) * Df).sum(-1),
                      s=(N, N)).astype(np.float32)
    S += 0.01 * rng.standard_normal((N, N)).astype(np.float32)

    # l1-budget-constrained CSC
    gamma = 0.9 * float(np.abs(X0).sum())
    opt = mc.ConvBPDNProjL1.options(max_iter=iters, rel_stop_tol=1e-4)
    b = mc.ConvBPDNProjL1(D, S, gamma=gamma, opt=opt)
    X1 = np.asarray(b.solve())
    print(f"ConvBPDNProjL1: ||x||_1 = {np.abs(X1).sum():.3f} "
          f"(budget {gamma:.3f}), DFid "
          f"{float(b.getitstat().DFid[-1]):.5f}")

    # reconstruction-ball-constrained minimum l1
    eps = 0.012 * N
    opt2 = mc.ConvMinL1InL2Ball.options(max_iter=iters,
                                        rel_stop_tol=1e-4)
    b2 = mc.ConvMinL1InL2Ball(D, S, epsilon=eps, opt=opt2)
    X2 = np.asarray(b2.solve())
    Sr = np.asarray(b2.reconstruct()).squeeze()
    resid = np.linalg.norm(Sr - S)
    print(f"ConvMinL1InL2Ball: ||Dx-s|| = {resid:.4f} (eps {eps:.4f}),"
          f" ||x||_1 = {np.abs(X2).sum():.3f}")
    return X1, X2


if __name__ == "__main__":
    main()
