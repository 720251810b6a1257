#!/usr/bin/env python
"""Convolutional sparse coding with lateral inhibition.

Equivalent of the reference's examples/scripts/csc/cbpdnin_gry.py and
cbpdnin_wgt_gry.py (ConvBPDNInhib; music-transcription style use):
filters are grouped, and coefficients of filters in the same group are
discouraged from being active at nearby spatial positions via evolving
inhibition weights.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=64, M=8, iters=60):
    from sporco_tpu.models import cbpdnin
    from sporco_tpu.models import cbpdn as mc
    from sporco_tpu.utils.util import convdicts

    rng = np.random.default_rng(12345)
    D = convdicts()["G:8x8x32"][..., :M].astype(np.float32)
    # sparse synthetic signal from the dictionary
    X0 = np.zeros((N, N, M), np.float32)
    idx = rng.choice(N * N * M, 20, replace=False)
    X0.ravel()[idx] = rng.uniform(1.0, 2.0, 20)
    Df = np.fft.rfft2(D, s=(N, N), axes=(0, 1))
    S = np.fft.irfft2((np.fft.rfft2(X0, axes=(0, 1)) * Df).sum(-1),
                      s=(N, N)).astype(np.float32)

    # group pairs of filters; inhibition within each group
    Wg = np.zeros((M // 2, M), np.float32)
    for g in range(M // 2):
        Wg[g, 2 * g:2 * g + 2] = 1.0

    opt = cbpdnin.ConvBPDNInhib.options(max_iter=iters,
                                        rel_stop_tol=0.0)
    b = cbpdnin.ConvBPDNInhib(D, S, Wg=Wg, Whn=8, lmbda=0.05, mu=0.5,
                              opt=opt)
    Xi = np.asarray(b.solve()).squeeze()
    its = b.getitstat()

    optp = mc.ConvBPDN.options(max_iter=iters, rel_stop_tol=0.0)
    bp = mc.ConvBPDN(D, S, lmbda=0.05, opt=optp)
    Xp = np.asarray(bp.solve()).squeeze()

    nz_i = int((np.abs(Xi) > 1e-3).sum())
    nz_p = int((np.abs(Xp) > 1e-3).sum())
    print(f"inhibited CSC: obj {float(its.ObjFun[-1]):.4f}, "
          f"{nz_i} active coefficients (plain CSC: {nz_p})")
    return Xi


if __name__ == "__main__":
    main()
