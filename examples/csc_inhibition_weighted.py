#!/usr/bin/env python
"""Convolutional sparse coding with WEIGHTED lateral inhibition.

Analogue of the reference's examples/scripts/csc/cbpdnin_wgt_gry.py:
two grouping schemes are adjoined into one ``Wg`` matrix with
different non-unit weights per scheme, so group memberships carry
per-group inhibition strengths (``sporco/admm/cbpdnin.py:28``; the
plain-weight case is ``csc_inhibition.py``).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=64, M=8, iters=60):
    from sporco_tpu.models import cbpdnin
    from sporco_tpu.utils.util import convdicts

    rng = np.random.default_rng(12345)
    D = convdicts()["G:8x8x32"][..., :M].astype(np.float32)
    X0 = np.zeros((N, N, M), np.float32)
    idx = rng.choice(N * N * M, 20, replace=False)
    X0.ravel()[idx] = rng.uniform(1.0, 2.0, 20)
    Df = np.fft.rfft2(D, s=(N, N), axes=(0, 1))
    S = np.fft.irfft2((np.fft.rfft2(X0, axes=(0, 1)) * Df).sum(-1),
                      s=(N, N)).astype(np.float32)

    # two adjoined grouping schemes with different weights: pairs at
    # full strength, and one all-filters group at quarter strength
    # (the reference's Wg = append(Wg1, 0.25*Wg2) construction)
    Wg1 = np.zeros((M // 2, M), np.float32)
    for g in range(M // 2):
        Wg1[g, 2 * g:2 * g + 2] = 1.0
    Wg2 = 0.25 * np.ones((1, M), np.float32)
    Wg = np.concatenate([Wg1, Wg2], axis=0)

    opt = cbpdnin.ConvBPDNInhib.options(max_iter=iters,
                                        rel_stop_tol=0.0)
    b = cbpdnin.ConvBPDNInhib(D, S, Wg=Wg, Whn=8, lmbda=0.05, mu=0.1,
                              opt=opt)
    Xw = np.asarray(b.solve()).squeeze()
    its = b.getitstat()
    obj = float(its.ObjFun[-1])

    # unweighted single-scheme run for comparison: the extra weighted
    # global group must further discourage co-activation
    b1 = cbpdnin.ConvBPDNInhib(D, S, Wg=Wg1, Whn=8, lmbda=0.05,
                               mu=0.1, opt=opt)
    X1 = np.asarray(b1.solve()).squeeze()
    nz_w = int((np.abs(Xw) > 1e-3).sum())
    nz_1 = int((np.abs(X1) > 1e-3).sum())
    print(f"weighted-inhibition CSC: obj {obj:.4f}, "
          f"{nz_w} active (single-scheme: {nz_1})")
    assert np.isfinite(obj)
    assert nz_w < Xw.size * 0.05      # solution stays sparse
    return Xw


if __name__ == "__main__":
    main(iters=150)
