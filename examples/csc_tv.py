#!/usr/bin/env python
"""Convolutional sparse coding with TV-regularised coefficient maps.

Equivalent of the reference's cbpdntv solvers
(``sporco/admm/cbpdntv.py``): the coefficient maps additionally carry a
total-variation penalty (scalar per map, vector across maps, or the
recombined form), which suppresses speckle in the maps when denoising.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=48, M=6, iters=50):
    from sporco_tpu.models import cbpdntv
    from sporco_tpu.utils.util import convdicts

    rng = np.random.default_rng(12345)
    D = convdicts()["G:8x8x32"][..., :M].astype(np.float32)
    x = np.linspace(-1, 1, N, dtype=np.float32)
    S = (0.5 + 0.4 * np.sin(3 * np.pi * np.outer(x, x))).astype(
        np.float32)
    S += 0.05 * rng.standard_normal((N, N)).astype(np.float32)

    for name, cls in [("scalar TV", cbpdntv.ConvBPDNScalarTV),
                      ("vector TV", cbpdntv.ConvBPDNVectorTV),
                      ("recombined TV", cbpdntv.ConvBPDNRecTV)]:
        opt = cls.options(max_iter=iters, rel_stop_tol=1e-3)
        b = cls(D, S, lmbda=0.05, mu=0.02, opt=opt)
        b.solve()
        its = b.getitstat()
        print(f"{name}: {len(its)} iters, obj "
              f"{float(its.ObjFun[-1]):.4f}, "
              f"r {float(its.PrimalRsdl[-1]):.2e}")
    return None


if __name__ == "__main__":
    main()
