#!/usr/bin/env python
"""Masked online convolutional dictionary learning.

Equivalent of the reference's examples/scripts/cdl/onlinecdl_msk_gry.py:
streaming dictionary learning where each training image arrives with a
mask of observed pixels (mask-decoupled CSC step, projected SGD
dictionary step).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=48, Nd=6, M=8, nsamples=4, iters=40):
    import jax.numpy as jnp
    from sporco_tpu.models import cbpdn, dictlrn

    rng = np.random.default_rng(12345)
    D0 = rng.standard_normal((Nd, Nd, M)).astype(np.float32)
    x = np.linspace(-1, 1, N, dtype=np.float32)

    copt = cbpdn.ConvBPDNMaskDcpl.options(max_iter=iters,
                                          rel_stop_tol=5e-3)
    d = dictlrn.OnlineConvBPDNMaskDictLearn(D0, lmbda=0.1, eta_a=10.0,
                                            eta_b=5.0, cbpdn_opt=copt)
    for k in range(nsamples):
        img = (0.5 + 0.4 * np.sin((2 + k) * np.pi * np.outer(x, x))
               ).astype(np.float32)
        W = (rng.random((N, N)) > 0.25).astype(np.float32)
        d.solve(W * img, W=W)
        its = d.getitstat()
        print(f"sample {k}: xstep obj "
              f"{float(its['XObjFun'][-1]):.4f}, eta "
              f"{float(its['Eta'][-1]):.3f}")
    D1 = np.asarray(d.getdict())
    nrm = np.sqrt((D1 ** 2).sum(axis=(0, 1)))
    print(f"learned dictionary {D1.shape}, atom norms in "
          f"[{nrm.min():.3f}, {nrm.max():.3f}]")
    return D1


if __name__ == "__main__":
    main()
