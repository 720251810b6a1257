#!/usr/bin/env python
"""Convolutional dictionary update (CCMOD) method comparison.

Equivalent of the reference's examples/scripts/cdl/ccmod_cns_gry.py and
ccmod_pgm_gry.py: given fixed sparse coefficient maps, fit the
convolutional dictionary subject to the unit-norm support constraint,
with the three ADMM methods (iterated Sherman-Morrison, conjugate
gradient, consensus) and the PGM update.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=32, Nd=6, M=6, K=4, iters=60):
    import jax.numpy as jnp
    from sporco_tpu.models.ccmod import (ConvCnstrMOD,
                                         ConvCnstrMODOptions)
    from sporco_tpu.models import pgm as mpgm

    rng = np.random.default_rng(12345)
    D0 = rng.standard_normal((Nd, Nd, M))
    D0 /= np.sqrt((D0 ** 2).sum(axis=(0, 1), keepdims=True))
    X = np.zeros((N, N, 1, K, M))
    flat = X.reshape(-1)
    idx = rng.choice(flat.size, 20 * K, replace=False)
    flat[idx] = np.abs(rng.standard_normal(20 * K)) + 0.5
    Df = np.fft.rfftn(D0, s=(N, N), axes=(0, 1)).reshape(
        N, N // 2 + 1, 1, 1, M)
    Xf = np.fft.rfftn(X, axes=(0, 1))
    S = np.fft.irfftn(np.sum(Df * Xf, axis=-1), s=(N, N),
                      axes=(0, 1))[:, :, 0]

    def align(D1):
        # best-match cosine similarity of learned atoms to truth
        D1 = np.asarray(D1).reshape(Nd, Nd, M)
        nrm = np.sqrt((D1 ** 2).sum((0, 1), keepdims=True))
        sims = np.abs(np.einsum("uvm,uvn->mn",
                                D1 / np.maximum(nrm, 1e-12), D0))
        return sims.max(axis=1).mean()

    for method in ("ism", "cg", "cns"):
        opt = ConvCnstrMODOptions(method=method, max_iter=iters,
                                  rel_stop_tol=1e-6)
        b = ConvCnstrMOD(X, S, (Nd, Nd, M), method=method, opt=opt,
                         dtype=jnp.float64)
        b.solve()
        D1 = np.asarray(b.getdict())
        print(f"CCMOD[{method}]: {len(b.getitstat())} iters, atom "
              f"alignment {align(D1):.4f}")

    bp = mpgm.ConvCnstrMOD(X, S, (Nd, Nd, M),
                           opt=mpgm.ConvCnstrMOD.options(
                               max_iter=iters, rel_stop_tol=1e-6),
                           dtype=jnp.float64)
    bp.solve()
    D2 = np.asarray(bp.getdict())
    print(f"CCMOD[pgm]: {len(bp.getitstat())} iters, atom alignment "
          f"{align(D2):.4f}")
    return D2


if __name__ == "__main__":
    main()
