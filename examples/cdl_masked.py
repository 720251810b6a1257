#!/usr/bin/env python
"""Masked convolutional dictionary learning.

Equivalent of the reference's examples/scripts/cdl/cbpdndl_md_gry.py:
learn a convolutional dictionary from training images with missing
pixels (a fidelity mask W decouples the unobserved entries), using
mask-decoupled sparse coding alternated with the masked dictionary
update.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=32, Nd=6, M=8, K=4, iters=20):
    import jax.numpy as jnp
    from sporco_tpu.models.dictlrn import ConvBPDNMaskDictLearn

    rng = np.random.default_rng(12345)
    # training set: sparse combinations of a ground-truth dictionary
    D0 = rng.standard_normal((Nd, Nd, M))
    D0 /= np.sqrt((D0 ** 2).sum(axis=(0, 1), keepdims=True))
    X0 = np.zeros((N, N, 1, K, M))
    flat = X0.reshape(-1)
    idx = rng.choice(flat.size, 12 * K, replace=False)
    flat[idx] = np.abs(rng.standard_normal(12 * K)) + 0.5
    Df = np.fft.rfftn(D0, s=(N, N), axes=(0, 1)).reshape(
        N, N // 2 + 1, 1, 1, M)
    Xf = np.fft.rfftn(X0, axes=(0, 1))
    S = np.fft.irfftn(np.sum(Df * Xf, axis=-1), s=(N, N),
                      axes=(0, 1))[:, :, 0]

    # 25% of pixels unobserved
    W = (rng.random(S.shape) > 0.25).astype(np.float64)
    Dinit = rng.standard_normal((Nd, Nd, M))

    d = ConvBPDNMaskDictLearn(Dinit, W * S, lmbda=0.05, W=W,
                              max_iter=iters, dtype=jnp.float64)
    D1 = np.asarray(d.solve())
    its = d.getitstat()
    print(f"masked CDL: {len(its['Iter'])} outer iters, final "
          f"sparse-coding objective {float(its['XObjFun'][-1]):.4f}")
    nrm = np.sqrt((D1 ** 2).sum(axis=(0, 1)))
    print(f"learned dictionary: {D1.shape}, atom norms in "
          f"[{nrm.min():.3f}, {nrm.max():.3f}]")
    return D1


if __name__ == "__main__":
    main()
