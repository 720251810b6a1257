#!/usr/bin/env python
"""Constrained sparse coding: minimum data fidelity subject to an
l1-ball constraint (equivalent of the reference's
examples/scripts/sc/bpdnprjl1.py), plus the convolutional analogue."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.bpdn import BPDNProjL1
from sporco_tpu.models.cbpdn import ConvBPDNProjL1


def main(N=256, M=512, L=16, iters=150):
    rng = np.random.default_rng(12345)
    D = rng.standard_normal((N, M)).astype(np.float32)
    D /= np.sqrt((D ** 2).sum(axis=0, keepdims=True))
    x0 = np.zeros((M, 1), np.float32)
    x0[rng.choice(M, L, replace=False)] = rng.uniform(0.5, 2.0, (L, 1))
    s = D @ x0
    gamma = float(np.abs(x0).sum())

    b = BPDNProjL1(D, s, gamma,
                   opt=BPDNProjL1.options(max_iter=iters))
    x1 = np.asarray(b.solve())
    err = np.linalg.norm(x1 - x0) / np.linalg.norm(x0)
    l1 = float(np.abs(x1).sum())
    print(f"BPDNProjL1: ||x||_1 {l1:.3f} (gamma {gamma:.3f}), "
          f"recovery rel err {err:.3e}")
    assert l1 <= gamma * 1.01

    # convolutional variant on a small synthetic CSC problem
    Dc = rng.standard_normal((4, 4, 8)).astype(np.float32)
    Dc /= np.sqrt((Dc ** 2).sum(axis=(0, 1), keepdims=True))
    Sc = rng.standard_normal((32, 32)).astype(np.float32)
    c = ConvBPDNProjL1(Dc, Sc, gamma=50.0,
                       opt=ConvBPDNProjL1.options(max_iter=50))
    Xc = np.asarray(c.solve())
    print(f"ConvBPDNProjL1: ||X||_1 {np.abs(Xc).sum():.2f} <= 50")
    return x1


if __name__ == "__main__":
    main()
