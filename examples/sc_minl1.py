#!/usr/bin/env python
"""Minimum-l1 recovery inside an l2 ball.

Solves ``min ||x||_1  s.t.  ||Dx - s||_2 <= epsilon`` -- the
constrained formulation that fixes the noise level instead of tuning a
regularisation weight (analogue of the reference's
examples/scripts/sc/minl1prjl2.py, ``sporco/admm/bpdn.py:920``).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.bpdn import MinL1InL2Ball


def main(N=128, M=256, nnz=16, sigma=0.02, iters=200):
    rng = np.random.default_rng(0)
    D = rng.standard_normal((N, M)).astype(np.float32)
    D /= np.sqrt((D ** 2).sum(axis=0, keepdims=True))
    x0 = np.zeros((M, 1), np.float32)
    x0[rng.choice(M, nnz, replace=False)] = \
        rng.standard_normal((nnz, 1))
    s0 = D @ x0
    noise = sigma * rng.standard_normal(s0.shape).astype(np.float32)
    s = s0 + noise

    # the natural epsilon: the (approximately known) noise norm
    eps = 1.1 * float(np.linalg.norm(noise))
    b = MinL1InL2Ball(
        D, s, epsilon=eps,
        opt=MinL1InL2Ball.options(max_iter=iters, rel_stop_tol=1e-5))
    x = np.asarray(b.solve())

    err = np.linalg.norm(x - x0) / np.linalg.norm(x0)
    cns = np.linalg.norm(D @ x - s)
    print(f"min-l1 in l2 ball: recovery err {err:.4f}, "
          f"||Dx - s|| {cns:.4f} (eps {eps:.4f})")
    assert cns <= eps * 1.05          # constraint held
    assert err < 0.2                  # support recovered
    return x


if __name__ == "__main__":
    main(iters=500)
