#!/usr/bin/env python
"""Convolutional minimum-l1 coding inside an l2 ball.

Solves ``min ||x||_1  s.t.  ||sum_m d_m * x_m - s||_2 <= epsilon``
(analogue of the reference's examples/scripts/csc/cminl1_gry.py,
``sporco/admm/cbpdn.py:1830``): sparse-codes the highpass component of
an image with the constraint set from a known noise budget.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.cbpdn import ConvMinL1InL2Ball
from sporco_tpu.utils import util
from sporco_tpu.utils.signal import tikhonov_filter


def main(N=64, sigma=0.05, iters=100):
    rng = np.random.default_rng(0)
    ei = util.ExampleImages(scaled=True, gray=True)
    img = np.asarray(ei.image(ei.images()[0], idxexp=np.s_[:N, :N]),
                     np.float32)
    noisy = img + sigma * rng.standard_normal(img.shape).astype(
        np.float32)
    sl, sh = tikhonov_filter(noisy, 10.0)
    sl, sh = np.asarray(sl), np.asarray(sh)

    D = util.convdicts()["G:8x8x32"].astype(np.float32)
    eps = 1.1 * sigma * N
    b = ConvMinL1InL2Ball(
        D, sh, epsilon=eps,
        opt=ConvMinL1InL2Ball.options(max_iter=iters,
                                      rel_stop_tol=1e-4))
    X = np.asarray(b.solve())
    shr = np.asarray(b.reconstruct()).squeeze()
    cns = float(np.linalg.norm(shr - sh))
    dens = float(np.mean(np.abs(X) > 1e-5))
    print(f"conv min-l1 in l2 ball: ||Dx - s|| {cns:.4f} "
          f"(eps {eps:.4f}), coefficient density {dens:.4f}")
    assert cns <= eps * 1.1
    assert dens < 0.5                 # solution actually sparse
    return sl + shr


if __name__ == "__main__":
    main(iters=250)
