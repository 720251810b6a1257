#!/usr/bin/env python
"""Robust regression: least absolute deviations and minimax fitting.

Equivalent of the reference's examples/scripts/misc/regression.py:
fit a line through data with outliers by l2, l1 (LAD), and l-inf
(Chebyshev) criteria; the l1 fit ignores the outliers.  Also runs the
on-device IRLS variant of the LAD fit (jittable alternative to the LP).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(M=64):
    from sporco_tpu.utils.interp import (lstabsdev, lstabsdev_irls,
                                         lstmaxdev)

    rng = np.random.default_rng(12345)
    t = np.linspace(0, 1, M)
    A = np.stack([t, np.ones(M)], axis=1)
    x_true = np.array([2.0, -0.5])
    b = A @ x_true + 0.02 * rng.standard_normal(M)
    b[rng.choice(M, 6, replace=False)] += 4.0     # gross outliers

    x_l2 = np.linalg.lstsq(A, b, rcond=None)[0]
    x_l1 = lstabsdev(A, b)
    x_irls = np.asarray(lstabsdev_irls(A, b))
    x_inf = lstmaxdev(A, b)

    def err(x):
        return np.linalg.norm(x - x_true)

    print(f"true params     {x_true}")
    print(f"l2   fit {x_l2}  err {err(x_l2):.4f}")
    print(f"l1   fit {x_l1}  err {err(x_l1):.4f}  (LP)")
    print(f"l1   fit {x_irls}  err {err(x_irls):.4f}  (IRLS, on-device)")
    print(f"linf fit {x_inf}  err {err(x_inf):.4f}")
    assert err(x_l1) < err(x_l2)
    return x_l1


if __name__ == "__main__":
    main()
