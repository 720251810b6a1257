#!/usr/bin/env python
"""Accelerator API comparison (the reference's cbpdn_cuda.py analogue).

Runs the same masked gradient-regularised CSC problem through the
`sporco_tpu.accel` functional entry points (the sporco.cuda parity
surface) and through the model classes, confirming identical results
and reporting throughput."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np

from sporco_tpu import accel
from sporco_tpu.models.cbpdn import ConvBPDN
from sporco_tpu.utils import util
from sporco_tpu.utils.signal import tikhonov_filter


def main(N=64, iters=50):
    ei = util.ExampleImages(scaled=True, gray=True)
    img = ei.image(ei.images()[0], idxexp=np.s_[:N, :N])
    _, sh = tikhonov_filter(img, 5.0)
    sh = np.asarray(sh, np.float32)
    D = util.convdicts()["G:8x8x32"].astype(np.float32)

    print(f"accel backend: {accel.device_count()} device(s), "
          f"{accel.device_name()}")

    # functional entry point (reference-style option dict)
    opt = {"MaxMainIter": iters, "RelStopTol": 0.0}
    t0 = time.time()
    Xa = np.asarray(accel.cbpdn(D, sh, 0.05, opt=opt))
    ta = time.time() - t0

    # model class with the native options object
    b = ConvBPDN(D, sh, 0.05,
                 opt=ConvBPDN.options(max_iter=iters, rel_stop_tol=0.0))
    Xb = np.asarray(b.solve())
    dev = np.abs(Xa.squeeze() - Xb.squeeze()).max()
    print(f"accel.cbpdn == ConvBPDN: max dev {dev:.2e} "
          f"({iters / ta:.0f} it/s first call incl. compile)")
    assert dev < 1e-6

    # masked + gradient-regularised fused entry points
    W = np.ones((N, N), np.float32)
    W[N // 3:N // 2, N // 3:N // 2] = 0.0
    Xm = accel.cbpdngrdmsk(D, sh, W, 0.05, 0.05, opt=opt)
    print(f"cbpdngrdmsk: X {np.asarray(Xm).squeeze().shape}")
    return Xa


if __name__ == "__main__":
    main()
