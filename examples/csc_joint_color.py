#!/usr/bin/env python
"""Colour CSC with joint sparsity across channels.

Equivalent of the reference's examples/scripts/csc/cbpdn_jnt_clr.py:
a grayscale dictionary codes each colour channel, and an l2,1 penalty
over the channel axis couples the channel coefficient maps (the same
atoms activate in all three channels at the same locations).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=64, M=8, iters=60):
    from sporco_tpu.models import cbpdn as mc
    from sporco_tpu.utils.util import convdicts
    from sporco_tpu.utils.metric import psnr

    rng = np.random.default_rng(12345)
    x = np.linspace(-1, 1, N, dtype=np.float32)
    r = np.hypot(*np.meshgrid(x, x))
    img = np.stack([0.5 + 0.4 * np.cos(6 * r),
                    0.5 + 0.3 * np.cos(6 * r + 0.4),
                    0.5 + 0.2 * np.cos(6 * r + 0.8)], axis=-1).astype(
                        np.float32)
    noisy = img + 0.05 * rng.standard_normal(img.shape).astype(
        np.float32)
    D = convdicts()["G:8x8x32"][..., :M].astype(np.float32)

    # channels as the C axis (dimK=0)
    opt = mc.ConvBPDNJoint.options(max_iter=iters, rel_stop_tol=1e-3)
    b = mc.ConvBPDNJoint(D, noisy, lmbda=0.05, mu=0.02, opt=opt,
                         dimK=0)
    b.solve()
    its = b.getitstat()
    rec = np.asarray(b.reconstruct()).squeeze()
    if rec.shape != img.shape:
        rec = np.moveaxis(rec, 0, -1)
    print(f"ConvBPDNJoint: {len(its)} iters, obj "
          f"{float(its.ObjFun[-1]):.4f}, RegL21 "
          f"{float(its.RegL21[-1]):.4f}, PSNR "
          f"{psnr(img, rec):.2f} dB (noisy {psnr(img, noisy):.2f})")
    return rec


if __name__ == "__main__":
    main()
