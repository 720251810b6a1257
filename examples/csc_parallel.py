#!/usr/bin/env python
"""Filter-parallel convolutional sparse coding (ParConvBPDN).

Equivalent of the reference's examples/scripts/csc/parcbpdn_gry.py and
parcbpdn_md_gry.py: the dictionary filters are split into groups that
update independently, with one coupled solve per iteration
(skau-2018-fast).  Where the reference fans groups over a process
pool, here the group axis is a batched array axis -- and, on a
multi-device mesh, sharded over the ``"filter"`` mesh axis so the
coupling sum becomes an ICI all-reduce.  Includes the masked (random
pixel corruption) variant.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=64, M=16, ngrp=4, iters=100):
    from sporco_tpu.models.parcbpdn import ParConvBPDN
    from sporco_tpu.utils.util import convdicts
    from sporco_tpu.utils.metric import psnr

    rng = np.random.default_rng(12345)
    D = convdicts()["G:8x8x32"][..., :M].astype(np.float32)
    x = np.linspace(-1, 1, N, dtype=np.float32)
    img = (0.5 + 0.45 * np.sin(4 * np.pi * np.outer(x, x))).astype(
        np.float32)

    opt = ParConvBPDN.options(max_iter=iters, rel_stop_tol=1e-3)
    b = ParConvBPDN(D, img, lmbda=5e-2, opt=opt, ngrp=ngrp)
    b.solve()
    its = b.getitstat()
    print(f"ParConvBPDN ({ngrp} groups): {len(its)} iters, "
          f"obj {its.ObjFun[-1]:.4f}, r {its.PrimalRsdl[-1]:.3e}")

    # masked variant: reconstruct through 30% missing pixels
    W = (rng.random((N, N)) > 0.3).astype(np.float32)
    bm = ParConvBPDN(D, W * img, lmbda=2e-2, W=W, opt=opt, ngrp=ngrp)
    bm.solve()
    rec = np.asarray(bm.reconstruct()).squeeze()
    print(f"masked ParConvBPDN: inpainting PSNR "
          f"{psnr(img, rec):.2f} dB")
    return rec


if __name__ == "__main__":
    main()
