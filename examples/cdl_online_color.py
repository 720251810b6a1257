#!/usr/bin/env python
"""Online colour convolutional dictionary learning.

Streams colour samples through the online/SGD dictionary update
(equivalent of the reference's examples/scripts/cdl/onlinecdl_clr.py)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.dictlrn import OnlineConvBPDNDictLearn
from sporco_tpu.models.cbpdn import ConvBPDN
from sporco_tpu.utils import util
from sporco_tpu.utils.signal import tikhonov_filter


def main(N=48, M=8, nsteps=6):
    ei = util.ExampleImages(scaled=True)
    img = ei.image("portrait.png")
    rng = np.random.default_rng(0)
    D0 = rng.standard_normal((5, 5, 3, M)).astype(np.float32)

    d = OnlineConvBPDNDictLearn(
        D0, lmbda=0.1, eta_a=10.0, eta_b=5.0, dtype=np.float32,
        cbpdn_opt=ConvBPDN.options(max_iter=30, rel_stop_tol=1e-3))
    for j in range(nsteps):
        r = rng.integers(img.shape[0] - N)
        c = rng.integers(img.shape[1] - N)
        _, sh = tikhonov_filter(img[r:r + N, c:c + N], 5.0)
        d.solve(np.asarray(sh, np.float32))
    D = np.asarray(d.getdict())
    nrm = np.sqrt((D ** 2).sum(axis=(0, 1, 2)))
    print(f"online colour CDL: dict {D.shape}, filter norms "
          f"[{nrm.min():.3f}, {nrm.max():.3f}] after {nsteps} samples")
    assert D.shape == (5, 5, 3, M)
    assert np.allclose(nrm, 1.0, atol=1e-5)
    return D


if __name__ == "__main__":
    main(nsteps=20)
