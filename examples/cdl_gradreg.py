#!/usr/bin/env python
"""Dictionary learning with a gradient-regularised coding stage.

The sparse-coding step adds a gradient penalty so one designated
filter's map absorbs the lowpass component while the rest learn detail
(equivalent of the reference's examples/scripts/cdl/cbpdndl_grd.py)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.dictlrn import ConvBPDNDictLearn
from sporco_tpu.utils import util


def main(N=64, K=2, M=8, iters=20):
    ei = util.ExampleImages(scaled=True, gray=True)
    img = ei.image(ei.images()[0])
    rng = np.random.default_rng(0)
    patches = []
    for _ in range(K):
        r = rng.integers(img.shape[0] - N)
        c = rng.integers(img.shape[1] - N)
        patches.append(img[r:r + N, c:c + N])   # NO highpass split
    S = np.stack(patches, axis=-1).astype(np.float32)

    D0 = rng.standard_normal((6, 6, M)).astype(np.float32)
    # gradient penalty only on the designated lowpass filter's map
    wgrd = np.zeros(M, np.float32)
    wgrd[0] = 1.0
    d = ConvBPDNDictLearn(D0, S, lmbda=0.1, max_iter=iters,
                          dtype=np.float32, mu=0.2, wgrd=wgrd)
    d.solve()
    D = np.asarray(d.getdict())
    err = (np.linalg.norm(np.asarray(d.reconstruct()).squeeze() - S)
           / np.linalg.norm(S))
    print(f"gradient-regularised CDL: dict {D.shape}, reconstruction "
          f"rel err {err:.3f}")
    assert err < 0.5
    return D


if __name__ == "__main__":
    main(iters=50)
