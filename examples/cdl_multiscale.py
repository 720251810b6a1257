#!/usr/bin/env python
"""Multi-scale convolutional dictionary learning.

Learns a dictionary whose filters have two different supports (4x4 and
8x8) in one representation (equivalent of the reference's
examples/scripts/cdl/cbpdndl_msdict_gry.py: a nested ``dsz`` size spec
drives the constraint-set projection)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.dictlrn import ConvBPDNDictLearn
from sporco_tpu.utils import util
from sporco_tpu.utils.signal import tikhonov_filter


def main(N=64, K=2, iters=20):
    ei = util.ExampleImages(scaled=True, gray=True)
    img = ei.image(ei.images()[0])
    rng = np.random.default_rng(0)
    patches = []
    for _ in range(K):
        r = rng.integers(img.shape[0] - N)
        c = rng.integers(img.shape[1] - N)
        _, sh = tikhonov_filter(img[r:r + N, c:c + N], 5.0)
        patches.append(np.asarray(sh))
    S = np.stack(patches, axis=-1).astype(np.float32)

    dsz = ((4, 4, 8), (8, 8, 8))        # 8 small + 8 large filters
    D0 = rng.standard_normal((8, 8, 16)).astype(np.float32)
    d = ConvBPDNDictLearn(D0, S, lmbda=0.1, max_iter=iters,
                          dtype=np.float32, dsz=dsz)
    d.solve()
    D = np.asarray(d.getdict())
    # the first 8 filters must stay within their 4x4 support
    tail = max(np.abs(D[4:, :, :8]).max(), np.abs(D[:, 4:, :8]).max())
    err = (np.linalg.norm(np.asarray(d.reconstruct()).squeeze() - S)
           / np.linalg.norm(S))
    print(f"multi-scale CDL: dict {D.shape}, small-filter tail {tail:.1e}, "
          f"reconstruction rel err {err:.3f}")
    assert tail == 0.0
    return D


if __name__ == "__main__":
    main(iters=50)
