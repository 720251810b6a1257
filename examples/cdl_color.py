#!/usr/bin/env python
"""Colour convolutional dictionary learning.

Learns a multi-channel (RGB) convolutional dictionary from colour
image patches (equivalent of the reference's
examples/scripts/cdl/cbpdndl_md_clr.py / cbpdndl_pgm_clr.py family:
the dictionary carries a channel axis, Cd == C == 3).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.dictlrn import ConvBPDNDictLearn
from sporco_tpu.utils import util
from sporco_tpu.utils.signal import tikhonov_filter


def main(N=64, K=3, M=16, iters=20):
    ei = util.ExampleImages(scaled=True)
    img = ei.image("portrait.png")
    if img.ndim != 3:
        img = np.stack([img] * 3, axis=-1)
    rng = np.random.default_rng(0)
    patches = []
    for _ in range(K):
        r = rng.integers(img.shape[0] - N)
        c = rng.integers(img.shape[1] - N)
        _, sh = tikhonov_filter(img[r:r + N, c:c + N], 5.0)
        patches.append(np.asarray(sh))
    S = np.stack(patches, axis=-1).astype(np.float32)   # (N, N, 3, K)

    D0 = rng.standard_normal((6, 6, 3, M)).astype(np.float32)
    d = ConvBPDNDictLearn(D0, S, lmbda=0.1, max_iter=iters,
                          dtype=np.float32)
    d.solve()
    D = np.asarray(d.getdict())
    Sr = np.asarray(d.reconstruct()).squeeze()
    err = np.linalg.norm(Sr - S) / np.linalg.norm(S)
    print(f"colour CDL: dict {D.shape}, reconstruction rel err "
          f"{err:.3f}")
    assert D.shape == (6, 6, 3, M)
    return D


if __name__ == "__main__":
    main(iters=50)
