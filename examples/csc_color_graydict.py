#!/usr/bin/env python
"""Colour CSC with a GRAYSCALE dictionary.

A single-channel dictionary codes each colour channel with its own
coefficient maps (Cd=1, C=3: the channels become independent coding
problems sharing the spatial filters), in contrast to
``csc_color.py``'s colour dictionary (analogue of the reference's
examples/scripts/csc/cbpdn_clr_gd.py; channel-handling rules in
``sporco/cnvrep.py:60-84``).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.cbpdn import ConvBPDN
from sporco_tpu.utils import util
from sporco_tpu.utils.signal import tikhonov_filter


def main(N=64, iters=60):
    ei = util.ExampleImages(scaled=True)
    img = np.asarray(ei.image("portrait.png", idxexp=np.s_[:N, :N]),
                     np.float32)
    sl, sh = tikhonov_filter(img, 5.0)
    sl, sh = np.asarray(sl), np.asarray(sh)

    D = util.convdicts()["G:8x8x32"].astype(np.float32)  # grayscale
    b = ConvBPDN(D, sh, lmbda=0.05, dimK=0,
                 opt=ConvBPDN.options(max_iter=iters))
    X = np.asarray(b.solve())
    # per-channel coefficient maps: the C axis is the coding channel
    assert b.cri.C == 3 and b.cri.Cd == 1
    Sr = np.asarray(b.reconstruct()).squeeze()
    err = np.linalg.norm(Sr - sh) / np.linalg.norm(sh)
    print(f"gray-dict colour CSC: X {X.shape}, highpass recon err "
          f"{err:.3f}")
    assert err < 0.5
    return sl + Sr


if __name__ == "__main__":
    main(iters=200)
