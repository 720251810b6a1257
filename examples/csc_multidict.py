#!/usr/bin/env python
"""Coupled sparse coding with multiple dictionaries.

Two related signals (a clean rendering and a blurred rendering of the
same scene) are coded with SHARED coefficient maps against their own
dictionaries (equivalent of the reference's MultiDictConvBPDN wrapper,
sporco/admm/cbpdn.py:2779)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.cbpdn import ConvBPDN, MultiDictConvBPDN
from sporco_tpu.utils import util
from sporco_tpu.utils.signal import tikhonov_filter


def main(N=64, iters=40):
    ei = util.ExampleImages(scaled=True, gray=True)
    img = np.asarray(ei.image(ei.images()[0], idxexp=np.s_[:N, :N]),
                     np.float32)
    _, sh = tikhonov_filter(img, 5.0)
    sh = np.asarray(sh, np.float32)
    # second view: blurred version of the same scene
    k = np.ones((3, 3), np.float32) / 9.0
    shb = np.fft.irfft2(np.fft.rfft2(k, s=sh.shape)
                        * np.fft.rfft2(sh), s=sh.shape).astype(np.float32)

    D0 = util.convdicts()["G:8x8x32"].astype(np.float32)
    # blurred-view dictionary: the same filters blurred
    D1 = np.fft.irfft2(np.fft.rfft2(k, s=(8, 8))[..., None]
                       * np.fft.rfft2(D0, axes=(0, 1)),
                       s=(8, 8), axes=(0, 1)).astype(np.float32)

    b = MultiDictConvBPDN(ConvBPDN, [D0, D1], [sh, shb], 0.05,
                          opt=ConvBPDN.options(max_iter=iters,
                                               rel_stop_tol=5e-3))
    b.solve()
    r0 = np.asarray(b.reconstruct(0)).squeeze()
    r1 = np.asarray(b.reconstruct(1)).squeeze()
    e0 = np.linalg.norm(r0 - sh) / np.linalg.norm(sh)
    e1 = np.linalg.norm(r1 - shb) / np.linalg.norm(shb)
    print(f"multi-dict CSC (shared maps): rel err view0 {e0:.3f}, "
          f"view1 {e1:.3f}")
    assert e0 < 0.8 and e1 < 0.8
    return b


if __name__ == "__main__":
    main(iters=100)
