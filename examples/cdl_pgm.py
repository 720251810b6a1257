#!/usr/bin/env python
"""Convolutional dictionary learning with PGM (FISTA) substeps.

``ConvBPDNDictLearn`` with ``xmethod='pgm'`` and ``dmethod='pgm'``:
both the sparse-coding and the dictionary-update alternation steps are
accelerated proximal-gradient solvers instead of ADMM (analogue of the
reference's examples/scripts/cdl/cbpdndl_pgm_clr.py,
``dictlrn/cbpdndl.py:31-229`` method factories).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.cbpdn import ConvBPDN
from sporco_tpu.models.dictlrn import ConvBPDNDictLearn
from sporco_tpu.utils import util
from sporco_tpu.utils.signal import tikhonov_filter


def main(N=32, Nd=6, M=8, iters=15):
    rng = np.random.default_rng(0)
    ei = util.ExampleImages(scaled=True)
    img = np.asarray(ei.image("portrait.png", idxexp=np.s_[:N, :N]),
                     np.float32)
    _, sh = tikhonov_filter(img, 5.0)
    S = np.asarray(sh, np.float32)

    D0 = rng.standard_normal((Nd, Nd, 3, M)).astype(np.float32)
    D0 /= np.sqrt((D0 ** 2).sum(axis=(0, 1, 2), keepdims=True))

    d = ConvBPDNDictLearn(D0, S, lmbda=0.05, dimK=0, max_iter=iters,
                          xmethod="pgm", dmethod="pgm")
    D1 = np.asarray(d.solve())
    assert D1.shape == D0.shape
    nrm = np.sqrt((D1 ** 2).sum(axis=(0, 1, 2)))
    assert np.allclose(nrm, 1.0, atol=1e-3)

    # learned dictionary must beat the random initial one
    def _err(D):
        b = ConvBPDN(D, S, lmbda=0.05, dimK=0,
                     opt=ConvBPDN.options(max_iter=40,
                                          rel_stop_tol=0.0))
        b.solve()
        Sr = np.asarray(b.reconstruct()).squeeze()
        return np.linalg.norm(Sr - S) / np.linalg.norm(S)

    e0, e1 = _err(D0), _err(D1)
    print(f"PGM-PGM colour CDL: recon err random {e0:.3f} -> "
          f"learned {e1:.3f}")
    assert e1 < e0
    return D1


if __name__ == "__main__":
    main(iters=50)
