#!/usr/bin/env python
"""Custom dictionary learning: joint-sparse colour coding + CCMOD.

Composes a dictionary-learning algorithm from parts with the generic
:class:`DictLearn` coordinator -- here a :class:`ConvBPDNJoint` sparse
coding step (joint sparsity over colour channels, grayscale
dictionary) with a :class:`ConvCnstrMOD` dictionary update, a
combination the fixed ``ConvBPDNDictLearn`` coordinator does not offer
(analogue of the reference's
examples/scripts/cdl/cbpdndl_jnt_clr.py, ``dictlrn/dictlrn.py:187``).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.cbpdn import ConvBPDNJoint
from sporco_tpu.models.ccmod import ConvCnstrMOD, ConvCnstrMODOptions
from sporco_tpu.models.dictlrn import DictLearn
from sporco_tpu.utils import util
from sporco_tpu.utils.signal import tikhonov_filter


def main(N=32, Nd=6, M=8, iters=15):
    rng = np.random.default_rng(0)
    ei = util.ExampleImages(scaled=True)
    img = np.asarray(ei.image("portrait.png", idxexp=np.s_[:N, :N]),
                     np.float32)
    _, sh = tikhonov_filter(img, 5.0)
    S = np.asarray(sh, np.float32)            # (N, N, 3), K=0

    D0 = rng.standard_normal((Nd, Nd, M)).astype(np.float32)
    D0 /= np.sqrt((D0 ** 2).sum(axis=(0, 1), keepdims=True))

    xstep = ConvBPDNJoint(
        D0, S, lmbda=0.05, mu=0.02, dimK=0,
        opt=ConvBPDNJoint.options(max_iter=1, rel_stop_tol=0.0,
                                  rho=5e1 * 0.05 + 1.0))
    dstep = ConvCnstrMOD(
        xstep.getcoef(), S, (Nd, Nd, M), method="cns", dimK=0,
        opt=ConvCnstrMODOptions(method="cns", max_iter=1,
                                rel_stop_tol=0.0))
    d = DictLearn(xstep, dstep, max_iter=iters)
    D1 = np.asarray(d.solve()).reshape(Nd, Nd, M)

    nrm = np.sqrt((D1 ** 2).sum(axis=(0, 1)))
    assert np.allclose(nrm, 1.0, atol=1e-3)

    Sr = np.asarray(xstep.reconstruct()).squeeze()
    err = np.linalg.norm(Sr - S) / np.linalg.norm(S)
    print(f"joint-colour DictLearn composition: dict {D1.shape}, "
          f"highpass recon err {err:.3f}")
    assert err < 0.9
    return D1


if __name__ == "__main__":
    main(iters=50)
