#!/usr/bin/env python
"""Video (3-D) convolutional dictionary learning.

Learns a dictionary of 3-D space-time filters from a video volume
end-to-end (analogue of the reference's
examples/scripts/cdl/cbpdndl_video.py: ``cbpdndl.ConvBPDNDictLearn``
with ``dimN=3``), then verifies that sparse coding with the learned
dictionary reconstructs the video.  Complements ``csc_video.py``,
which only sparse-codes a volume with a FIXED dictionary.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.cbpdn import ConvBPDN
from sporco_tpu.models.dictlrn import ConvBPDNDictLearn


def _video(N, T, rng):
    """Moving-blob synthetic video: drifting Gaussians."""
    yy, xx = np.mgrid[:N, :N]
    frames = []
    for t in range(T):
        f = np.zeros((N, N), np.float32)
        for b in range(3):
            cx = (5 + 3 * b + 2 * t) % N
            cy = (8 * b + t) % N
            f += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 6.0)
        frames.append(f)
    S = np.stack(frames, axis=-1)
    return S + 0.02 * rng.standard_normal(S.shape).astype(np.float32)


def main(N=32, T=8, M=6, iters=20):
    rng = np.random.default_rng(0)
    S = _video(N, T, rng)

    # random initial 3-D (space x space x time) dictionary
    dsz = (5, 5, 3, M)
    D0 = rng.standard_normal(dsz).astype(np.float32)
    D0 /= np.sqrt((D0 ** 2).sum(axis=(0, 1, 2), keepdims=True))

    d = ConvBPDNDictLearn(D0, S, lmbda=0.1, dimN=3, max_iter=iters,
                          xmethod="admm", dmethod="cns")
    D1 = np.asarray(d.solve())
    assert D1.shape == dsz
    # unit-norm constraint held by the Pcn projection
    nrm = np.sqrt((D1 ** 2).sum(axis=(0, 1, 2)))
    assert np.allclose(nrm, 1.0, atol=1e-4)

    # the learned dictionary must sparse-code the video better than the
    # random initial one at the same iteration budget
    def _recon_err(D):
        b = ConvBPDN(D, S, lmbda=0.05, dimN=3,
                     opt=ConvBPDN.options(max_iter=40,
                                          rel_stop_tol=0.0))
        b.solve()
        Sr = np.asarray(b.reconstruct()).squeeze()
        return np.linalg.norm(Sr - S) / np.linalg.norm(S)

    e0, e1 = _recon_err(D0), _recon_err(D1)
    print(f"video CDL: dict {D1.shape}, recon err random {e0:.3f} -> "
          f"learned {e1:.3f}")
    assert e1 < e0
    assert e1 < 0.5
    return D1


if __name__ == "__main__":
    main(iters=50)
