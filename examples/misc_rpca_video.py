#!/usr/bin/env python
"""Video background/foreground separation with Robust PCA.

Stacks video frames as matrix columns; the low-rank component captures
the static background and the sparse component the moving foreground
(equivalent of the reference's examples/scripts/misc/rpca_video.py).
Uses the rank-bounded randomized-SVD nuclear prox."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.rpca import RobustPCA


def main(N=48, T=24, iters=100):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[:N, :N]
    bg = np.exp(-((xx - N / 2) ** 2 + (yy - N / 3) ** 2) / (N * 2.0))
    frames = []
    for t in range(T):
        f = bg.copy()
        cx, cy = (4 + 2 * t) % (N - 6), (8 + t) % (N - 6)
        f[cy:cy + 5, cx:cx + 5] += 1.0          # moving object
        frames.append(f.ravel())
    S = np.stack(frames, axis=-1).astype(np.float32)   # (N*N, T)

    b = RobustPCA(S, lmbda=0.05,
                  opt=RobustPCA.options(max_iter=iters,
                                        rel_stop_tol=1e-5),
                  svd_rank=4)
    X, Y = b.solve()
    X, Y = np.asarray(X), np.asarray(Y)
    # background is rank-1-ish; foreground support matches the object
    sv = np.linalg.svd(X, compute_uv=False)
    fg_density = np.mean(np.abs(Y) > 1e-3)
    print(f"RPCA video: leading sv ratio "
          f"{sv[0] / max(sv[1], 1e-6):.1f}, foreground density "
          f"{fg_density:.3f}")
    assert sv[0] > 5 * sv[1]
    assert fg_density < 0.1
    return X, Y


if __name__ == "__main__":
    main()
