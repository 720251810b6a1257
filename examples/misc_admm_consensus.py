#!/usr/bin/env python
"""Generic ADMM consensus: distributed least squares.

Solves a ridge regression whose data is partitioned into blocks, each
handled by its own proximal operator, with the consensus y-step
averaging the block variables (equivalent of the reference's
examples/scripts/misc/admmcnsns.py, which demonstrates ADMMConsensus
directly)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.ppp import PPPConsensus


def main(N=256, M=64, blocks=4, iters=100):
    rng = np.random.default_rng(12345)
    A = rng.standard_normal((N, M)).astype(np.float32)
    x0 = rng.standard_normal((M, 1)).astype(np.float32)
    s = A @ x0 + 0.01 * rng.standard_normal((N, 1)).astype(np.float32)

    # per-block least-squares prox: argmin_x (1/2)||A_i x - s_i||^2 +
    # (rho/2)||x - v||^2, via each block's cached eigendecomposition
    nb = N // blocks
    proxfi = []
    import jax.numpy as jnp
    for i in range(blocks):
        Ai = jnp.asarray(A[i * nb:(i + 1) * nb])
        si = jnp.asarray(s[i * nb:(i + 1) * nb])
        G = Ai.T @ Ai
        w, V = np.linalg.eigh(np.asarray(G))
        w, V = jnp.asarray(w), jnp.asarray(V)
        Ats = Ai.T @ si

        def make(ats=Ats, w=w, V=V):
            def prox(v, rho):
                rhs = ats + rho * v
                return V @ ((V.T @ rhs) / (w[:, None] + rho))
            return prox
        proxfi.append(make())

    b = PPPConsensus((M, 1), proxfi,
                     opt=PPPConsensus.options(max_iter=iters, rho=1.0))
    x = np.asarray(b.solve())
    err = np.linalg.norm(x - x0) / np.linalg.norm(x0)
    # direct solution for comparison
    xd = np.linalg.lstsq(A, s, rcond=None)[0]
    cons_vs_direct = np.linalg.norm(x - xd) / np.linalg.norm(xd)
    print(f"consensus least squares over {blocks} blocks: rel err vs "
          f"truth {err:.3e}, vs direct solve {cons_vs_direct:.3e}")
    assert cons_vs_direct < 1e-2
    return x


if __name__ == "__main__":
    main()
