#!/usr/bin/env python
"""Multi-Agent Consensus Equilibrium (MACE) demosaicing.

Equivalent of the reference's examples/scripts/ppp/ppp_admmcns_dmsc.py:
a Bayer-sampled image is restored as the consensus equilibrium of two
agents -- a data-fidelity proximal operator on the observed mosaic and
a denoiser prior (here a Tikhonov-smoothing denoiser; the reference
plugs BM3D) -- via weighted ADMM consensus.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=64, iters=60):
    import jax.numpy as jnp
    from sporco_tpu.models.ppp import PPPConsensus
    from sporco_tpu.utils.interp import bilinear_demosaic
    from sporco_tpu.utils.signal import tikhonov_filter
    from sporco_tpu.utils.metric import psnr

    rng = np.random.default_rng(12345)
    x = np.linspace(-1, 1, N, dtype=np.float32)
    r = np.hypot(*np.meshgrid(x, x))
    img = np.stack([0.5 + 0.4 * np.cos(6 * r),
                    0.5 + 0.4 * np.sin(5 * r),
                    0.5 - 0.4 * np.cos(4 * r)], axis=-1).astype(
                        np.float32)

    # Bayer mosaic (GRBG) + noise
    mask = np.zeros((N, N, 3), np.float32)
    mask[0::2, 1::2, 0] = 1       # R
    mask[0::2, 0::2, 1] = 1       # G
    mask[1::2, 1::2, 1] = 1       # G
    mask[1::2, 0::2, 2] = 1       # B
    obs = mask * (img + 0.01 * rng.standard_normal(img.shape)
                  .astype(np.float32))
    maskj = jnp.asarray(mask)
    obsj = jnp.asarray(obs)

    def proxf(v, rho):
        # prox of (1/2)||M x - obs||^2
        return (obsj + rho * v) / (maskj + rho)

    def proxg(v, rho):
        # smoothing denoiser as the prior agent
        sl, _ = tikhonov_filter(v, 2.0)
        return 0.25 * v + 0.75 * sl

    b = PPPConsensus((N, N, 3), [proxf, proxg],
                     opt=PPPConsensus.options(max_iter=iters))
    rec = np.asarray(b.solve())
    base = np.asarray(bilinear_demosaic(
        (obs.sum(-1)).astype(np.float32)))
    print(f"MACE demosaic: observed PSNR "
          f"{psnr(img, obs):.2f} dB -> consensus "
          f"{psnr(img, rec):.2f} dB "
          f"(bilinear baseline {psnr(img, base):.2f} dB)")
    return rec


if __name__ == "__main__":
    main()
