#!/usr/bin/env python
"""Plug-and-Play ADMM demosaicing.

Restores a full colour image from a Bayer-mosaiced observation with a
denoiser prior (equivalent of the reference's
examples/scripts/ppp/ppp_admm_dmsc.py; the bilinear demosaic provides
the baseline and the data-fidelity prox works on the mosaic mask)."""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sporco_tpu.models.ppp import PPP
from sporco_tpu.utils import util
from sporco_tpu.utils.interp import bilinear_demosaic
from sporco_tpu.utils.metric import psnr


def _mosaic_mask(shape):
    """RGGB Bayer sampling mask, (N, N, 3)."""
    W = np.zeros(shape, np.float32)
    W[0::2, 0::2, 0] = 1.0          # R
    W[0::2, 1::2, 1] = 1.0          # G
    W[1::2, 0::2, 1] = 1.0          # G
    W[1::2, 1::2, 2] = 1.0          # B
    return W


def main(N=64, iters=20):
    ei = util.ExampleImages(scaled=True)
    img = np.asarray(ei.image("portrait.png", idxexp=np.s_[:N, :N]),
                     np.float32)
    W = _mosaic_mask(img.shape)
    obs = W * img                     # mosaiced observation
    mosaic = obs.sum(axis=-1)

    base = np.asarray(bilinear_demosaic(mosaic), np.float32)

    import jax.numpy as jnp
    Wj = jnp.asarray(W)
    obsj = jnp.asarray(obs)

    def f(x):
        return 0.5 * jnp.sum((Wj * x - obsj) ** 2)

    def proxf(x, rho):
        # closed-form masked-fidelity prox
        return (obsj + rho * x) * Wj / (Wj + rho) + x * (1 - Wj)

    basej = jnp.asarray(base)

    def proxg(x, rho):
        # light denoiser prior: local-mean smoothing toward the
        # bilinear estimate
        import jax
        k = jnp.ones((3, 3, 1), x.dtype) / 9.0
        sm = jax.scipy.signal.convolve(x, k, mode="same")
        return (0.7 * x + 0.2 * sm
                + 0.1 * basej.astype(x.dtype)).astype(x.dtype)

    b = PPP(img.shape, f, proxf, proxg,
            opt=PPP.options(max_iter=iters, rho=0.3))
    X = np.asarray(b.solve())
    print(f"PPP demosaic: PSNR bilinear {psnr(img, base):.2f} dB -> "
          f"PPP {psnr(img, X):.2f} dB")
    return X


if __name__ == "__main__":
    main(iters=50)
