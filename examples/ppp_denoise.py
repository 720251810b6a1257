#!/usr/bin/env python
"""Plug-and-Play Priors deconvolution.

PPP-ADMM where the y-step prox is a plug-in denoiser (here a
DFT-domain Tikhonov gradient smoother; the reference uses BM3D in
examples/scripts/ppp/ppp_admm_dcnv.py).  Any jax-traceable callable
works, and host-side numpy denoisers can be wrapped with
``sporco_tpu.models.ppp.host_prior`` (exercised in
tests/models/test_ppp.py).

Note the complex DFT constants enter the traced functions as
real/imag pairs: on TPU backends complex arrays cannot cross a jit
boundary, so complex values exist only inside the compiled program.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from sporco_tpu.models import ppp
from sporco_tpu.utils import util, metric


def main():
    ei = util.ExampleImages(scaled=True, gray=True)
    img = ei.image(ei.images()[0], idxexp=np.s_[:128, :128]).astype(
        np.float32)

    # blur + noise (host-side numpy)
    krn = np.ones((5, 5), np.float32) / 25.0
    Af = np.fft.rfftn(krn, s=img.shape, axes=(0, 1))
    sblr = np.fft.irfftn(Af * np.fft.rfftn(img), s=img.shape,
                         axes=(0, 1))
    rng = np.random.default_rng(0)
    s = (sblr + 0.01 * rng.standard_normal(img.shape)).astype(np.float32)

    # real/imag constants for the traced fns
    Ar, Ai = Af.real.astype(np.float32), Af.imag.astype(np.float32)
    Sf = np.fft.rfftn(s)
    Sr, Si = Sf.real.astype(np.float32), Sf.imag.astype(np.float32)
    # |G_r|^2 + |G_c|^2 for the Tikhonov denoiser
    gr = np.zeros(img.shape, np.float32); gr[0, 0] = -1; gr[1, 0] = 1
    gc = np.zeros(img.shape, np.float32); gc[0, 0] = -1; gc[0, 1] = 1
    ghg = (np.abs(np.fft.rfftn(gr)) ** 2
           + np.abs(np.fft.rfftn(gc)) ** 2).astype(np.float32)

    def f(x):
        Afj = Ar + 1j * Ai
        Sfj = Sr + 1j * Si
        r = Afj * jnp.fft.rfftn(x) - Sfj
        return 0.5 * jnp.sum(jnp.abs(r) ** 2) / x.size

    def proxf(x, rho):
        # (A^H A + rho I)^{-1} (A^H s + rho x) per DFT bin
        Afj = Ar + 1j * Ai
        Sfj = Sr + 1j * Si
        xf = jnp.fft.rfftn(x)
        zf = (jnp.conj(Afj) * Sfj + rho * xf) / \
            (jnp.abs(Afj) ** 2 + rho)
        return jnp.fft.irfftn(zf, s=x.shape)

    def denoiser(x, rho):
        # Tikhonov gradient smoothing: (I + (lam/rho) G^H G)^{-1} x
        lam = 0.02
        xf = jnp.fft.rfftn(x)
        return jnp.fft.irfftn(xf / (1.0 + (lam / rho) * ghg),
                              s=x.shape)

    opt = ppp.PPP.options(max_iter=30, rho=0.05)
    b = ppp.PPP(img.shape, f, proxf, denoiser, opt=opt)
    x = np.asarray(b.solve())

    print(f"blurred+noisy PSNR {metric.psnr(img, s):.2f} dB  ->  "
          f"PPP restored PSNR {metric.psnr(img, x):.2f} dB")


if __name__ == "__main__":
    main()
