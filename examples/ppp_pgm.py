#!/usr/bin/env python
"""Plug-and-Play Priors via PGM.

Equivalent of the reference's examples/scripts/ppp/ppp_pgm_dmsc.py
pattern on a deblurring task: a gradient step on the data fidelity
``(1/2)||H x - s||^2`` alternates with a denoiser prior applied as the
proximal step (here a Tikhonov smoothing denoiser; the reference plugs
BM3D).
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(N=64, iters=60):
    import jax.numpy as jnp
    from sporco_tpu.models.ppp import PPPPGM
    from sporco_tpu.utils.signal import tikhonov_filter
    from sporco_tpu.utils.metric import psnr

    rng = np.random.default_rng(12345)
    img = np.zeros((N, N), np.float32)
    img[N // 4:3 * N // 4, N // 4:3 * N // 4] = 1.0
    img[3 * N // 8:5 * N // 8, 3 * N // 8:5 * N // 8] = 0.4
    h = np.ones((5, 5), np.float32) / 25.0
    Hf = np.fft.rfft2(h, s=(N, N))
    blurred = np.fft.irfft2(np.fft.rfft2(img) * Hf, s=(N, N))
    s = (blurred + 0.01 * rng.standard_normal((N, N))).astype(
        np.float32)
    sj = jnp.asarray(s)
    Hfj = jnp.asarray(Hf)

    def f(x):
        r = jnp.fft.irfft2(jnp.fft.rfft2(x) * Hfj, s=(N, N)) - sj
        return 0.5 * jnp.sum(r ** 2)

    def gradf(x):
        rf = jnp.fft.rfft2(x) * Hfj - jnp.fft.rfft2(sj)
        return jnp.fft.irfft2(jnp.conj(Hfj) * rf, s=(N, N))

    def proxg(x, L):
        sl, _ = tikhonov_filter(x, 1.0)
        return 0.6 * x + 0.4 * sl

    opt = PPPPGM.options(max_iter=iters, rel_stop_tol=1e-5, L=1.0)
    b = PPPPGM((N, N), f, gradf, proxg, opt=opt)
    rec = np.asarray(b.solve())
    print(f"PnP-PGM deblur: blurred PSNR {psnr(img, s):.2f} dB -> "
          f"{psnr(img, rec):.2f} dB in {len(b.getitstat())} iters")
    return rec


if __name__ == "__main__":
    main()
