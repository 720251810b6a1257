"""Image-quality metrics (parity with ``sporco/metric.py:37-300``).

All metrics are pure jnp functions (PAMSE/GMSD use DFT-domain
convolution instead of scipy.ndimage/scipy.signal, so they are jittable
and TPU-resident)."""

import math

import numpy as np
import jax.numpy as jnp

from sporco_tpu.ops import fft as _fft
from sporco_tpu.utils.signal import gaussian

__all__ = ["mae", "mse", "snr", "psnr", "isnr", "bsnr", "pamse", "gmsd"]


def mae(vref, vcmp):
    """Mean absolute error."""
    return jnp.mean(jnp.abs(jnp.asarray(vref) - jnp.asarray(vcmp)))


def mse(vref, vcmp):
    """Mean squared error."""
    return jnp.mean(jnp.abs(jnp.asarray(vref) - jnp.asarray(vcmp)) ** 2)


def snr(vref, vcmp):
    """Signal-to-noise ratio in dB: ``10 log10(var(ref)/mse)``."""
    return 10.0 * jnp.log10(jnp.var(vref) / mse(vref, vcmp))


def psnr(vref, vcmp, rng=None):
    """Peak SNR in dB; ``rng`` defaults to the actual range of ``vref``
    (the reference's convention, ``sporco/metric.py:115``)."""
    if rng is None:
        rng = jnp.abs(jnp.max(vref) - jnp.min(vref))
    return 10.0 * jnp.log10((rng + 0.0) ** 2 / mse(vref, vcmp))


def isnr(vref, vdeg, vrst):
    """Improvement SNR in dB for (reference, degraded, restored)."""
    return 10.0 * jnp.log10(mse(vref, vdeg) / mse(vref, vrst))


def bsnr(vblr, vnsy):
    """Blurred SNR in dB for (blurred-noise-free, blurred-noisy)."""
    return 10.0 * jnp.log10(jnp.var(vblr) / jnp.var(vnsy - vblr))


def _conv2_same_symm(x, h):
    """2D 'same' convolution with symmetric boundary, via DFT."""
    hr, hc = h.shape
    pr, pc = hr // 2, hc // 2
    xp = jnp.pad(x, ((pr, hr - 1 - pr), (pc, hc - 1 - pc)),
                 mode="symmetric")
    full = _fft.fftconv(jnp.asarray(h, xp.dtype), xp, axes=(0, 1))
    return full[hr - 1:hr - 1 + x.shape[0], hc - 1:hc - 1 + x.shape[1]]


def pamse(vref, vcmp, rescale=True):
    """Perceptual-fidelity Aware MSE (xue-2013-perceptual):
    Gaussian-filtered (sigma=0.8) error map energy."""
    emap = jnp.asarray(vref, jnp.float64 if jnp.asarray(vref).dtype ==
                       jnp.float64 else jnp.float32)
    emap = emap - jnp.asarray(vcmp, emap.dtype)
    if rescale:
        emap = emap * (255.0 / jnp.max(jnp.asarray(vref)))
    sigma = 0.8
    # truncated Gaussian kernel (radius 4 sigma, as scipy's default)
    rad = int(4 * sigma + 0.5)
    x = np.arange(-rad, rad + 1)
    g1 = np.exp(-x ** 2 / (2 * sigma ** 2))
    g1 = g1 / g1.sum()
    h = np.outer(g1, g1)
    herr = _conv2_same_symm(emap, jnp.asarray(h, emap.dtype))
    return jnp.mean(herr ** 2)


def gmsd(vref, vcmp, rescale=True, returnMap=False):
    """Gradient Magnitude Similarity Deviation (xue-2014-gradient)."""
    vref = jnp.asarray(vref, jnp.float32)
    vcmp = jnp.asarray(vcmp, jnp.float32)
    scl = (255.0 / jnp.max(vref)) if rescale else jnp.float32(1.0)
    T = 170.0
    dwn = 2
    dx = jnp.array([[1, 0, -1], [1, 0, -1], [1, 0, -1]],
                   dtype=jnp.float32) / 3.0
    dy = dx.T
    ukrn = jnp.ones((2, 2), dtype=jnp.float32) / 4.0
    ave1 = _conv2_same_symm(scl * vref, ukrn)[0::dwn, 0::dwn]
    ave2 = _conv2_same_symm(scl * vcmp, ukrn)[0::dwn, 0::dwn]
    g1 = jnp.sqrt(_conv2_same_symm(ave1, dx) ** 2 +
                  _conv2_same_symm(ave1, dy) ** 2)
    g2 = jnp.sqrt(_conv2_same_symm(ave2, dx) ** 2 +
                  _conv2_same_symm(ave2, dy) ** 2)
    qmap = (2 * g1 * g2 + T) / (g1 ** 2 + g2 ** 2 + T)
    score = jnp.std(qmap)
    return (score, qmap) if returnMap else score
