"""Signal/image utilities (parity with ``sporco/signal.py``).

Layout note: this package keeps spatial axes *trailing*; the
DFT-domain gradient filter stack therefore carries its gradient-index
axis *first* (shape ``(J, *freq_shape)``), the mirror image of the
reference's trailing index (``sporco/signal.py:204``).
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu.ops import fft as _fft

__all__ = [
    "complex_randn", "spnoise", "rndmask", "rgb2gray", "grad", "gradT",
    "gradient_filters", "tikhonov_filter", "gaussian",
    "local_contrast_normalise",
]


def complex_randn(key, *args):
    """Standard complex Gaussian samples (``sporco/signal.py:23``)."""
    k1, k2 = jax.random.split(key)
    return jax.random.normal(k1, args) + 1j * jax.random.normal(k2, args)


def spnoise(key, s, frc, smn=0.0, smx=1.0):
    """Salt & pepper noise: a fraction ``frc`` of samples is set to the
    min/max values with equal probability (``sporco/signal.py:42``)."""
    u = jax.random.uniform(key, s.shape)
    x = jnp.where(u < frc / 2.0, smn, s)
    return jnp.where(u > 1.0 - frc / 2.0, smx, x)


def rndmask(key, shp, frc, dtype=jnp.float32):
    """Random binary mask with approximately fraction ``frc`` of zeros
    (``sporco/signal.py:70``)."""
    return (jax.random.uniform(key, tuple(shp)) > frc).astype(dtype)


def rgb2gray(rgb, axis=-1):
    """ITU-R 601-2 luma transform; the channel axis defaults to the
    trailing axis (this package's layout), vs axis 2 in the reference
    (``sporco/signal.py:95``)."""
    w = jnp.array([0.299, 0.587, 0.114], dtype=rgb.dtype)
    shp = [1] * rgb.ndim
    shp[axis] = 3
    return jnp.sum(w.reshape(shp) * rgb, axis=axis)


def grad(x, axis, zero_pad=False):
    """Forward difference along ``axis`` (``sporco/signal.py:115``).
    With ``zero_pad=False`` the operator is circular-difference with the
    last row zeroed (maps R^N -> R^N); with ``zero_pad=True`` it maps
    R^N -> R^{N+1} with implicit zero boundary."""
    axis = axis % x.ndim
    if zero_pad:
        return jnp.diff(x, axis=axis, prepend=0, append=0)
    xg = jnp.roll(x, -1, axis=axis) - x
    slc = (slice(None),) * axis + (slice(-1, None),)
    return xg.at[slc].set(0.0)


def gradT(x, axis, zero_pad=False):
    """Transpose of :func:`grad` (``sporco/signal.py:172``)."""
    axis = axis % x.ndim
    if zero_pad:
        return -jnp.diff(x, axis=axis)
    slc0 = (slice(None),) * axis
    xg = jnp.roll(x, 1, axis=axis) - x
    xg = xg.at[slc0 + (slice(0, 1),)].set(-x[slc0 + (slice(0, 1),)])
    return xg.at[slc0 + (slice(-1, None),)].set(x[slc0 + (slice(-2, -1),)])


def gradient_filters(axes_ndim, axshp, dtype=jnp.float32, real=True):
    """DFT-domain forward-difference filter stack.

    Parameters: ``axes_ndim`` is the number of (trailing) spatial axes,
    ``axshp`` their shape.  Returns ``(Gf, GHGf)`` where ``Gf`` has shape
    ``(J, *freq_shape)`` with ``J = axes_ndim`` gradient filters indexed
    on the *leading* axis, and ``GHGf = sum_j conj(Gf_j) Gf_j`` (real,
    shape ``freq_shape``).  Capability of ``sporco/signal.py:204``
    re-oriented for the trailing-spatial layout.
    """
    J = axes_ndim
    g = np.zeros((J,) + (2,) * J, dtype=np.float64)
    for j in range(J):
        idx = (j,) + (0,) * j + (slice(None),) + (0,) * (J - j - 1)
        g[idx] = np.array([1.0, -1.0])
    g = jnp.asarray(g, dtype=dtype)
    axes = tuple(range(1, J + 1))
    if real and not _fft.is_complex_dtype(dtype):
        Gf = _fft.rfftn(g, s=axshp, axes=axes)
    else:
        Gf = _fft.fftn(g, s=axshp, axes=axes)
    GHGf = jnp.sum((jnp.conj(Gf) * Gf).real, axis=0)
    return Gf, GHGf


@partial(jax.jit, static_argnums=(2,))
def _tikhonov_impl(s, lmbda, npd):
    # one jitted program: complex intermediates never cross a jit
    # boundary (required on TPU backends that cannot transfer complex)
    N0, N1 = s.shape[-2], s.shape[-1]
    sp = jnp.pad(s, [(0, 0)] * (s.ndim - 2) + [(npd, npd), (npd, npd)],
                 mode="symmetric")
    shape = (N0 + 2 * npd, N1 + 2 * npd)
    grv = jnp.array([-1.0, 1.0], dtype=s.dtype).reshape((2, 1))
    gcv = jnp.array([-1.0, 1.0], dtype=s.dtype).reshape((1, 2))
    Gr = _fft.rfftn(grv, s=shape, axes=(0, 1))
    Gc = _fft.rfftn(gcv, s=shape, axes=(0, 1))
    A = 1.0 + lmbda * (jnp.conj(Gr) * Gr + jnp.conj(Gc) * Gc).real
    spf = _fft.rfftn(sp, axes=(-2, -1))
    spf = spf / A
    sp = _fft.irfftn(spf, s=shape, axes=(-2, -1))
    slp = sp[..., npd:npd + N0, npd:npd + N1]
    return slp.astype(s.dtype), (s - slp).astype(s.dtype)


def tikhonov_filter(s, lmbda, npd=16):
    """Split ``s`` into lowpass/highpass components via Tikhonov
    regularisation with a gradient operator (``sporco/signal.py:244``).
    The two *trailing* axes are treated as spatial.  Returns
    ``(lowpass, highpass)``."""
    return _tikhonov_impl(jnp.asarray(s), lmbda, npd)


def gaussian(shape, sd=1.0):
    """Unit-sum sampled Gaussian (``sporco/signal.py:305``)."""
    if isinstance(shape, int):
        shape = (shape,)
    gc = 1.0
    for k, n in enumerate(shape):
        x = jnp.linspace(-3.0, 3.0, n).reshape(
            (1,) * k + (n,) + (1,) * (len(shape) - k - 1))
        gc = gc * jnp.exp(-(x ** 2) / (2.0 * sd ** 2)) / \
            (math.sqrt(2.0 * math.pi) * sd)
    return gc / jnp.sum(gc)


def local_contrast_normalise(s, n=7, c=None):
    """Local contrast normalisation (jarret-2009-what;
    ``sporco/signal.py:335``): subtract the local (Gaussian-windowed)
    mean and divide by the local norm.  Returns ``(scn, smn, snrm)`` so
    the original can be reconstructed."""
    if c is None:
        c = jnp.asarray(0.01, s.dtype)
    w = gaussian((2 * n + 1, 2 * n + 1), sd=1.0).astype(s.dtype)
    sp = jnp.pad(s, ((n, n), (n, n)), mode="symmetric")
    smn = _fft.fftconv(w, sp, axes=(0, 1))[..., 2*n:, 2*n:]
    smn = smn[..., :s.shape[-2], :s.shape[-1]]
    sz = sp - jnp.pad(smn, ((n, n), (n, n)), mode="symmetric")
    spd = jnp.pad(s - smn, ((n, n), (n, n)), mode="symmetric")
    snrm = jnp.sqrt(_fft.fftconv(w, spd ** 2, axes=(0, 1))[..., 2*n:, 2*n:])
    snrm = snrm[..., :s.shape[-2], :s.shape[-1]]
    snrm = jnp.maximum(c, snrm)
    return (s - smn) / snrm, smn, snrm
