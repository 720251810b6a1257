"""Matmul (MXU) DFT backend.

XLA's native TPU FFT does not use the systolic array and is severely
bandwidth-inefficient at the sizes this framework cares about: on a
v5e chip the 64-channel 512x512 ``rfft2``/``irfft2`` pair at the heart
of the ConvBPDN x-step costs ~8.7 ms with ``jnp.fft`` but ~2 ms when
each axis transform is expressed as a dense DFT matmul on the MXU.
Direct DFT-by-matmul is MXU-optimal at these sizes: a length-512
contraction is four full 128-lane passes of the systolic array, whereas
Cooley-Tukey radices (16/32) would underfill the contraction dimension
and gain nothing.  The factor matrices are tiny (N^2 floats) and become
XLA constants.

This module mirrors the ``numpy.fft`` n-dimensional API surface that
:mod:`sporco_tpu.ops.fft` needs (``fftn/ifftn/rfftn/irfftn``);
:mod:`sporco_tpu.ops.fft` dispatches here on TPU backends.  It replaces
the role pyFFTW plays in the reference (``sporco/fft.py:33-41``): the
"planning layer" of the TPU build is choosing the unitary-factor matmul
formulation, not FFTW wisdom.

Matmul precision is configurable via :func:`set_precision`:

- ``"highest"`` (default): f32-exact (error ~1e-7, like a float32 FFT).
- ``"high"``: bf16 3-pass (error ~2e-5) -- about 1.8x faster; safe for
  ADMM/PGM iterations converging to tolerances >= 1e-4 (the subproblem
  solves become slightly inexact, which the outer iteration absorbs),
  but below test tolerances for tight recovery assertions.
"""

import math
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["fftn", "ifftn", "rfftn", "irfftn", "set_precision",
           "get_precision"]


def _pallas_2d_ok(ndim, s, axes, dtype):
    """Dispatch the fused Pallas kernel for 2D last-axes f32 transforms
    in ``highest`` precision (it beats the einsum path there: the
    Cooley-Tukey MAC cut is free of the bf16-split VPU overhead that
    makes it lose in ``high`` mode; measured 3.09 vs 3.59 ms for the
    512x512x64 round trip on a v5e chip)."""
    from sporco_tpu.ops import pallas_fft
    if _PRECISION != "highest":
        return False
    if not (pallas_fft.interpret
            or jax.default_backend() in ("tpu", "axon")):
        return False
    if len(axes) != 2 or tuple(axes) != (ndim - 2, ndim - 1):
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.complex64)):
        return False
    return pallas_fft.supported(s[0], s[1], jnp.float32)

_PRECISION = "highest"


def set_precision(p):
    """Set matmul precision for all MXU DFTs: ``'highest'`` (f32-exact)
    or ``'high'`` (bf16 3-pass, ~2e-5 error, ~1.8x faster)."""
    global _PRECISION
    if p not in ("default", "high", "highest"):
        raise ValueError(f"invalid precision {p!r}")
    _PRECISION = p


def get_precision():
    return _PRECISION


# ---------------------------------------------------------------------------
# Factor matrices (host-side, cached; become XLA constants at trace time)

@lru_cache(maxsize=None)
def _c2c_factors(n, fdtype, inverse):
    """(Fr, Fi) with F[j,k] = exp(-+2i pi j k / n) (length-n DFT)."""
    j = np.arange(n)
    ang = 2.0 * np.pi * np.outer(j, j) / n
    sgn = 1.0 if inverse else -1.0
    Fr = np.cos(ang).astype(fdtype)
    Fi = (sgn * np.sin(ang)).astype(fdtype)
    if inverse:
        Fr /= n
        Fi /= n
    return Fr, Fi


@lru_cache(maxsize=None)
def _r2c_factors(n, fdtype):
    """(Cr, Ci), shape (n, n//2+1): real input -> half spectrum."""
    k = np.arange(n // 2 + 1)
    j = np.arange(n)
    ang = 2.0 * np.pi * np.outer(j, k) / n
    return np.cos(ang).astype(fdtype), (-np.sin(ang)).astype(fdtype)


@lru_cache(maxsize=None)
def _c2r_factors(n, fdtype):
    """(Ar, Ai), shape (n//2+1, n): half spectrum -> real signal.

    x[j] = sum_k w_k (Zr[k] cos(2 pi k j / n) - Zi[k] sin(2 pi k j / n))
    with w = [1, 2, ..., 2, (1 if n even else 2)] / n.
    """
    K = n // 2 + 1
    k = np.arange(K)
    j = np.arange(n)
    w = np.full(K, 2.0 / n)
    w[0] = 1.0 / n
    if n % 2 == 0:
        w[-1] = 1.0 / n
    ang = 2.0 * np.pi * np.outer(k, j) / n
    Ar = (w[:, None] * np.cos(ang)).astype(fdtype)
    Ai = (-w[:, None] * np.sin(ang)).astype(fdtype)
    return Ar, Ai


def _fdtype(dtype):
    return np.float64 if jnp.dtype(dtype).itemsize > 4 else np.float32


# ---------------------------------------------------------------------------
# Single-axis primitives.  All operate on (real, imag) pairs so that no
# complex array need cross any boundary; `_apply` contracts `x`'s `axis`
# with the factor matrix's first dim, keeping the axis position.

_LETTERS = "abcdefghijklmnopqrstuvwxy"


def _apply(x, m, axis):
    ax = axis % x.ndim
    sub = _LETTERS[:x.ndim]
    out = sub.replace(sub[ax], "z")
    return jnp.einsum(f"{sub},{sub[ax]}z->{out}", x, m,
                      precision=_PRECISION)


def _c2c_axis(xr, xi, n, axis, inverse):
    Fr, Fi = _c2c_factors(n, _fdtype(xr.dtype), inverse)
    Fr = jnp.asarray(Fr)
    Fi = jnp.asarray(Fi)
    if xi is None:
        return _apply(xr, Fr, axis), _apply(xr, Fi, axis)
    # Karatsuba: 3 matmuls instead of 4 (the matmuls dominate; the
    # extra adds are fused by XLA)
    m1 = _apply(xr, Fr, axis)
    m2 = _apply(xi, Fi, axis)
    m3 = _apply(xr + xi, Fr + Fi, axis)
    return m1 - m2, m3 - m1 - m2


def _r2c_axis(x, n, axis):
    Cr, Ci = _r2c_factors(n, _fdtype(x.dtype))
    return _apply(x, jnp.asarray(Cr), axis), _apply(x, jnp.asarray(Ci), axis)


def _c2r_axis(xr, xi, n, axis):
    Ar, Ai = _c2r_factors(n, _fdtype(xr.dtype))
    return _apply(xr, jnp.asarray(Ar), axis) + \
        _apply(xi, jnp.asarray(Ai), axis)


def _resize_axis(x, n, axis):
    """Zero-pad or truncate ``x`` to length ``n`` along ``axis``
    (numpy fft ``s`` semantics)."""
    ax = axis % x.ndim
    ln = x.shape[ax]
    if ln == n:
        return x
    if ln > n:
        idx = [slice(None)] * x.ndim
        idx[ax] = slice(0, n)
        return x[tuple(idx)]
    pad = [(0, 0)] * x.ndim
    pad[ax] = (0, n - ln)
    return jnp.pad(x, pad)


def _norm_axes(a, s, axes):
    if axes is None:
        axes = tuple(range(a.ndim)) if s is None \
            else tuple(range(a.ndim - len(s), a.ndim))
    else:
        axes = tuple(ax % a.ndim for ax in axes)
    if s is None:
        s = tuple(a.shape[ax] for ax in axes)
    return tuple(s), axes


# ---------------------------------------------------------------------------
# numpy.fft-compatible n-d transforms

def fftn(a, s=None, axes=None):
    s, axes = _norm_axes(a, s, axes)
    if jnp.iscomplexobj(a):
        xr, xi = jnp.real(a), jnp.imag(a)
    else:
        xr, xi = a, None
    for n, ax in zip(s, axes):
        xr = _resize_axis(xr, n, ax)
        if xi is not None:
            xi = _resize_axis(xi, n, ax)
    for n, ax in zip(s, axes):
        xr, xi = _c2c_axis(xr, xi, n, ax, inverse=False)
    return xr + 1j * xi


def ifftn(a, s=None, axes=None):
    s, axes = _norm_axes(a, s, axes)
    if jnp.iscomplexobj(a):
        xr, xi = jnp.real(a), jnp.imag(a)
    else:
        xr, xi = a, None
    for n, ax in zip(s, axes):
        xr = _resize_axis(xr, n, ax)
        if xi is not None:
            xi = _resize_axis(xi, n, ax)
    for n, ax in zip(s, axes):
        xr, xi = _c2c_axis(xr, xi, n, ax, inverse=True)
    return xr + 1j * xi


def rfftn(a, s=None, axes=None):
    s, axes = _norm_axes(a, s, axes)
    for n, ax in zip(s, axes):
        a = _resize_axis(a, n, ax)
    if _pallas_2d_ok(a.ndim, s, axes, a.dtype) and not jnp.iscomplexobj(a):
        from sporco_tpu.ops import pallas_fft
        yr, yi = pallas_fft.rfft2_planar(a.astype(jnp.float32),
                                         precision=_PRECISION)
        return yr + 1j * yi
    # r2c on the final transformed axis, then c2c on the rest
    xr, xi = _r2c_axis(a, s[-1], axes[-1])
    for n, ax in zip(s[:-1], axes[:-1]):
        xr, xi = _c2c_axis(xr, xi, n, ax, inverse=False)
    return xr + 1j * xi


def irfftn(a, s, axes=None):
    if axes is None:
        axes = tuple(range(a.ndim - len(s), a.ndim))
    else:
        axes = tuple(ax % a.ndim for ax in axes)
    s = tuple(s)
    if (_pallas_2d_ok(a.ndim, s, axes, a.dtype)
            and a.shape[axes[-1]] == s[-1] // 2 + 1
            and a.shape[axes[-2]] == s[-2]):
        from sporco_tpu.ops import pallas_fft
        return pallas_fft.irfft2_planar(
            jnp.real(a).astype(jnp.float32),
            jnp.imag(a).astype(jnp.float32), s[-1],
            precision=_PRECISION)
    xr, xi = jnp.real(a), jnp.imag(a)
    # half-spectrum length on the final axis must match s[-1]//2+1
    K = s[-1] // 2 + 1
    xr = _resize_axis(xr, K, axes[-1])
    xi = _resize_axis(xi, K, axes[-1])
    for n, ax in zip(s[:-1], axes[:-1]):
        xr = _resize_axis(xr, n, ax)
        xi = _resize_axis(xi, n, ax)
        xr, xi = _c2c_axis(xr, xi, n, ax, inverse=True)
    return _c2r_axis(xr, xi, s[-1], axes[-1])
