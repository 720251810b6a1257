"""FFT substrate for DFT-domain solvers.

Capability parity with the reference FFT layer (``sporco/fft.py``): n-dim
real/complex transforms, DFT-domain convolution, DCT-II, and the
Parseval-corrected norms needed to evaluate objectives in the frequency
domain (``sporco/fft.py:421-484``).

TPU-first notes: there is no planning layer or byte-alignment machinery.
On TPU backends, axis transforms up to length 2048 dispatch to dense DFT
matmuls on the MXU (:mod:`sporco_tpu.ops.mxufft`) -- ~4x faster than the
XLA TPU FFT at the framework's hot sizes; elsewhere ``jnp.fft`` is used.
All solvers in this package keep spatial axes *last* (layout
``(K, C, M, N0, N1, ...)``), the opposite of the reference's
``(N0, N1, ..., C, K, M)`` layout (``sporco/cnvrep.py:86-103``).
"""

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.fft as jsf

from sporco_tpu.ops import mxufft

__all__ = [
    "complex_dtype", "real_dtype", "is_complex_dtype",
    "fftn", "ifftn", "rfftn", "irfftn", "dctii", "idctii",
    "fftconv", "fl2norm2", "rfl2norm2", "empty_aligned_func",
    "fftn_func", "ifftn_func", "fl2norm2_func", "use_mxu_fft",
]

# MXU (matmul) DFT dispatch: on TPU backends the XLA FFT is slow
# (it bypasses the systolic array), so axis transforms up to this
# length are computed as dense DFT matmuls instead (see
# sporco_tpu/ops/mxufft.py).  Disable with SPORCO_TPU_MXU_FFT=0.
_MXU_MAX_LEN = 2048
_MXU_MODE = os.environ.get("SPORCO_TPU_MXU_FFT", "auto")


def use_mxu_fft(mode):
    """Control MXU-DFT dispatch: ``'auto'`` (TPU only), ``'always'``,
    or ``'never'``."""
    global _MXU_MODE
    if mode in (True, False):
        mode = "always" if mode else "never"
    if mode not in ("auto", "always", "never", "0", "1"):
        raise ValueError(f"invalid mode {mode!r}")
    _MXU_MODE = {"0": "never", "1": "always"}.get(mode, mode)


def _mxu_ok(a, s, axes):
    mode = {"0": "never", "1": "always"}.get(_MXU_MODE, _MXU_MODE)
    if mode == "never":
        return False
    if mode == "auto" and jax.default_backend() not in ("tpu", "axon"):
        return False
    if s is not None:
        sizes = tuple(s)
    elif axes is not None:
        sizes = tuple(a.shape[ax] for ax in axes)
    else:
        sizes = a.shape
    return all(1 < n <= _MXU_MAX_LEN for n in sizes)


def complex_dtype(dtype):
    """Complex dtype corresponding to a real ``dtype``."""
    dtype = jnp.dtype(dtype)
    if dtype.kind == "c":
        return dtype
    return jnp.dtype(jnp.complex64) if jnp.dtype(dtype).itemsize <= 4 \
        else jnp.dtype(jnp.complex128)


def real_dtype(dtype):
    """Real dtype corresponding to a complex ``dtype``."""
    dtype = jnp.dtype(dtype)
    if dtype.kind != "c":
        return dtype
    return jnp.dtype(jnp.float32) if dtype == jnp.complex64 \
        else jnp.dtype(jnp.float64)


def is_complex_dtype(dtype):
    """True if ``dtype`` is complex."""
    return jnp.dtype(dtype).kind == "c"


def _default_axes(a, s=None, axes=None):
    if axes is not None:
        return tuple(axes)
    if s is not None:
        return tuple(range(a.ndim - len(s), a.ndim))
    return tuple(range(a.ndim))


def fftn(a, s=None, axes=None):
    """n-dimensional complex DFT (MXU matmul on TPU, XLA FFT else)."""
    if _mxu_ok(a, s, axes):
        return mxufft.fftn(a, s=s, axes=axes)
    return jnp.fft.fftn(a, s=s, axes=axes)


def ifftn(a, s=None, axes=None):
    """n-dimensional inverse complex DFT."""
    if _mxu_ok(a, s, axes):
        return mxufft.ifftn(a, s=s, axes=axes)
    return jnp.fft.ifftn(a, s=s, axes=axes)


def rfftn(a, s=None, axes=None):
    """n-dimensional real DFT (half-spectrum on the final axis)."""
    if _mxu_ok(a, s, axes):
        return mxufft.rfftn(a, s=s, axes=axes)
    return jnp.fft.rfftn(a, s=s, axes=axes)


def irfftn(a, s, axes=None):
    """n-dimensional inverse real DFT.  ``s`` (the real-domain shape of
    the transformed axes) is required to disambiguate odd/even lengths."""
    if _mxu_ok(a, s, axes):
        return mxufft.irfftn(a, s=s, axes=axes)
    return jnp.fft.irfftn(a, s=s, axes=axes)


def dctii(x, axes=None):
    """Orthonormal multi-dimensional DCT-II (used by the spline solver)."""
    if axes is None:
        axes = tuple(range(x.ndim))
    return jsf.dctn(x, type=2, axes=axes, norm="ortho")


def idctii(x, axes=None):
    """Orthonormal multi-dimensional inverse DCT-II."""
    if axes is None:
        axes = tuple(range(x.ndim))
    return jsf.idctn(x, type=2, axes=axes, norm="ortho")


def fftconv(a, b, axes=None, origin=None):
    """Multi-dimensional circular convolution of real arrays via the DFT
    (capability of ``sporco/fft.py:376-417``).

    The convolution support per axis is the elementwise maximum of the two
    operand shapes.  If ``origin`` is given, the result is rolled so the
    filter origin sits at that index tuple.
    """
    if axes is None:
        axes = tuple(range(a.ndim))
    axes = tuple(ax % max(a.ndim, b.ndim) for ax in axes)
    sn = tuple(max(a.shape[ax], b.shape[ax]) for ax in axes)
    af = rfftn(a, s=sn, axes=axes)
    bf = rfftn(b, s=sn, axes=axes)
    ab = irfftn(af * bf, s=sn, axes=axes)
    if origin is not None:
        ab = jnp.roll(ab, tuple(-o for o in origin), axis=axes)
    return ab


def fl2norm2(xf, axis=None):
    """Squared l2 norm in the spatial domain, computed from the full
    DFT-domain array ``xf`` via Parseval (``sporco/fft.py:421``)."""
    if axis is None:
        axis = tuple(range(xf.ndim))
    scl = 1.0 / math.prod(xf.shape[ax] for ax in axis)
    return scl * jnp.sum(jnp.abs(xf) ** 2)


def rfl2norm2(xf, xs, axis=None):
    """Squared l2 norm in the spatial domain from the *half-spectrum*
    ``xf`` of a real array with spatial shape ``xs`` on the transformed
    axes (``sporco/fft.py:449-484``).

    All bins are counted twice except the DC plane of the final
    transformed axis and (for even length) the Nyquist plane, which occur
    only once in the half-spectrum.
    """
    if axis is None:
        axis = tuple(range(xf.ndim))
    axis = tuple(ax % xf.ndim for ax in axis)
    scl = 1.0 / math.prod(xs)
    lax_ = axis[-1]
    idx0 = (slice(None),) * lax_ + (slice(0, 1),)
    nrm0 = jnp.sum(jnp.abs(xf[idx0]) ** 2)
    if xs[-1] % 2 == 0:
        idx1 = (slice(None),) * lax_ + (slice(-1, None),)
        nrm1 = jnp.sum(jnp.abs(xf[idx1]) ** 2)
    else:
        nrm1 = 0.0
    nrm = jnp.sum(jnp.abs(xf) ** 2)
    return scl * (2.0 * nrm - nrm0 - nrm1)


# ---------------------------------------------------------------------------
# Real/complex dispatch (parity with ``sporco/fft.py:488-588``): solvers
# that support complex-valued D/S bind the appropriate transform family at
# construction time.

def empty_aligned_func(real=True):  # pragma: no cover - compat shim
    """Compat shim: alignment is meaningless on TPU; returns jnp.empty."""
    del real
    return jnp.empty


def fftn_func(real=True):
    """Forward transform for real (rfftn) or complex (fftn) problems."""
    return rfftn if real else fftn


def ifftn_func(real=True):
    """Inverse transform; for the real family, ``s`` is mandatory."""
    return irfftn if real else (lambda a, s, axes=None: ifftn(a, s=s, axes=axes))


def fl2norm2_func(real=True):
    """Parseval norm matching the bound transform family."""
    if real:
        return rfl2norm2
    return lambda xf, xs, axis=None: fl2norm2(xf, axis=axis)
