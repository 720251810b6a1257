"""Convolutional representation layout and dictionary constraint set.

Capability parity with ``sporco/cnvrep.py``: inference of problem
dimensions from user-shaped inputs, conversion between user and internal
layouts, weight/mask shape inference, and the dictionary constraint-set
projection ``Pcn`` (zero-pad / zero-mean / crop / unit-norm).

Layout: the reference keeps spatial axes leading
(``S(N..., C, K, 1)``, ``sporco/cnvrep.py:86-103``); this package keeps
them *trailing* so XLA's TPU FFT operates on the innermost (lane-mapped)
dimensions without transposes:

::

            sig  chn  flt  sptl.
    S      (K,   C,   1,   N0, N1, ...)
    D      (1,   Cd,  M,   Nd0, Nd1, ...)   (unpadded filter support)
    X      (K,   Cx,  M,   N0, N1, ...)

``axisK=0, axisC=1, axisM=2``, spatial axes are the last ``dimN``.
User-facing inputs/outputs use the reference's conventions (D with
trailing filter axis, S with trailing channel/signal axes, X returned as
``Nv + (Cx, K, M)``) so reference users can switch without reshaping.
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

__all__ = [
    "CSCIndex", "csc_index", "CDUIndex", "cdu_index", "DictionarySize",
    "to_internal_S", "to_internal_D", "to_internal_X", "from_internal_X",
    "from_internal_D", "l1_weight", "fidelity_mask",
    "zeromean", "normalise", "zpad", "bcrop", "Pcn", "getPcn",
    "AXIS_K", "AXIS_C", "AXIS_M",
]

AXIS_K = 0
AXIS_C = 1
AXIS_M = 2


@dataclass(frozen=True)
class CSCIndex:
    """Problem dimensions for convolutional sparse coding.

    Same inference rules as ``CSC_ConvRepIndexing``
    (``sporco/cnvrep.py:24-198``); frozen/hashable so it can be a static
    argument to jitted solvers.
    """
    dimN: int
    dimC: int     # number of channel dims in *user* S (0 or 1)
    dimK: int     # number of signal dims in *user* S (0 or 1)
    dimCd: int    # number of channel dims in *user* D (0 or 1)
    C: int
    Cd: int
    Cx: int
    K: int
    M: int
    Nv: Tuple[int, ...]
    dsz: Tuple[int, ...]   # spatial support of the dictionary filters

    @property
    def N(self):
        return int(np.prod(self.Nv))

    @property
    def axisN(self):
        """Trailing spatial axes of the internal 3+dimN dim arrays."""
        return tuple(range(3, 3 + self.dimN))

    @property
    def shpS(self):
        return (self.K, self.C, 1) + tuple(self.Nv)

    @property
    def shpD(self):
        return (1, self.Cd, self.M) + tuple(self.dsz)

    @property
    def shpX(self):
        return (self.K, self.Cx, self.M) + tuple(self.Nv)


def _infer_dims(D_extra_dims, S_ndim, dimK, dimN):
    """Shared channel/signal disambiguation (``sporco/cnvrep.py:60-84``)."""
    dimCd = D_extra_dims
    if dimK is None:
        rdim = S_ndim - dimN
        if rdim == 0:
            dimC, dimK = 0, 0
        elif rdim == 1:
            dimC = dimCd
            dimK = S_ndim - dimN - dimC
        else:
            dimC, dimK = 1, 1
    else:
        dimC = S_ndim - dimN - dimK
    return dimC, dimK, dimCd


def csc_index(Dshape, Sshape, dimK=None, dimN=2):
    """Infer a :class:`CSCIndex` from user-shaped ``D`` and ``S`` shapes.

    User ``D`` has shape ``dsz + [Cd] + (M,)`` (trailing filter axis),
    user ``S`` has shape ``Nv + [C] + [K]``, exactly as in the reference.
    """
    Dshape = tuple(Dshape)
    Sshape = tuple(Sshape)
    dimC, dimK_, dimCd = _infer_dims(len(Dshape) - (dimN + 1),
                                     len(Sshape), dimK, dimN)
    Cd = Dshape[-2] if dimCd == 1 else 1
    C = Sshape[dimN] if dimC == 1 else 1
    if Cd > 1 and C != Cd:
        raise ValueError("Multi-channel dictionary with mismatched signal "
                         f"channels (Cd={Cd}, C={C})")
    K = Sshape[dimN + dimC] if dimK_ == 1 else 1
    M = Dshape[-1]
    Nv = Sshape[:dimN]
    dsz = Dshape[:dimN]
    return CSCIndex(dimN=dimN, dimC=dimC, dimK=dimK_, dimCd=dimCd,
                    C=C, Cd=Cd, Cx=C - Cd + 1, K=K, M=M, Nv=Nv, dsz=dsz)


class DictionarySize:
    """Parse a dictionary size specification tuple ``dsz``
    (``sporco/cnvrep.py:211-265``): single-scale ``(N0.., [Cd,] M)``,
    or multi-scale ``((N0..,[Cd,]M0), (N0'..,[Cd,]M1), ...)``, optionally
    with nested per-channel specs."""

    def __init__(self, dsz, dimN=2):
        self.dsz = dsz
        if isinstance(dsz[0], tuple):
            if isinstance(dsz[0][0], tuple):
                self.ndim = len(dsz[0][0])
                self.nchn = sum(dsz[0][c][-2] for c in range(len(dsz[0])))
            else:
                self.ndim = len(dsz[0])
                self.nchn = 1 if self.ndim == dimN + 1 else dsz[0][-2]
            mxsz = np.zeros((dimN,), dtype=int)
            self.nflt = 0
            for blk in dsz:
                if isinstance(blk[0], tuple):
                    for c in blk:
                        mxsz = np.maximum(mxsz, np.asarray(c[:dimN]))
                    self.nflt += blk[0][-1]
                else:
                    mxsz = np.maximum(mxsz, np.asarray(blk[:dimN]))
                    self.nflt += blk[-1]
            self.mxsz = tuple(int(x) for x in mxsz)
        else:
            self.ndim = len(dsz)
            self.mxsz = tuple(dsz[:dimN])
            self.nflt = dsz[-1]
            self.nchn = 1 if self.ndim == dimN + 1 else dsz[-2]


@dataclass(frozen=True)
class CDUIndex:
    """Problem dimensions for convolutional dictionary update
    (``CDU_ConvRepIndexing``, ``sporco/cnvrep.py:277-455``); driven by a
    ``dsz`` spec rather than a dictionary array."""
    dimN: int
    dimC: int
    dimK: int
    dimCd: int
    C: int
    Cd: int
    Cx: int
    K: int
    M: int
    Nv: Tuple[int, ...]
    dsz: tuple

    @property
    def N(self):
        return int(np.prod(self.Nv))

    @property
    def axisN(self):
        return tuple(range(3, 3 + self.dimN))

    @property
    def shpS(self):
        return (self.K, self.C, 1) + tuple(self.Nv)

    @property
    def shpD(self):
        # D padded to full spatial support for the DFT-domain update
        return (1, self.Cd, self.M) + tuple(self.Nv)

    @property
    def shpX(self):
        return (self.K, self.Cx, self.M) + tuple(self.Nv)


def cdu_index(dsz, Sshape, dimK=None, dimN=2):
    """Infer a :class:`CDUIndex` from a ``dsz`` spec and user ``S`` shape."""
    ds = DictionarySize(dsz, dimN)
    Sshape = tuple(Sshape)
    dimC, dimK_, dimCd = _infer_dims(ds.ndim - dimN - 1, len(Sshape),
                                     dimK, dimN)
    Cd = ds.nchn
    C = Sshape[dimN] if dimC == 1 else 1
    if Cd > 1 and C != Cd:
        raise ValueError("Multi-channel dictionary with mismatched signal "
                         f"channels (Cd={Cd}, C={C})")
    K = Sshape[dimN + dimC] if dimK_ == 1 else 1
    Nv = Sshape[:dimN]
    return CDUIndex(dimN=dimN, dimC=dimC, dimK=dimK_, dimCd=dimCd,
                    C=C, Cd=Cd, Cx=C - Cd + 1, K=K, M=ds.nflt, Nv=Nv,
                    dsz=dsz if isinstance(dsz[0], tuple) else tuple(dsz))


# ---------------------------------------------------------------------------
# User <-> internal layout conversion

def to_internal_S(S, cri):
    """User ``Nv + [C] + [K]`` -> internal ``(K, C, 1, Nv...)``."""
    S = jnp.asarray(S)
    dimN = cri.dimN
    # expand to Nv + (C, K)
    if cri.dimC == 0:
        S = jnp.expand_dims(S, dimN)
    if cri.dimK == 0:
        S = jnp.expand_dims(S, dimN + 1)
    # (Nv..., C, K) -> (K, C, Nv...)
    perm = (dimN + 1, dimN) + tuple(range(dimN))
    S = jnp.transpose(S, perm)
    return jnp.expand_dims(S, 2)   # filter axis


def to_internal_D(D, cri):
    """User ``dsz + [Cd] + (M,)`` -> internal ``(1, Cd, M, dsz...)``."""
    D = jnp.asarray(D)
    dimN = cri.dimN
    if cri.dimCd == 0:
        D = jnp.expand_dims(D, dimN)
    # (dsz..., Cd, M) -> (Cd, M, dsz...)
    perm = (dimN, dimN + 1) + tuple(range(dimN))
    return jnp.expand_dims(jnp.transpose(D, perm), 0)


def from_internal_D(D, cri, squeeze=True):
    """Internal ``(1, Cd, M, sz...)`` -> user ``sz + [Cd] + (M,)``."""
    D = jnp.asarray(D)[0]          # (Cd, M, sz...)
    dimN = D.ndim - 2
    perm = tuple(range(2, 2 + dimN)) + (0, 1)
    D = jnp.transpose(D, perm)     # (sz..., Cd, M)
    if squeeze and cri.dimCd == 0:
        D = jnp.squeeze(D, axis=dimN)
    return D


def to_internal_X(X, cri):
    """Reference-layout ``Nv + (Cx, K, M)`` -> internal
    ``(K, Cx, M, Nv...)`` (for warm starts from saved reference state)."""
    X = jnp.asarray(X)
    dimN = cri.dimN
    perm = (dimN + 1, dimN, dimN + 2) + tuple(range(dimN))
    return jnp.transpose(X, perm)


def from_internal_X(X, cri):
    """Internal ``(K, Cx, M, Nv...)`` -> reference layout
    ``Nv + (Cx, K, M)`` (what ``solve()``/``getcoef()`` return, matching
    the reference's output layout)."""
    X = jnp.asarray(X)
    dimN = X.ndim - 3
    perm = tuple(range(3, 3 + dimN)) + (1, 0, 2)
    return jnp.transpose(X, perm)


def l1_weight(W, cri):
    """Convert a user-shaped l1 weight array to an internal-broadcastable
    array (capability of ``l1Wshape``, ``sporco/cnvrep.py:492``).

    Accepted user shapes: scalar; ``S.shape``; ``S.shape + (M,)``; or the
    full reference-internal ``Nv + (C, K, M)``.  Departure from the
    reference: when ``W`` matches ``S.shape`` with a single extra
    non-spatial axis, that axis is assigned the same role (C or K) it
    has in ``S`` -- the reference's rule can mis-assign a K axis to the
    channel slot (``sporco/cnvrep.py:534-536``), which we do not
    replicate.
    """
    W = jnp.asarray(W)
    if W.ndim == 0 or W.size == 1:
        return W.reshape((1,) * (3 + cri.dimN))
    dimN = cri.dimN
    sdim = dimN + cri.dimC + cri.dimK
    if W.ndim == sdim:
        # matches user S: expand like S, then broadcast over M
        return to_internal_S(W, cri)
    if W.ndim == sdim + 1 and W.ndim < dimN + 3:
        # S.shape + (M,): expand missing C/K axes
        Wx = W
        if cri.dimC == 0:
            Wx = jnp.expand_dims(Wx, dimN)
        if cri.dimK == 0:
            Wx = jnp.expand_dims(Wx, dimN + 1)
        return to_internal_X(Wx, cri)
    if W.ndim == dimN + 3:
        return to_internal_X(W, cri)
    raise ValueError(f"Cannot infer internal shape for weight array with "
                     f"shape {W.shape}")


def fidelity_mask(W, cri):
    """Convert a user-shaped data-fidelity mask to internal layout
    ``(K, C, 1, Nv...)``-broadcastable (capability of ``mskWshape``,
    ``sporco/cnvrep.py:554``)."""
    W = jnp.asarray(W)
    if W.ndim == 0 or W.size == 1:
        return W.reshape((1,) * (3 + cri.dimN))
    dimN = cri.dimN
    ckdim = W.ndim - dimN
    if ckdim <= 0:
        # spatial-only mask
        return W.reshape((1, 1, 1) + W.shape)
    if ckdim >= 2:
        Wck = W if ckdim == 2 else W[..., 0]
        perm = (dimN + 1, dimN) + tuple(range(dimN))
        return jnp.expand_dims(jnp.transpose(Wck, perm), 2)
    # exactly one extra axis: channel if S is multi-channel/single-signal
    # or multi-channel/multi-signal; else signal axis
    if cri.C == 1 and cri.K > 1:
        perm = (dimN,) + tuple(range(dimN))
        Wi = jnp.transpose(W, perm)           # (K, Nv...)
        return Wi[:, None, None]
    perm = (dimN,) + tuple(range(dimN))
    Wi = jnp.transpose(W, perm)               # (C, Nv...)
    return Wi[None, :, None]


# ---------------------------------------------------------------------------
# Dictionary constraint set projections (trailing-spatial layout:
# filters enumerated on leading axes, spatial support trailing)

def _iter_dsz_blocks(dsz, dimN):
    """Yield ``(m0, m1, c0, c1, support)`` blocks from a dsz spec
    (c0/c1 None = all channels)."""
    if not isinstance(dsz[0], tuple):
        yield 0, dsz[-1], None, None, tuple(dsz[:dimN])
        return
    m0 = 0
    for blk in dsz:
        if isinstance(blk[0], tuple):
            m1 = m0 + blk[0][-1]
            c0 = 0
            for cblk in blk:
                c1 = c0 + cblk[-2]
                yield m0, m1, c0, c1, tuple(cblk[:dimN])
                c0 = c1
        else:
            m1 = m0 + blk[-1]
            yield m0, m1, None, None, tuple(blk[:dimN])
        m0 = m1


def _blk_slice(v, m0, m1, c0, c1, support, dimN):
    sl = [slice(None)] * v.ndim
    axM = v.ndim - dimN - 1
    axC = v.ndim - dimN - 2
    sl[axM] = slice(m0, m1)
    if c0 is not None and axC >= 0:
        sl[axC] = slice(c0, c1)
    for k in range(dimN):
        sl[v.ndim - dimN + k] = slice(0, support[k])
    return tuple(sl)


def zeromean(v, dsz, dimN=2):
    """Subtract the per-filter mean over each filter's *support* (not the
    zero-padded embedding) (``sporco/cnvrep.py:609``).  ``v`` has spatial
    axes trailing; filter axis at ``-dimN-1``."""
    v = jnp.asarray(v)
    axisN = tuple(range(v.ndim - dimN, v.ndim))
    out = v
    for m0, m1, c0, c1, sup in _iter_dsz_blocks(dsz, dimN):
        sl = _blk_slice(v, m0, m1, c0, c1, sup, dimN)
        out = out.at[sl].add(-jnp.mean(v[sl], axis=axisN, keepdims=True))
    return out


def normalise(v, dimN=2):
    """Unit l2 norm over the trailing ``dimN`` (+channel, see note)
    axes.  To match the reference (which normalises jointly over spatial
    *and channel* axes for multi-channel dictionaries,
    ``sporco/cnvrep.py:673`` with leading-axis layout), callers pass
    ``dimN`` equal to the number of trailing axes to reduce over; the
    channel axis must be folded in by passing the channel-inclusive axes
    via :func:`Pcn`."""
    axisN = tuple(range(v.ndim - dimN, v.ndim))
    if jnp.iscomplexobj(v):
        vn = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=axisN, keepdims=True))
    else:
        vn = jnp.sqrt(jnp.sum(v ** 2, axis=axisN, keepdims=True))
    vn = jnp.where(vn == 0.0, 1.0, vn)
    return (v / vn).astype(v.dtype)


def _norm_axes(v, dimN):
    """Axes over which the unit-norm constraint applies: spatial plus the
    channel axis when present (parity with the reference where axisN
    spans spatial dims and broadcasting covers channels via the Cd axis
    at position -2; here channel is at ``-dimN-2``)."""
    axes = tuple(range(v.ndim - dimN, v.ndim))
    axC = v.ndim - dimN - 2
    if axC >= 0:
        axes = (axC,) + axes
    return axes


def _normalise_axes(v, axes):
    vn = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2 if jnp.iscomplexobj(v)
                          else v ** 2, axis=axes, keepdims=True))
    vn = jnp.where(vn == 0.0, 1.0, vn)
    return (v / vn).astype(v.dtype)


def zpad(v, Nv):
    """Zero-pad the trailing spatial axes to shape ``Nv`` (padding on the
    high side) (``sporco/cnvrep.py:704``)."""
    dimN = len(Nv)
    pad = [(0, 0)] * (v.ndim - dimN) + \
        [(0, Nv[k] - v.shape[v.ndim - dimN + k]) for k in range(dimN)]
    return jnp.pad(v, pad)


def bcrop(v, dsz, dimN=2):
    """Crop each filter to its support per the ``dsz`` spec
    (``sporco/cnvrep.py:729``); output spatial size is the max support."""
    ds = DictionarySize(dsz, dimN)
    maxsz = ds.mxsz
    out_shape = v.shape[:v.ndim - dimN] + tuple(maxsz)
    out = jnp.zeros(out_shape, v.dtype)
    for m0, m1, c0, c1, sup in _iter_dsz_blocks(dsz, dimN):
        sl = _blk_slice(out, m0, m1, c0, c1, sup, dimN)
        out = out.at[sl].set(v[sl])
    return out


def Pcn(x, dsz, Nv, dimN=2, crp=False, zm=False):
    """Projection onto the dictionary constraint set
    (``sporco/cnvrep.py:868``): crop to filter support, zero-pad back to
    ``Nv`` (unless ``crp`` -- then the result stays cropped), optional
    per-filter mean subtraction, then unit l2 normalisation over the
    support+channel axes.  Jittable for fixed (static) ``dsz``."""
    x = bcrop(x, dsz, dimN)
    if not crp:
        x = zpad(x, Nv)
    if zm:
        x = zeromean(x, dsz, dimN)
    return _normalise_axes(x, _norm_axes(x, dimN))


def getPcn(dsz, Nv, dimN=2, crp=False, zm=False):
    """Return a unary projection function with the given flags bound
    (``sporco/cnvrep.py:916``)."""
    def pcn(x):
        return Pcn(x, dsz, Nv, dimN=dimN, crp=crp, zm=zm)
    return pcn
