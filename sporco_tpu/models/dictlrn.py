"""Dictionary learning coordinators.

Capability parity with ``sporco/dictlrn/``: the generic alternation
:class:`DictLearn` (``dictlrn/dictlrn.py:187``), :class:`BPDNDictLearn`
(``dictlrn/bpdndl.py:23``), :class:`WeightedBPDNDictLearn`
(``dictlrn/wbpdndl.py:24``), :class:`ConvBPDNDictLearn` with selectable
``xmethod``/``dmethod`` (``dictlrn/cbpdndl.py:231``),
:class:`ConvBPDNMaskDictLearn` (``dictlrn/cbpdndlmd.py:236``), and the
online/SGD :class:`OnlineConvBPDNDictLearn` (+Mask)
(``dictlrn/onlinecdl.py:33,464``).

Coefficient/dictionary transfers between the sparse-coding and
dictionary-update solvers stay in the internal TPU layout (no
user-layout round trips); each inner solver runs one (warm-started)
iteration per outer iteration, as in the reference
(``dictlrn/cbpdndl.py:50-56``).

The fully fused, device-sharded consensus dictionary learning lives in
:mod:`sporco_tpu.parallel.consensus`.
"""

import collections

import numpy as np
import jax
import jax.numpy as jnp

import warnings

from sporco_tpu import cnvrep as cr
from sporco_tpu import refopts
from sporco_tpu.ops import fft as sf
from sporco_tpu.models import bpdn as _bpdn
from sporco_tpu.models import cbpdn as _cbpdn
from sporco_tpu.models import cmod as _cmod
from sporco_tpu.models import ccmod as _ccmod
from sporco_tpu.models import pgm as _pgm
from sporco_tpu.utils.timer import Timer

__all__ = ["DictLearn", "BPDNDictLearn", "WeightedBPDNDictLearn",
           "ConvBPDNDictLearn", "ConvBPDNMaskDictLearn",
           "OnlineConvBPDNDictLearn", "OnlineConvBPDNMaskDictLearn"]




def _ref_dl_opt(opt, subnames):
    """Split a reference-style DictLearn option dict
    (``sporco/dictlrn/dictlrn.py:213``, ``cbpdndl.py:270-290``) into
    outer fields and inner-solver subtree dicts.  Unknown keys raise,
    matching ``cdict`` semantics.  Tuple keys address nested nodes
    (``sporco/cdict.py:260-307``)."""
    d = dict(refopts._expand_tuple_keys(opt))
    outer = {"max_iter": d.pop("MaxMainIter", None),
             "dsz": d.pop("DictSize", None)}
    for k in ("Verbose", "StatusHeader", "IterTimer", "Callback"):
        d.pop(k, None)
    if d.pop("AccurateDFid", None):
        warnings.warn("AccurateDFid is not supported; DFid is reported "
                      "from the inner solver state", stacklevel=3)
    subs = {n: d.pop(n, None) for n in subnames}
    if d:
        raise refopts.UnknownKeyError(
            f"unknown DictLearn option keys {sorted(d)}")
    return outer, subs


def _sub_opts(cls, sub, current, known_kw_out=None):
    """Translate an inner-solver subtree dict to ``cls``'s native opts
    (returned unchanged when ``sub`` is None or ``current`` was given
    explicitly).  Model-level keys present in the ``known_kw_out``
    dict are extracted INTO it (it is mutated by reference); any other
    are rejected with a clear message."""
    if sub is None or current is not None:
        return current
    opts, kw = refopts.translate(cls, sub)
    if known_kw_out:
        for k in list(kw):
            if k in known_kw_out:
                known_kw_out[k] = kw.pop(k)
    if kw:
        raise refopts.UnknownKeyError(
            f"inner option keys mapping to constructor arguments "
            f"{sorted(kw)} are not configurable through the "
            f"coordinator; construct the inner solver directly")
    return opts

class DictLearn:
    """Generic dictionary-learning alternation
    (``dictlrn/dictlrn.py:326-375``): per outer iteration run
    ``xstep.solve()``, transfer coefficients, run ``dstep.solve()``,
    transfer the dictionary back.  Subclasses define the transfer hooks.
    """

    def __init__(self, xstep, dstep, max_iter=100):
        self.xstep = xstep
        self.dstep = dstep
        self.max_iter = max_iter
        self.j = 0
        self.itstat = collections.defaultdict(list)
        self.timer = Timer(["init", "solve"])

    def post_xstep(self):
        self.dstep.setcoef(self.xstep.getcoef())

    def post_dstep(self):
        self.xstep.setdict(self.dstep.getdict())

    def _record(self):
        xs = self.xstep.getitstat()
        ds = self.dstep.getitstat()
        rec = {"Iter": self.j}
        for src, prefix in ((xs, "X"), (ds, "D")):
            for name in src._names:
                if name == "Iter":
                    continue
                v = getattr(src, name)
                rec[f"{prefix}{name}"] = float(v[-1]) if len(v) else np.nan
        for k, v in rec.items():
            self.itstat[k].append(v)

    def solve(self):
        self.timer.start("solve")
        for self.j in range(self.j, self.j + self.max_iter):
            self.xstep.solve()
            self.post_xstep()
            self.dstep.solve()
            self.post_dstep()
            self._record()
        self.j += 1
        self.timer.stop("solve")
        return self.getdict()

    def getdict(self):
        return self.dstep.getdict()

    def getcoef(self):
        return self.xstep.getcoef()

    def getitstat(self):
        return {k: np.asarray(v) for k, v in self.itstat.items()}


class BPDNDictLearn(DictLearn):
    r"""Standard (non-convolutional) dictionary learning: BPDN sparse
    coding + CnstrMOD dictionary update (``dictlrn/bpdndl.py:23``)."""

    def __init__(self, D0, S, lmbda=None, opt=None, max_iter=100,
                 xopt=None, dopt=None, dtype=jnp.float64):
        if isinstance(opt, dict):
            # reference-style option tree (sporco/dictlrn/bpdndl.py:48)
            outer, subs = _ref_dl_opt(opt, ("BPDN", "CMOD"))
            if outer["max_iter"] is not None:
                max_iter = outer["max_iter"]
            xopt = _sub_opts(_bpdn.BPDN, subs["BPDN"], xopt)
            dopt = _sub_opts(_cmod.CnstrMOD, subs["CMOD"], dopt)
        D0 = jnp.asarray(D0, dtype)
        S = jnp.asarray(S, dtype)
        D0 = _cmod.normalise(D0)
        if xopt is None:
            xopt = _bpdn.BPDN.options(max_iter=1, rel_stop_tol=0.0)
        else:
            # the inner while_loop tests residuals BEFORE the body, so
            # an inner tolerance would freeze the alternation on stale
            # residuals; the reference always runs its single inner
            # iteration unconditionally
            xopt = xopt.replace(max_iter=1, rel_stop_tol=0.0)
        if dopt is None:
            dopt = _cmod.CnstrMOD.options(max_iter=1, rel_stop_tol=0.0)
        else:
            dopt = dopt.replace(max_iter=1, rel_stop_tol=0.0)
        xstep = _bpdn.BPDN(D0, S, lmbda, opt=xopt, dtype=dtype)
        Z0 = jnp.zeros((D0.shape[1], S.shape[1] if S.ndim > 1 else 1),
                       dtype)
        dstep = _cmod.CnstrMOD(Z0, S if S.ndim > 1 else S[:, None],
                               opt=dopt, D0=D0, dtype=dtype)
        super().__init__(xstep, dstep, max_iter=max_iter)

    def post_xstep(self):
        self.dstep.setcoef(self.xstep.getcoef())

    def post_dstep(self):
        D = self.dstep.getdict()
        # refactorise the BPDN Gram (dictionary changed)
        from sporco_tpu.ops import linalg as sl
        self.xstep.params = {**self.xstep.params, "D": D,
                             "factor": sl.gram_eig_factor(D)}


class WeightedBPDNDictLearn(DictLearn):
    r"""Weighted-l2 dictionary learning via the PGM classes
    (``dictlrn/wbpdndl.py:24``)."""

    def __init__(self, D0, S, lmbda=None, W=None, opt=None,
                 max_iter=100, dtype=jnp.float64):
        D0 = jnp.asarray(D0, dtype)
        S = jnp.asarray(S, dtype)
        D0 = _cmod.normalise(D0)
        xopt = _pgm.WeightedBPDN.options(max_iter=1,
                                         rel_stop_tol=0.0)
        dopt = _pgm.WeightedCnstrMOD.options(max_iter=1,
                                             rel_stop_tol=0.0)
        xstep = _pgm.WeightedBPDN(D0, S, lmbda, W=W, opt=xopt,
                                  dtype=dtype)
        Z0 = np.zeros((D0.shape[1], S.shape[1] if S.ndim > 1 else 1))
        dstep = _pgm.WeightedCnstrMOD(jnp.asarray(Z0, dtype),
                                      S if S.ndim > 1 else S[:, None],
                                      W=W, opt=dopt, D0=D0, dtype=dtype)
        super().__init__(xstep, dstep, max_iter=max_iter)

    def post_dstep(self):
        self.xstep.params = {**self.xstep.params,
                             "D": self.dstep.getdict()}


class ConvBPDNDictLearn(DictLearn):
    r"""Convolutional dictionary learning: alternation of a CSC solver
    (``xmethod`` in {'admm', 'pgm'}) and a convolutional dictionary
    update (``dmethod`` in {'ism', 'cg', 'cns', 'pgm'})
    (``dictlrn/cbpdndl.py:31-229,231``).  Transfers stay in internal
    layout."""

    def __init__(self, D0, S, lmbda=None, opt=None, xmethod="admm",
                 dmethod="cns", max_iter=100, dimK=None, dimN=2,
                 xopt=None, dopt=None, zero_mean=False,
                 dtype=jnp.float64, dsz=None, mu=0.0, wgrd=1.0):
        if isinstance(opt, dict):
            # reference-style option tree (sporco/dictlrn/cbpdndl.py:270)
            outer, subs = _ref_dl_opt(opt, ("CBPDN", "CCMOD"))
            if outer["max_iter"] is not None:
                max_iter = outer["max_iter"]
            if outer["dsz"] is not None and dsz is None:
                dsz = outer["dsz"]
            if xmethod != "admm":
                xcls = _pgm.ConvBPDN
            elif mu > 0.0:
                xcls = _cbpdn.ConvBPDNGradReg
            else:
                xcls = _cbpdn.ConvBPDN
            dcls = (_pgm.ConvCnstrMOD if dmethod == "pgm"
                    else _ccmod.ConvCnstrMODBase)
            xkw = {"wgrd": None} if xcls is _cbpdn.ConvBPDNGradReg \
                else None
            xopt = _sub_opts(xcls, subs["CBPDN"], xopt, xkw)
            if xkw and xkw["wgrd"] is not None:
                wgrd = xkw["wgrd"]
            zm = {"zero_mean": None}
            dopt = _sub_opts(dcls, subs["CCMOD"], dopt, zm)
            if zm["zero_mean"] is not None:
                zero_mean = zm["zero_mean"]
        if xopt is not None:
            # every inner solve must run its single iteration even when
            # stale residuals from the previous outer iteration are
            # below tolerance: the inner while_loop tests BEFORE the
            # body, and the reference always runs MaxMainIter=1
            # unconditionally (sporco/dictlrn/cbpdndl.py:50-56)
            xopt = xopt.replace(rel_stop_tol=0.0)
        if dopt is not None:
            dopt = dopt.replace(rel_stop_tol=0.0)
        D0 = jnp.asarray(D0, dtype)
        S = jnp.asarray(S, dtype)
        self.xmethod = xmethod
        self.dmethod = dmethod
        # multi-scale dictionaries: ``dsz`` may be a nested size spec
        # (capability of the reference's DictSize option,
        # ``dictlrn/cbpdndl.py:274``); ``D0`` is then the max-support
        # zero-padded array
        if dsz is None:
            dsz = D0.shape
        # normalise initial dictionary (Pcn, dictlrn/cbpdndl.py:385)
        cri0 = cr.csc_index(D0.shape, S.shape, dimK=dimK, dimN=dimN)
        D0i = cr.to_internal_D(D0, cri0)
        D0i = cr.Pcn(D0i, tuple(dsz), D0.shape[:dimN], dimN=dimN,
                     zm=zero_mean)
        D0u = cr.from_internal_D(D0i, cri0)

        if xmethod == "admm":
            if xopt is None:
                xopt = _cbpdn.ConvBPDN.options(max_iter=1,
                                               rel_stop_tol=0.0)
            else:
                xopt = xopt.replace(max_iter=1, rel_stop_tol=0.0)
            if mu > 0.0:
                # gradient-regularised sparse coding stage (the
                # reference's cbpdndl_grd configuration)
                xstep = _cbpdn.ConvBPDNGradReg(
                    D0u, S, lmbda, mu=mu, wgrd=wgrd, opt=xopt,
                    dimK=dimK, dimN=dimN, dtype=dtype)
            else:
                xstep = _cbpdn.ConvBPDN(D0u, S, lmbda, opt=xopt,
                                        dimK=dimK, dimN=dimN,
                                        dtype=dtype)
        else:
            if xopt is None:
                xopt = _pgm.ConvBPDN.options(max_iter=1,
                                              rel_stop_tol=0.0)
            else:
                xopt = xopt.replace(max_iter=1)
            xstep = _pgm.ConvBPDN(D0u, S, lmbda, opt=xopt, dimK=dimK,
                                  dimN=dimN, dtype=dtype)

        Z0 = jnp.zeros(xstep.cri.shpX, dtype)
        if dmethod == "pgm":
            dopt_ = _pgm.ConvCnstrMOD.options(
                max_iter=1, rel_stop_tol=0.0) \
                if dopt is None else dopt.replace(max_iter=1)
            dstep = _pgm.ConvCnstrMOD(None, S, dsz, opt=dopt_,
                                      dimK=dimK, dimN=dimN,
                                      D0=D0u, zero_mean=zero_mean,
                                      dtype=dtype)
            dstep.params = {**dstep.params, "Z": Z0}
        else:
            dopt_ = _ccmod.ConvCnstrMODBase.options(
                max_iter=1, rel_stop_tol=0.0) if dopt is None \
                else dopt.replace(max_iter=1)
            dstep = _ccmod.ConvCnstrMOD(None, S, dsz, opt=dopt_,
                                        method=dmethod, dimK=dimK,
                                        dimN=dimN, D0=D0u,
                                        zero_mean=zero_mean,
                                        dtype=dtype)
            # warm start: Y0 = padded D0 (dictlrn/cbpdndl.py:452-456)
            D0pad = cr.zpad(D0i, dstep.cri.Nv)
            if dmethod == "cns":
                dstep.state = dstep.state._replace(Y=D0pad)
            else:
                dstep.state = dstep.state._replace(Y=D0pad)
        super().__init__(xstep, dstep, max_iter=max_iter)

    def post_xstep(self):
        self.dstep.setcoef(self.xstep.getcoef_internal(), internal=True)

    def post_dstep(self):
        Dfull = self.dstep.getdict_internal()     # (1, Cd, M, Nv)
        Dcrop = cr.bcrop(Dfull, self.dstep.cri.dsz, self.dstep.cri.dimN)
        self.xstep.setdict(internal=Dcrop)

    def getdict(self):
        return self.dstep.getdict()

    def reconstruct(self, X=None):
        return self.xstep.reconstruct(X)


class ConvBPDNMaskDictLearn(ConvBPDNDictLearn):
    r"""Masked convolutional dictionary learning: ConvBPDNMaskDcpl (or
    masked PGM CSC) + masked dictionary update
    (``dictlrn/cbpdndlmd.py:236``).

    The dictionary update uses the AMS-free consensus/PGM masked CCMOD:
    here the mask enters the sparse-coding step; the dictionary step
    uses the coefficient maps and masked residual via the PGM masked
    update when ``dmethod='pgm'``, else the plain update on ``W * S``.
    """

    def __init__(self, D0, S, lmbda=None, W=None, opt=None,
                 xmethod="admm", dmethod="cns", max_iter=100, dimK=None,
                 dimN=2, zero_mean=False, dtype=jnp.float64,
                 xopt=None, dopt=None):
        if isinstance(opt, dict):
            # reference-style option tree (sporco/dictlrn/cbpdndlmd.py)
            outer, subs = _ref_dl_opt(opt, ("CBPDN", "CCMOD"))
            if outer["max_iter"] is not None:
                max_iter = outer["max_iter"]
            xcls = (_cbpdn.ConvBPDNMaskDcpl if xmethod == "admm"
                    else _pgm.ConvBPDNMask)
            if dmethod == "pgm":
                dcls = _pgm.ConvCnstrMODMask
            else:
                from sporco_tpu.models import ccmodmd as _ccmodmd_
                dcls = _ccmodmd_.ConvCnstrMODMaskDcpl_Consensus
            xopt = _sub_opts(xcls, subs["CBPDN"], xopt)
            zm = {"zero_mean": None}
            dopt = _sub_opts(dcls, subs["CCMOD"], dopt, zm)
            if zm["zero_mean"] is not None:
                zero_mean = zm["zero_mean"]
        if xopt is not None:
            xopt = xopt.replace(rel_stop_tol=0.0)
        if dopt is not None:
            dopt = dopt.replace(rel_stop_tol=0.0)
        D0 = jnp.asarray(D0, dtype)
        S = jnp.asarray(S, dtype)
        self.xmethod = xmethod
        self.dmethod = dmethod
        dsz = D0.shape
        cri0 = cr.csc_index(D0.shape, S.shape, dimK=dimK, dimN=dimN)
        D0i = cr.to_internal_D(D0, cri0)
        D0i = cr.Pcn(D0i, tuple(dsz), dsz[:dimN], dimN=dimN,
                     zm=zero_mean)
        D0u = cr.from_internal_D(D0i, cri0)

        if xmethod == "admm":
            xopt = (_cbpdn.ConvBPDNMaskDcpl.options(rel_stop_tol=0.0)
                    if xopt is None else xopt).replace(max_iter=1)
            xstep = _cbpdn.ConvBPDNMaskDcpl(D0u, S, lmbda, W=W,
                                            opt=xopt, dimK=dimK,
                                            dimN=dimN, dtype=dtype)
        else:
            xopt = (_pgm.ConvBPDNMask.options(rel_stop_tol=0.0)
                    if xopt is None
                    else xopt).replace(max_iter=1)
            xstep = _pgm.ConvBPDNMask(D0u, S, lmbda, W=W, opt=xopt,
                                      dimK=dimK, dimN=dimN, dtype=dtype)

        if dmethod == "pgm":
            dopt = (_pgm.ConvCnstrMODMask.options(rel_stop_tol=0.0)
                    if dopt is None
                    else dopt).replace(max_iter=1)
            dstep = _pgm.ConvCnstrMODMask(None, S, dsz, W=W, opt=dopt,
                                          dimK=dimK, dimN=dimN, D0=D0u,
                                          zero_mean=zero_mean,
                                          dtype=dtype)
            dstep.params = {**dstep.params,
                            "Z": jnp.zeros(xstep.cri.shpX, dtype)}
        else:
            # masked dictionary update (ccmodmd)
            from sporco_tpu.models import ccmodmd as _ccmodmd
            if dopt is None:
                dopt = _ccmodmd.ConvCnstrMODMaskDcplOptions(
                    method=dmethod, max_iter=1, rel_stop_tol=0.0)
            else:
                dopt = dopt.replace(max_iter=1)
            dstep = _ccmodmd.ConvCnstrMODMaskDcpl(
                None, S, W, dsz, opt=dopt, method=dmethod, dimK=dimK,
                dimN=dimN, D0=D0u, zero_mean=zero_mean, dtype=dtype)
            D0pad = cr.zpad(D0i, dstep.cri.Nv)
            if dmethod == "cns":
                dstep.state = dstep.state._replace(
                    Y=(D0pad, dstep.state.Y[1]))
            else:
                dstep.state = dstep.state._replace(
                    Y=(dstep.state.Y[0], D0pad))
        DictLearn.__init__(self, xstep, dstep, max_iter=max_iter)

    def post_xstep(self):
        if self.xmethod == "admm":
            Z = self.xstep.state.Y[1]     # coefficient block
        else:
            Z = self.xstep.getcoef_internal()
        self.dstep.setcoef(Z, internal=True)

    def post_dstep(self):
        Dfull = self.dstep.getdict_internal()
        Dcrop = cr.bcrop(Dfull, self.dstep.cri.dsz, self.dstep.cri.dimN)
        if self.xmethod == "admm":
            self.xstep.params = {**self.xstep.params, "D": Dcrop}
        else:
            self.xstep.setdict(internal=Dcrop)


# ---------------------------------------------------------------------------
# Online (SGD) convolutional dictionary learning

@jax.jit
def _online_dstep(D, Z, S, eta, Nv_dummy):
    """One frequency-domain SGD dictionary step (liu-2018-first;
    ``dictlrn/onlinecdl.py:310-333``): ``Ghat = Dhat - eta Zhat^H (Zhat
    Dhat - Shat)``, with multi-channel-signal gradients summed over C.
    The constraint projection is applied outside (static dsz)."""
    axes = tuple(range(-(Nv_dummy.ndim), 0))
    Nv = Nv_dummy.shape
    Df = sf.rfftn(D, axes=axes)
    Zf = sf.rfftn(Z, axes=axes)
    Sf = sf.rfftn(S, axes=axes)
    Ryf = jnp.sum(Zf * Df, axis=2, keepdims=True) - Sf
    gradf = jnp.sum(jnp.conj(Zf) * Ryf, axis=0, keepdims=True)
    if gradf.shape[1] > D.shape[1]:     # C > Cd = 1
        gradf = jnp.sum(gradf, axis=1, keepdims=True)
    Gf = Df - eta * gradf
    return sf.irfftn(Gf, s=Nv, axes=axes)


class OnlineConvBPDNDictLearn:
    r"""Online convolutional dictionary learning (liu-2018-first;
    ``dictlrn/onlinecdl.py:33``): each ``solve(S)`` call runs a full
    CSC solve on the sample then one projected SGD step on the
    dictionary with step size ``eta_a / (j + eta_b)``."""

    MASKED = False

    def __init__(self, D0, lmbda=None, opt=None, eta_a=10.0, eta_b=5.0,
                 zero_mean=False, dimN=2, cbpdn_opt=None,
                 dtype=jnp.float32):
        if isinstance(opt, dict):
            # reference-style option tree (sporco/dictlrn/onlinecdl.py:80)
            d = dict(refopts._expand_tuple_keys(opt))
            for k in ("Verbose", "StatusHeader", "IterTimer",
                      "CUDA_CBPDN"):
                d.pop(k, None)
            if d.pop("DictSize", None) is not None:
                warnings.warn("DictSize is not supported by the online "
                              "coordinator; the dictionary size comes "
                              "from D0", stacklevel=2)
            if d.pop("DataType", None) is not None:
                dtype = opt["DataType"]
            eta_a = d.pop("eta_a", eta_a)
            eta_b = d.pop("eta_b", eta_b)
            zero_mean = d.pop("ZeroMean", zero_mean)
            sub = d.pop("CBPDN", None)
            if d:
                raise refopts.UnknownKeyError(
                    f"unknown online-CDL option keys {sorted(d)}")
            xcls = (_cbpdn.ConvBPDNMaskDcpl if self.MASKED
                    else _cbpdn.ConvBPDN)
            cbpdn_opt = _sub_opts(xcls, sub, cbpdn_opt)
        self.D0 = jnp.asarray(D0, dtype)
        self.dsz = self.D0.shape
        self.lmbda = lmbda
        self.eta_a = eta_a
        self.eta_b = eta_b
        self.zero_mean = zero_mean
        self.dimN = dimN
        self.dtype = dtype
        self.cbpdn_opt = cbpdn_opt
        self.j = 0
        self.cri = None
        self.D = None       # internal full-size, set on first sample
        self.Dcrop = None
        self.itstat = collections.defaultdict(list)
        self.timer = Timer(["init", "solve"])

    def _xsolve(self, S, W=None, dimK=None):
        opt = self.cbpdn_opt
        if self.MASKED:
            if opt is None:
                opt = _cbpdn.ConvBPDNMaskDcpl.options(max_iter=50)
            return _cbpdn.ConvBPDNMaskDcpl(
                self._dict_user(), S, self.lmbda, W=W, opt=opt,
                dimK=dimK, dimN=self.dimN, dtype=self.dtype)
        if opt is None:
            opt = _cbpdn.ConvBPDN.options(max_iter=50)
        return _cbpdn.ConvBPDN(self._dict_user(), S, self.lmbda,
                               opt=opt, dimK=dimK, dimN=self.dimN,
                               dtype=self.dtype)

    def _dict_user(self):
        if self.Dcrop is None:
            return self.D0
        return cr.from_internal_D(self.Dcrop, self.cri)

    def solve(self, S, W=None, dimK=None):
        """Sparse-code ``S`` with the current dictionary, then update
        the dictionary; returns the updated dictionary (user layout)."""
        self.timer.start("solve")
        S = jnp.asarray(S, self.dtype)
        xstep = self._xsolve(S, W=W, dimK=dimK)
        xstep.solve()
        cri = xstep.cri
        if self.cri is None:
            self.cri = cri
            self.D = cr.zpad(cr.to_internal_D(self.D0, cri), cri.Nv)
        if self.MASKED:
            Z = xstep.state.Y[1]
        else:
            Z = xstep.getcoef_internal()
        Si = cr.to_internal_S(S, cri)
        eta = self.eta_a / (self.j + self.eta_b)
        G = _online_dstep(self.D, Z, Si,
                          jnp.asarray(eta, self.dtype),
                          jnp.zeros(cri.Nv))
        self.D = cr.Pcn(G, tuple(self.dsz), cri.Nv,
                        dimN=self.dimN, zm=self.zero_mean)
        self.Dcrop = cr.bcrop(self.D, tuple(self.dsz), self.dimN)
        xs = xstep.getitstat()
        self.itstat["Iter"].append(self.j)
        for n in xs._names:
            if n != "Iter":
                v = getattr(xs, n)
                self.itstat[f"X{n}"].append(
                    float(v[-1]) if len(v) else np.nan)
        self.itstat["Eta"].append(eta)
        self.j += 1
        self.timer.stop("solve")
        return self.getdict()

    def getdict(self):
        if self.cri is None:
            return self.D0
        return cr.from_internal_D(self.Dcrop, self.cri)

    def getitstat(self):
        return {k: np.asarray(v) for k, v in self.itstat.items()}


class OnlineConvBPDNMaskDictLearn(OnlineConvBPDNDictLearn):
    r"""Masked online CDL (``dictlrn/onlinecdl.py:464``): the CSC step
    uses mask decoupling; the dictionary gradient uses the unmasked
    residual of the reconstruction (the mask is handled by the x-step's
    impulse-free residual)."""
    MASKED = True
