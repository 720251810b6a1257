"""Convolutional constrained MOD (dictionary update) via ADMM.

Capability parity with ``sporco/admm/ccmod.py``: the x-step is available
via iterated Sherman-Morrison over the signal axis
(:class:`ConvCnstrMOD_IterSM`, ``:433``), conjugate gradient
(:class:`ConvCnstrMOD_CG`, ``:511``), or the consensus formulation
(:class:`ConvCnstrMOD_Consensus`, ``:613``), selectable through the
:func:`ConvCnstrMOD` factory (``:914``; default ``'cns'``).

TPU-first notes: where the reference's consensus x-step loops over the
``Nb`` blocks in Python (``sporco/admm/ccmod.py:787-830``), here the
per-signal rank-1 solves are one *batched* ``solvedbi_sm`` over the
leading K axis -- this is also the axis sharded across devices by the
distributed consensus dictionary learning (see
:mod:`sporco_tpu.parallel`), with the consensus mean becoming an
all-reduce over ICI.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu import cnvrep as cr
from sporco_tpu.ops import fft as sf
from sporco_tpu.ops import linalg as sl
from sporco_tpu.solvers.admm import (ADMMOpts, AutoRhoOpts, ADMMProblem,
                                     init_state, tree_norm)
from sporco_tpu import refopts
from sporco_tpu.models.common import ADMMModel

__all__ = ["ConvCnstrMODBase", "ConvCnstrMOD_IterSM", "ConvCnstrMOD_CG",
           "ConvCnstrMOD_Consensus", "ConvCnstrMOD", "ConvCnstrMODOptions"]


@dataclass(frozen=True)
class CCMODConfig:
    cri: cr.CDUIndex
    method: str = "cns"        # ism | cg | cns
    zero_mean: bool = False
    cg_tol: float = 1e-3
    cg_max_iter: int = 1000
    lin_check: bool = False
    real: bool = True          # complex-input dispatch


def _cfwd(cfg, x, axes, s_=None):
    if cfg.real:
        return sf.rfftn(x, s=s_, axes=axes)
    return sf.fftn(x, s=s_, axes=axes)


def _cinv(cfg, xf, s_, axes):
    if cfg.real:
        return sf.irfftn(xf, s=s_, axes=axes)
    return sf.ifftn(xf, s=s_, axes=axes)


def _cpn2(cfg, xf, Nv, axes):
    if cfg.real:
        return sf.rfl2norm2(xf, Nv, axis=axes)
    return sf.fl2norm2(xf, axis=axes)


def _fftaxes(cri):
    return tuple(range(-cri.dimN, 0))


def _pcn(cfg, V):
    return cr.Pcn(V, cfg.cri.dsz, cfg.cri.Nv, dimN=cfg.cri.dimN,
                  zm=cfg.zero_mean)


def _setup(cfg, params):
    cri = cfg.cri
    axes = _fftaxes(cri)
    Zf = _cfwd(cfg, params["Z"], axes)
    Sf = _cfwd(cfg, params["S"], axes)
    ZSf = jnp.conj(Zf) * Sf                   # per-signal (K kept)
    aux = {"Zf": Zf, "Sf": Sf}
    if cfg.method != "cns":
        ZSf = jnp.sum(ZSf, axis=0, keepdims=True)
    else:
        # rho-independent per-bin coefficient energy for the batched
        # rank-1 solves
        aux["ZHZ"] = jnp.sum((Zf * jnp.conj(Zf)).real, axis=2,
                             keepdims=True)
    aux["ZSf"] = ZSf
    return aux


# --- single-variable methods (ism / cg) ------------------------------------

def _xstep_single(cfg, aux, params, state):
    cri = cfg.cri
    axes = _fftaxes(cri)
    rho = state.rho
    YU = state.Y - state.U
    b = aux["ZSf"] + rho * _cfwd(cfg, YU, axes)
    if cfg.method == "ism":
        Xf = sl.solvemdbi_ism(aux["Zf"], rho, b, axisM=2, axisK=0)
    else:
        Xf, _ = sl.solvemdbi_cg(aux["Zf"], rho, b, axisM=2, axisK=0,
                                tol=cfg.cg_tol,
                                max_iter=cfg.cg_max_iter)
    X = _cinv(cfg, Xf, cri.Nv, axes)
    xaux = {"Xf": Xf}
    if cfg.lin_check:
        Zop = jnp.sum(aux["Zf"] * Xf, axis=2, keepdims=True)
        ZHZX = jnp.sum(jnp.conj(aux["Zf"]) * Zop, axis=0, keepdims=True)
        xaux["xrrs"] = sl.rrs(ZHZX + rho * Xf, b)
    return X, xaux


def _ystep_single(cfg, aux, params, state, AXU):
    return _pcn(cfg, AXU)


def _obfn_single(cfg, aux, params, state, xaux):
    cri = cfg.cri
    # fEvalX default: dfd from Xf (sporco/admm/ccmod.py:138)
    Ef = jnp.sum(aux["Zf"] * xaux["Xf"], axis=2, keepdims=True) \
        - aux["Sf"]
    dfd = 0.5 * _cpn2(cfg, Ef, cri.Nv, _fftaxes(cri))
    cns = jnp.linalg.norm((_pcn(cfg, state.Y) - state.Y).ravel())
    xr = xaux.get("xrrs", jnp.nan) if cfg.lin_check else jnp.nan
    return (dfd, cns, xr)


def _yinit_single(cfg, params):
    return params["D0"]


def _uinit_single(cfg, params):
    return jnp.zeros_like(params["D0"])


_CCMOD_SINGLE = {
    m: ADMMProblem(setup=_setup, xstep=_xstep_single,
                   ystep=_ystep_single, obfn=_obfn_single,
                   yinit=_yinit_single, uinit=_uinit_single,
                   stat_names=("DFid", "Cnstr", "XSlvRelRes"))
    for m in ("ism", "cg")
}


# --- consensus method ------------------------------------------------------
# blocks = signals, stacked on the (leading) K axis: X/U are (K, Cd, M,
# Nv...), Y is (1, Cd, M, Nv...).  Broadcasting over axis 0 implements
# the reference's block replication.

def _xstep_cns(cfg, aux, params, state):
    cri = cfg.cri
    axes = _fftaxes(cri)
    rho = state.rho
    YU = state.Y - state.U                      # (K, Cd, M, Nv)
    b = aux["ZSf"] + rho * _cfwd(cfg, YU, axes)
    # batched per-signal rank-1 solve over the K axis
    Xf = sl.solvedbi_sm(aux["Zf"], rho, b, axis=2, aah=aux["ZHZ"])
    X = _cinv(cfg, Xf, cri.Nv, axes)
    xaux = {"Xf": Xf}
    if cfg.lin_check:
        ZSfs = jnp.sum(aux["ZSf"], axis=0, keepdims=True)
        YUs = jnp.sum(YU, axis=0, keepdims=True)
        bs = ZSfs + rho * _cfwd(cfg, YUs, axes)
        Zop = jnp.sum(aux["Zf"] * Xf, axis=2, keepdims=True)
        ax = jnp.sum(jnp.conj(aux["Zf"]) * Zop + rho * Xf, axis=0,
                     keepdims=True)
        xaux["xrrs"] = sl.rrs(ax, bs)
    return X, xaux


def _ystep_cns(cfg, aux, params, state, AXU):
    mAXU = jnp.mean(AXU, axis=0, keepdims=True)
    return _pcn(cfg, mAXU)


def _cns_rsdl_s(cfg, aux, params, state, Yprev):
    Nb = cfg.cri.K * (1 if cfg.cri.C == cfg.cri.Cd else cfg.cri.C)
    return state.rho * jnp.sqrt(float(Nb)) * (Yprev - state.Y)


def _cns_rsdl_sn(cfg, aux, params, state):
    return state.rho * tree_norm(state.U)


def _cns_rsdl_rn(cfg, aux, params, state, AXnr):
    Nb = cfg.cri.K * (1 if cfg.cri.C == cfg.cri.Cd else cfg.cri.C)
    return jnp.maximum(tree_norm(AXnr),
                       jnp.sqrt(float(Nb)) * tree_norm(state.Y))


def _cns_cnst_b(cfg, aux, params, Y):
    return jnp.negative(Y)      # broadcasts over the block (K) axis


def _obfn_cns(cfg, aux, params, state, xaux):
    cri = cfg.cri
    Ef = jnp.sum(aux["Zf"] * xaux["Xf"], axis=2, keepdims=True) \
        - aux["Sf"]
    dfd = 0.5 * _cpn2(cfg, Ef, cri.Nv, _fftaxes(cri))
    cns = jnp.linalg.norm((_pcn(cfg, state.Y) - state.Y).ravel())
    xr = xaux.get("xrrs", jnp.nan) if cfg.lin_check else jnp.nan
    return (dfd, cns, xr)


def _yinit_cns(cfg, params):
    return params["D0"]          # (1, Cd, M, Nv)


def _uinit_cns(cfg, params):
    Nb = params["Z"].shape[0]
    return jnp.zeros((Nb,) + params["D0"].shape[1:],
                     params["D0"].dtype)


def _xinit_cns(cfg, params):
    return _uinit_cns(cfg, params)


_CCMOD_CNS = ADMMProblem(
    setup=_setup, xstep=_xstep_cns, ystep=_ystep_cns, obfn=_obfn_cns,
    cnst_b=_cns_cnst_b,
    rsdl_s=_cns_rsdl_s, rsdl_sn=_cns_rsdl_sn, rsdl_rn=_cns_rsdl_rn,
    yinit=_yinit_cns, uinit=_uinit_cns, xinit=_xinit_cns,
    stat_names=("DFid", "Cnstr", "XSlvRelRes"))


class ConvCnstrMODBase(ADMMModel):
    r"""Shared construction for the CCMOD solvers: parses ``Z`` (in the
    reference's coefficient layout), ``S``, and a ``dsz`` spec; folds
    signal channels onto the signal axis for single-channel
    dictionaries (``sporco/admm/ccmod.py:270-280``)."""

    # reference ConvCnstrMOD option keys (sporco/admm/ccmod.py:131-147)
    REF_OPT_EXTRA = {
        **refopts._ADMM_EQUAL,
        "AuxVarObj": refopts.IGNORE,
        "ZeroMean": ("k", "zero_mean"),
        "LinSolveCheck": ("k", "lin_check"),
        "CG": ("sub", {"StopTol": ("k", "cg_tol"),
                       "MaxIter": ("k", "cg_max_iter")}),
    }

    METHOD = "ism"

    @staticmethod
    def options(**kw):
        # reference defaults (sporco/admm/ccmod.py:138-146,264):
        # AuxVarObj False, RelaxParam 1.8, AutoRho enabled Period 1,
        # rho = K
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=True, period=1,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2,
                                            rsdl_target=1.0))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, Z, S, dsz, opt=None, dimK=None, dimN=2,
                 D0=None, zero_mean=False, cg_tol=1e-3,
                 cg_max_iter=1000, lin_check=False, dtype=jnp.float32,
                 Y0=None, U0=None):
        super().__init__()
        if opt is None:
            opt = self.options()
        real = not (jnp.iscomplexobj(jnp.asarray(S))
                    or (Z is not None
                        and jnp.iscomplexobj(jnp.asarray(Z))))
        if not real:
            from sporco_tpu.ops.fft import complex_dtype
            dtype = complex_dtype(dtype)
        S = jnp.asarray(S, dtype)
        cri = cr.cdu_index(dsz, S.shape, dimK=dimK, dimN=dimN)
        self.cri = cri
        Si = cr.to_internal_S(S, cri)
        csc_like = cr.CSCIndex(dimN=cri.dimN, dimC=cri.dimC,
                               dimK=cri.dimK, dimCd=cri.dimCd, C=cri.C,
                               Cd=cri.Cd, Cx=cri.Cx, K=cri.K, M=cri.M,
                               Nv=cri.Nv, dsz=cri.Nv)
        Zi = cr.to_internal_X(jnp.asarray(Z, dtype), csc_like) \
            if Z is not None else jnp.zeros(cri.shpX, dtype)
        # single-channel dictionary + multi-channel signal: fold C onto K
        # (sporco/admm/ccmod.py:270-280)
        if cri.Cd == 1 and cri.C > 1:
            K2 = cri.C * cri.K
            Zi = Zi.reshape((K2, 1) + Zi.shape[2:])
            Si = Si.reshape((K2, 1, 1) + tuple(cri.Nv))
        if D0 is None:
            D0 = jnp.zeros(cri.shpD, dtype)
        else:
            D0i = cr.to_internal_D(jnp.asarray(D0, dtype), csc_like)
            D0 = cr.zpad(D0i, cri.Nv)
        self.cfg = CCMODConfig(cri=cri, method=self.METHOD,
                               zero_mean=zero_mean, cg_tol=cg_tol,
                               cg_max_iter=cg_max_iter,
                               lin_check=lin_check, real=real)
        self.opts = opt.replace(dtype=dtype)
        self.params = {"Z": Zi, "S": Si, "D0": D0}
        self.problem = _CCMOD_CNS if self.METHOD == "cns" \
            else _CCMOD_SINGLE[self.METHOD]
        rho0 = opt.rho if opt.rho is not None else float(cri.K)
        rho_xi = (opt.auto_rho.rsdl_target
                  if opt.auto_rho.rsdl_target is not None else 1.0)
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, rho_xi, Y0=Y0, U0=U0)
        self._init_done()

    def getmin(self):
        return self.getdict()

    def getdict(self, crop=True):
        D = self.state.Y
        if crop:
            D = cr.bcrop(D, self.cri.dsz, self.cri.dimN)
        return cr.from_internal_D(D, self.cri)

    def getdict_internal(self):
        """Full-support internal-layout dictionary (for dictlrn)."""
        return self.state.Y

    def setcoef(self, Z, internal=False):
        """Update the coefficient array (dictionary-learning loop)."""
        cri = self.cri
        if not internal:
            csc_like = cr.CSCIndex(dimN=cri.dimN, dimC=cri.dimC,
                                   dimK=cri.dimK, dimCd=cri.dimCd,
                                   C=cri.C, Cd=cri.Cd, Cx=cri.Cx,
                                   K=cri.K, M=cri.M, Nv=cri.Nv,
                                   dsz=cri.Nv)
            Z = cr.to_internal_X(jnp.asarray(Z, self.opts.dtype),
                                 csc_like)
        if cri.Cd == 1 and cri.C > 1:
            Z = Z.reshape((cri.C * cri.K, 1) + Z.shape[2:])
        self.params = {**self.params, "Z": Z}


class ConvCnstrMOD_IterSM(ConvCnstrMODBase):
    r"""CCMOD with iterated Sherman-Morrison x-step
    (wohlberg-2016-efficient; O(K^2), trace-unrolled -- prefer for
    small K)."""
    METHOD = "ism"


class ConvCnstrMOD_CG(ConvCnstrMODBase):
    r"""CCMOD with conjugate-gradient x-step."""
    METHOD = "cg"


class ConvCnstrMOD_Consensus(ConvCnstrMODBase):
    r"""CCMOD via single-variable consensus ADMM: per-signal rank-1
    solves batched over the K axis, dictionary consensus as a mean
    (the distributed all-reduce point)."""
    METHOD = "cns"


def ConvCnstrMOD(Z, S, dsz, opt=None, method="cns", **kwargs):
    """Factory dispatching on ``method`` in {'ism', 'cg', 'cns'}
    (``sporco/admm/ccmod.py:914-1001``; default 'cns')."""
    cls = {"ism": ConvCnstrMOD_IterSM, "cg": ConvCnstrMOD_CG,
           "cns": ConvCnstrMOD_Consensus}[method]
    return cls(Z, S, dsz, opt=opt, **kwargs)


def ConvCnstrMODOptions(opt=None, method="cns", **kw):
    """Options factory matching the reference's call surface
    (``sporco/admm/ccmod.py:970``)."""
    cls = {"ism": ConvCnstrMOD_IterSM, "cg": ConvCnstrMOD_CG,
           "cns": ConvCnstrMOD_Consensus}[method]
    if opt is not None:
        return opt
    return cls.options(**kw)
