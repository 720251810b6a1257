"""Masked convolutional dictionary update (CCMOD with mask decoupling).

Capability parity with ``sporco/admm/ccmodmd.py``:
:class:`ConvCnstrMODMaskDcpl_IterSM` (``:573``),
:class:`ConvCnstrMODMaskDcpl_CG` (``:658``),
:class:`ConvCnstrMODMaskDcpl_Consensus` (``:766``), and the
:func:`ConvCnstrMODMaskDcpl` factory (``:1042``).

The reference's block bookkeeping (concatenating the signal-shaped mask
block onto the filter axis with a K/M axis swap,
``ccmodmd.py:400-448``) disappears: blocks are pytree tuples.  The
consensus variant's per-signal rank-1 solves are one batched
``solvedbi_sm`` over the leading K axis, as in
:mod:`sporco_tpu.models.ccmod`.
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu import cnvrep as cr
from sporco_tpu.ops import fft as sf
from sporco_tpu.ops import linalg as sl
from sporco_tpu.solvers.admm import (ADMMOpts, AutoRhoOpts, ADMMProblem,
                                     init_state, tree_norm)
from sporco_tpu.models.common import ADMMModel
from sporco_tpu.models.ccmod import ConvCnstrMODBase, _fftaxes, _pcn

__all__ = ["ConvCnstrMODMaskDcpl_IterSM", "ConvCnstrMODMaskDcpl_CG",
           "ConvCnstrMODMaskDcpl_Consensus", "ConvCnstrMODMaskDcpl",
           "ConvCnstrMODMaskDcplOptions"]


def _setup(cfg, params):
    cri = cfg.cri
    axes = _fftaxes(cri)
    Zf = sf.rfftn(params["Z"], axes=axes)
    Sf = sf.rfftn(params["S"], axes=axes)
    return {"Zf": Zf, "Sf": Sf,
            "ZHZ": jnp.sum((Zf * jnp.conj(Zf)).real, axis=2,
                           keepdims=True)}


# --- IterSM / CG: two-block (Z-op; I), blocks (signal-shaped, dict) --------

def _xstep_2b(cfg, aux, params, state):
    cri = cfg.cri
    axes = _fftaxes(cri)
    Y0, Y1 = state.Y
    U0, U1 = state.U
    Zf = aux["Zf"]
    YU0f = sf.rfftn(Y0 - U0 + params["S"], axes=axes)
    YU1f = sf.rfftn(Y1 - U1, axes=axes)
    b = jnp.sum(jnp.conj(Zf) * YU0f, axis=0, keepdims=True) + YU1f
    if cfg.method == "ism":
        Xf = sl.solvemdbi_ism(Zf, 1.0, b, axisM=2, axisK=0)
    else:
        Xf, _ = sl.solvemdbi_cg(Zf, 1.0, b, axisM=2, axisK=0,
                                tol=cfg.cg_tol,
                                max_iter=cfg.cg_max_iter)
    D = sf.irfftn(Xf, s=cri.Nv, axes=axes)
    ZDf = jnp.sum(Zf * Xf, axis=2, keepdims=True)       # (K,C,1,f)
    ZD = sf.irfftn(ZDf, s=cri.Nv, axes=axes)
    xaux = {"Xf": Xf}
    if cfg.lin_check:
        ZHZD = jnp.sum(jnp.conj(Zf) * ZDf, axis=0, keepdims=True)
        xaux["xrrs"] = sl.rrs(ZHZD + Xf, b)
    return (D, ZD), xaux


def _cnst_a_2b(cfg, aux, params, X):
    D, ZD = X
    return (ZD, D)


def _cnst_at_2b(cfg, aux, params, V):
    cri = cfg.cri
    axes = _fftaxes(cri)
    V0, V1 = V
    V0f = sf.rfftn(V0, axes=axes)
    At = jnp.sum(jnp.conj(aux["Zf"]) * V0f, axis=0, keepdims=True)
    return sf.irfftn(At, s=cri.Nv, axes=axes) + V1


def _cnst_b_2b(cfg, aux, params, Y):
    return jax.tree_util.tree_map(jnp.negative, Y)


def _cnst_c_2b(cfg, aux, params):
    return (params["S"], 0.0 * params["S"][:1, :1, :1])


def _ystep_2b(cfg, aux, params, state, AXU):
    rho = state.rho
    A0, A1 = AXU
    Y0 = rho * (A0 - params["S"]) / (params["W"] ** 2 + rho)
    Y1 = _pcn(cfg, A1)
    return (Y0, Y1)


def _obfn_2b(cfg, aux, params, state, xaux):
    cri = cfg.cri
    D, ZD = state.X
    dfd = 0.5 * jnp.sum((params["W"] * (ZD - params["S"])) ** 2)
    cns = jnp.linalg.norm((_pcn(cfg, state.Y[1]) - state.Y[1]).ravel())
    xr = xaux.get("xrrs", jnp.nan) if cfg.lin_check else jnp.nan
    return (dfd, cns, xr)


def _yinit_2b(cfg, params):
    return (jnp.zeros_like(params["S"]), params["D0"])


def _uinit_2b(cfg, params):
    return (jnp.zeros_like(params["S"]),
            jnp.zeros_like(params["D0"]))


def _xinit_2b(cfg, params):
    return (params["D0"], jnp.zeros_like(params["S"]))


_CCMODMD_2B = {
    m: ADMMProblem(setup=_setup, xstep=_xstep_2b, ystep=_ystep_2b,
                   obfn=_obfn_2b, cnst_a=_cnst_a_2b, cnst_at=_cnst_at_2b,
                   cnst_b=_cnst_b_2b, cnst_c=_cnst_c_2b,
                   yinit=_yinit_2b, uinit=_uinit_2b, xinit=_xinit_2b,
                   stat_names=("DFid", "Cnstr", "XSlvRelRes"))
    for m in ("ism", "cg")
}


# --- consensus with mask decoupling ----------------------------------------
# Y = (DY (1,Cd,M,Nv), Y1 (K,C,1,Nv)); U/X analogous with leading K.

def _xstep_cnsm(cfg, aux, params, state):
    cri = cfg.cri
    axes = _fftaxes(cri)
    DY, Y1 = state.Y
    DU, U1 = state.U
    Zf = aux["Zf"]
    # ZSf derived from the mask block (ccmodmd.py:927-944); the x-step
    # runs with unit penalty
    ZSf = jnp.conj(Zf) * (aux["Sf"] + sf.rfftn(Y1 - U1, axes=axes))
    b = ZSf + sf.rfftn(DY - DU, axes=axes)
    DXf = sl.solvedbi_sm(Zf, 1.0, b, axis=2, aah=aux["ZHZ"])
    DX = sf.irfftn(DXf, s=cri.Nv, axes=axes)
    ZDf = jnp.sum(Zf * DXf, axis=2, keepdims=True)
    ZD = sf.irfftn(ZDf, s=cri.Nv, axes=axes)
    return (DX, ZD), {"Xf": DXf}


def _cnst_b_cnsm(cfg, aux, params, Y):
    return jax.tree_util.tree_map(jnp.negative, Y)


def _cnst_c_cnsm(cfg, aux, params):
    return (0.0 * params["S"][:1, :1, :1], params["S"])


def _ystep_cnsm(cfg, aux, params, state, AXU):
    rho = state.rho
    A0, A1 = AXU
    DY = _pcn(cfg, jnp.mean(A0, axis=0, keepdims=True))
    Y1 = rho * (A1 - params["S"]) / (params["W"] ** 2 + rho)
    return (DY, Y1)


def _cnsm_rsdl_r(cfg, aux, params, state, AXnr):
    # residuals on the D consensus blocks only (the reference inherits
    # the baseline consensus residual definitions, ccmodmd.py:766)
    return AXnr[0] - state.Y[0]


def _cnsm_rsdl_s(cfg, aux, params, state, Yprev):
    Nb = params["Z"].shape[0]
    return state.rho * jnp.sqrt(float(Nb)) * (Yprev[0] - state.Y[0])


def _cnsm_rsdl_rn(cfg, aux, params, state, AXnr):
    Nb = params["Z"].shape[0]
    return jnp.maximum(tree_norm(AXnr[0]),
                       jnp.sqrt(float(Nb)) * tree_norm(state.Y[0]))


def _cnsm_rsdl_sn(cfg, aux, params, state):
    return state.rho * tree_norm(state.U[0])


def _obfn_cnsm(cfg, aux, params, state, xaux):
    DX, ZD = state.X
    dfd = 0.5 * jnp.sum((params["W"] * (ZD - params["S"])) ** 2)
    DY = state.Y[0]
    cns = jnp.linalg.norm((_pcn(cfg, DY) - DY).ravel())
    return (dfd, cns, jnp.nan)


def _yinit_cnsm(cfg, params):
    return (params["D0"], jnp.zeros_like(params["S"]))


def _uinit_cnsm(cfg, params):
    Nb = params["Z"].shape[0]
    return (jnp.zeros((Nb,) + params["D0"].shape[1:],
                      params["D0"].dtype),
            jnp.zeros_like(params["S"]))


def _xinit_cnsm(cfg, params):
    return (_uinit_cnsm(cfg, params)[0], jnp.zeros_like(params["S"]))


_CCMODMD_CNS = ADMMProblem(
    setup=_setup, xstep=_xstep_cnsm, ystep=_ystep_cnsm, obfn=_obfn_cnsm,
    cnst_b=_cnst_b_cnsm, cnst_c=_cnst_c_cnsm,
    rsdl_r=_cnsm_rsdl_r, rsdl_s=_cnsm_rsdl_s,
    rsdl_rn=_cnsm_rsdl_rn, rsdl_sn=_cnsm_rsdl_sn,
    yinit=_yinit_cnsm, uinit=_uinit_cnsm, xinit=_xinit_cnsm,
    stat_names=("DFid", "Cnstr", "XSlvRelRes"))


class _MaskedCCMODBase(ConvCnstrMODBase):
    """Masked CCMOD solvers: same construction as
    :class:`ConvCnstrMODBase` plus the fidelity mask ``W``."""

    @classmethod
    def options(cls, **kw):
        if cls.METHOD == "cns":
            return ConvCnstrMODBase.options(**kw)
        # two-block defaults: rho = 1.0, AutoRho disabled
        # (sporco/admm/ccmodmd.py:165-169)
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=False))
        base = dict(relax_param=1.8, auto_rho=ar, rho=1.0)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, Z, S, W, dsz, opt=None, **kw):
        self._W_user = W
        if opt is None:
            opt = self.options()
        super().__init__(Z, S, dsz, opt=opt, **kw)
        dtype = self.opts.dtype
        if W is None:
            W = jnp.ones((1,) * (3 + self.cri.dimN), dtype)
        else:
            W = cr.fidelity_mask(jnp.asarray(W, dtype), self.cri)
            if self.cri.Cd == 1 and self.cri.C > 1:
                # C folded onto K in S (ccmodmd.py:283-300): fold the
                # mask the same way when it carries those axes
                if W.shape[0] > 1 or W.shape[1] > 1:
                    K2 = self.cri.C * self.cri.K
                    W = jnp.broadcast_to(
                        W, (self.cri.K, self.cri.C, 1) + W.shape[3:])
                    W = W.reshape((K2, 1, 1) + W.shape[3:])
        self.params = {**self.params, "W": W}
        # rebuild state (problem selection happened in the base ctor)
        self.problem = _CCMODMD_CNS if self.METHOD == "cns" \
            else _CCMODMD_2B[self.METHOD]
        if self.opts.rho is not None:
            rho0 = self.opts.rho
        else:
            rho0 = float(self.cri.K) if self.METHOD == "cns" else 1.0
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0,
                                float(self.state.rho_xi))

    def getdict(self, crop=True):
        D = self.state.Y[1] if self.METHOD != "cns" else self.state.Y[0]
        if crop:
            D = cr.bcrop(D, self.cri.dsz, self.cri.dimN)
        return cr.from_internal_D(D, self.cri)

    def getdict_internal(self):
        return self.state.Y[1] if self.METHOD != "cns" \
            else self.state.Y[0]


class ConvCnstrMODMaskDcpl_IterSM(_MaskedCCMODBase):
    r"""Masked CCMOD with iterated Sherman-Morrison x-step."""
    METHOD = "ism"


class ConvCnstrMODMaskDcpl_CG(_MaskedCCMODBase):
    r"""Masked CCMOD with conjugate-gradient x-step."""
    METHOD = "cg"


class ConvCnstrMODMaskDcpl_Consensus(_MaskedCCMODBase):
    r"""Masked CCMOD via consensus with per-signal batched rank-1
    solves."""
    METHOD = "cns"


def ConvCnstrMODMaskDcpl(Z, S, W, dsz, opt=None, method="cns", **kw):
    """Factory dispatching on ``method`` (``ccmodmd.py:1042``)."""
    cls = {"ism": ConvCnstrMODMaskDcpl_IterSM,
           "cg": ConvCnstrMODMaskDcpl_CG,
           "cns": ConvCnstrMODMaskDcpl_Consensus}[method]
    return cls(Z, S, W, dsz, opt=opt, **kw)


def ConvCnstrMODMaskDcplOptions(opt=None, method="cns", **kw):
    """Options factory (``ccmodmd.py:1101``)."""
    if opt is not None:
        return opt
    cls = {"ism": ConvCnstrMODMaskDcpl_IterSM,
           "cg": ConvCnstrMODMaskDcpl_CG,
           "cns": ConvCnstrMODMaskDcpl_Consensus}[method]
    return cls.options(**kw)
