"""CSC with Total Variation regularisation of the coefficient maps.

Capability parity with ``sporco/admm/cbpdntv.py``:
:class:`ConvBPDNScalarTV` (``:31``), :class:`ConvBPDNVectorTV`
(``:577``), :class:`ConvBPDNRecTV` (``:733``).

Layout: constraint blocks (gradient operators + identity / data) stack
on a new *leading* axis (the reference appends a trailing axis,
``cbpdntv.py:277``); spatial axes stay trailing for the TPU FFT.  The
primal variable carries ``(X, AX)`` so constraint applications cost no
extra transforms outside the x-step.
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu import cnvrep as cr
from sporco_tpu.ops import fft as sf
from sporco_tpu.ops import linalg as sl
from sporco_tpu.ops import prox as sp
from sporco_tpu.solvers.admm import (ADMMOpts, AutoRhoOpts, ADMMProblem,
                                     init_state)
from sporco_tpu import refopts
from sporco_tpu.models.common import ADMMModel
from sporco_tpu.models.cbpdn import _max_abs_dhs, _reconstruct_jit, \
    _internal_S_to_user
from sporco_tpu.utils.signal import gradient_filters

__all__ = ["ConvBPDNScalarTV", "ConvBPDNVectorTV", "ConvBPDNRecTV"]


@dataclass(frozen=True)
class CSCTVConfig:
    cri: cr.CSCIndex
    variant: str = "scalar"    # scalar | vector | rec
    lin_check: bool = False


def _fftaxes(cri):
    return tuple(range(-cri.dimN, 0))


def _grad_stack(cfg, params):
    """Gf with shape (J, 1, 1, 1, freq...) broadcastable against Xf."""
    cri = cfg.cri
    Gf, GHGf = gradient_filters(cri.dimN, cri.Nv,
                                dtype=params["S"].dtype)
    Gf = Gf.reshape((cri.dimN,) + (1, 1, 1) + Gf.shape[1:])
    return Gf, GHGf


def _tv_setup(cfg, params):
    cri = cfg.cri
    axes = _fftaxes(cri)
    Df = sf.rfftn(params["D"], s=cri.Nv, axes=axes)
    Sf = sf.rfftn(params["S"], axes=axes)
    DSf = jnp.conj(Df) * Sf
    if cri.Cd > 1:
        DSf = jnp.sum(DSf, axis=1, keepdims=True)
    Gf, GHGf = _grad_stack(cfg, params)
    aux = {"Df": Df, "Sf": Sf, "DSf": DSf, "Gf": Gf}
    if cfg.variant == "rec":
        # weighted gradients of the dictionary atoms:
        # (J, 1, Cd, M, freq...)
        aux["GDf"] = params["wtv"] * Gf * Df[None]
    else:
        aux["GHGfW"] = params["wtv"] ** 2 * GHGf
    return aux


# --- scalar / vector TV ----------------------------------------------------
# Y/U: (J+1, K, Cx, M, Nv...) -- J gradient blocks + identity block

def _sv_xstep(cfg, aux, params, state):
    cri = cfg.cri
    axes = _fftaxes(cri)
    rho = state.rho
    YU = state.Y - state.U
    YUf = sf.rfftn(YU, axes=axes)
    b = aux["DSf"] + rho * (
        YUf[-1] + params["wtv"]
        * jnp.sum(jnp.conj(aux["Gf"]) * YUf[:-1], axis=0))
    d = rho * aux["GHGfW"] + rho
    if cri.Cd == 1:
        Xf = sl.solvedbd_sm(aux["Df"], d, b, axis=2)
    else:
        Xf = sl.solvemdbi_ism(aux["Df"], d, b, axisM=2, axisK=1)
    X = sf.irfftn(Xf, s=cri.Nv, axes=axes)
    # A x = (wtv G_1 x, ..., wtv G_J x, x), blocks leading
    GX = sf.irfftn(params["wtv"] * aux["Gf"] * Xf[None], s=cri.Nv,
                   axes=axes)
    AX = jnp.concatenate([GX, X[None]], axis=0)
    xaux = {"Xf": Xf}
    if cfg.lin_check:
        DXf = jnp.sum(aux["Df"] * Xf, axis=2, keepdims=True)
        if cri.Cd == 1:
            DHDXf = jnp.conj(aux["Df"]) * DXf
        else:
            DHDXf = jnp.sum(jnp.conj(aux["Df"]) * DXf, axis=1,
                            keepdims=True)
        xaux["xrrs"] = sl.rrs(DHDXf + d * Xf, b)
    return (X, AX), xaux


def _sv_cnst_a(cfg, aux, params, XAX):
    return XAX[1]


def _sv_cnst_at(cfg, aux, params, V):
    cri = cfg.cri
    axes = _fftaxes(cri)
    Vf = sf.rfftn(V[:-1], axes=axes)
    G = sf.irfftn(params["wtv"] * jnp.sum(jnp.conj(aux["Gf"]) * Vf,
                                          axis=0),
                  s=cri.Nv, axes=axes)
    return G + V[-1]


def _sv_ystep(cfg, aux, params, state, AXU):
    rho = state.rho
    if cfg.variant == "vector":
        # joint over filters and gradient index
        # (sporco/admm/cbpdntv.py:136-137: axis=(axisM, -1))
        Yg = sp.prox_l2(AXU[:-1], params["mu"] / rho, axis=(0, 3))
    else:
        # scalar TV: the reference applies prox_l2 with axis=None
        # (cbpdntv.py:404), i.e. shrinkage of the whole gradient stack
        # by its global norm; replicated for behavioural parity
        Yg = sp.prox_l2(AXU[:-1], params["mu"] / rho, axis=None)
    Yl = sp.prox_l1(AXU[-1], (params["lmbda"] / rho) * params["wl1"])
    return jnp.concatenate([Yg, Yl[None]], axis=0)


def _sv_obfn(cfg, aux, params, state, xaux):
    cri = cfg.cri
    dfd = 0.5 * sf.rfl2norm2(
        jnp.sum(aux["Df"] * xaux["Xf"], axis=2, keepdims=True)
        - aux["Sf"], cri.Nv, axis=_fftaxes(cri))
    # gEvalY=False default: regularisers evaluated on the unrelaxed
    # A(X) application carried in the primal tuple
    # (sporco/admm/cbpdntv.py obfn_g0var/obfn_g1var)
    AXnr = state.X[1]
    rl1 = jnp.sum(jnp.abs(params["wl1"] * AXnr[-1]))
    if cfg.variant == "vector":
        rtv = jnp.sum(jnp.sqrt(jnp.sum(AXnr[:-1] ** 2, axis=(0, 3))))
    else:
        rtv = jnp.sum(jnp.sqrt(jnp.sum(AXnr[:-1] ** 2, axis=0)))
    xr = xaux.get("xrrs", jnp.nan) if cfg.lin_check else jnp.nan
    return (dfd + params["lmbda"] * rl1 + params["mu"] * rtv,
            dfd, rl1, rtv, xr)


def _sv_yinit(cfg, params):
    cri = cfg.cri
    return jnp.zeros((cri.dimN + 1,) + cri.shpX, params["S"].dtype)


def _sv_xinit(cfg, params):
    cri = cfg.cri
    return (jnp.zeros(cri.shpX, params["S"].dtype),
            jnp.zeros((cri.dimN + 1,) + cri.shpX, params["S"].dtype))


_SV_PROBLEMS = {
    v: ADMMProblem(setup=_tv_setup, xstep=_sv_xstep, ystep=_sv_ystep,
                   obfn=_sv_obfn, cnst_a=_sv_cnst_a, cnst_at=_sv_cnst_at,
                   yinit=_sv_yinit, uinit=_sv_yinit, xinit=_sv_xinit,
                   stat_names=("ObjFun", "DFid", "RegL1", "RegTV",
                               "XSlvRelRes"))
    for v in ("scalar", "vector")
}


# --- recombined TV ---------------------------------------------------------
# blocks: y0 = x (shpX); y1 = gradients of the reconstruction, shape
# (J, K, C, 1, Nv...)

def _rec_xstep(cfg, aux, params, state):
    cri = cfg.cri
    axes = _fftaxes(cri)
    rho = state.rho
    Y0, Y1 = state.Y
    U0, U1 = state.U
    YU0f = sf.rfftn(Y0 - U0, axes=axes)
    YU1f = sf.rfftn(Y1 - U1, axes=axes)      # (J, K, C, 1, f)
    GDf = aux["GDf"]                         # (J, 1, Cd, M, f)
    # (G_i D)^H applied to the gradient blocks: sum over j (and over
    # channels for a multi-channel dictionary)
    bG = jnp.sum(jnp.conj(GDf) * YU1f, axis=0)     # (K, C, M, f)
    if cri.Cd > 1:
        bG = jnp.sum(bG, axis=1, keepdims=True)
    b = aux["DSf"] + rho * YU0f + rho * bG
    # augmented rank terms on the channel axis: Df rows + sqrt(rho)
    # (G_i D) rows (sporco/admm/cbpdntv.py:1038-1051)
    ah = jnp.concatenate(
        [aux["Df"]] + [jnp.sqrt(rho) * GDf[j]
                       for j in range(GDf.shape[0])], axis=1)
    Xf = sl.solvemdbi_ism(ah, rho, b, axisM=2, axisK=1)
    X = sf.irfftn(Xf, s=cri.Nv, axes=axes)
    GDXf = jnp.sum(GDf * Xf[None], axis=3, keepdims=True)
    GDX = sf.irfftn(GDXf, s=cri.Nv, axes=axes)   # (J, K, C, 1, Nv)
    xaux = {"Xf": Xf}
    return (X, GDX), xaux


def _rec_cnst_a(cfg, aux, params, XG):
    X, GDX = XG
    return (X, GDX)


def _rec_cnst_at(cfg, aux, params, V):
    cri = cfg.cri
    axes = _fftaxes(cri)
    V0, V1 = V
    V1f = sf.rfftn(V1, axes=axes)
    At = jnp.sum(jnp.conj(aux["GDf"]) * V1f, axis=0)
    if cri.Cd > 1:
        At = jnp.sum(At, axis=1, keepdims=True)
    return V0 + sf.irfftn(At, s=cri.Nv, axes=axes)


def _rec_ystep(cfg, aux, params, state, AXU):
    rho = state.rho
    A0, A1 = AXU
    Y0 = sp.prox_l1(A0, (params["lmbda"] / rho) * params["wl1"])
    # joint over channel and gradient index (cbpdntv.py: axisC, -1)
    Y1 = sp.prox_l2(A1, params["mu"] / rho, axis=(0, 2))
    return (Y0, Y1)


def _rec_obfn(cfg, aux, params, state, xaux):
    cri = cfg.cri
    dfd = 0.5 * sf.rfl2norm2(
        jnp.sum(aux["Df"] * xaux["Xf"], axis=2, keepdims=True)
        - aux["Sf"], cri.Nv, axis=_fftaxes(cri))
    # gEvalY=False default: evaluate from the unrelaxed primal
    X0_, GDX = state.X
    rl1 = jnp.sum(jnp.abs(params["wl1"] * X0_))
    rtv = jnp.sum(jnp.sqrt(jnp.sum(GDX ** 2, axis=(0, 2))))
    return (dfd + params["lmbda"] * rl1 + params["mu"] * rtv,
            dfd, rl1, rtv, jnp.nan)


def _rec_yinit(cfg, params):
    cri = cfg.cri
    shp1 = (cri.dimN, cri.K, cri.C, 1) + tuple(cri.Nv)
    return (jnp.zeros(cri.shpX, params["S"].dtype),
            jnp.zeros(shp1, params["S"].dtype))


def _rec_xinit(cfg, params):
    return _rec_yinit(cfg, params)


_REC_PROBLEM = ADMMProblem(
    setup=_tv_setup, xstep=_rec_xstep, ystep=_rec_ystep, obfn=_rec_obfn,
    cnst_a=_rec_cnst_a, cnst_at=_rec_cnst_at,
    yinit=_rec_yinit, uinit=_rec_yinit, xinit=_rec_xinit,
    stat_names=("ObjFun", "DFid", "RegL1", "RegTV", "XSlvRelRes"))


class ConvBPDNScalarTV(ADMMModel):
    r"""CSC with per-map scalar TV:
    ``argmin_x (1/2)||sum_m d_m*x_m - s||^2 + lmbda||x||_1 +
    mu sum_m || sqrt(sum_i (G_i x_m)^2) ||_1``
    (``sporco/admm/cbpdntv.py:31``)."""

    # reference cbpdntv option keys (sporco/admm/cbpdntv.py:147-153):
    # ConvBPDN keys + TVWeight
    REF_OPT_EXTRA = {
        **refopts._ADMM_EQUAL,
        "AuxVarObj": refopts.IGNORE,
        "HighMemSolve": refopts.IGNORE,
        "LinSolveCheck": ("k", "lin_check"),
        "NonNegCoef": refopts.WARN,
        "NoBndryCross": refopts.WARN,
        "L1Weight": ("k", "wl1"),
        "TVWeight": ("k", "wtv"),
    }

    VARIANT = "scalar"

    @staticmethod
    def options(**kw):
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=True, period=1,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2,
                                            rsdl_target=1.0))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, D, S, lmbda, mu=0.0, opt=None, dimK=None,
                 dimN=2, wl1=1.0, wtv=1.0, lin_check=False,
                 dtype=jnp.float32, Y0=None, U0=None):
        super().__init__()
        if opt is None:
            opt = self.options()
        D = jnp.asarray(D, dtype)
        S = jnp.asarray(S, dtype)
        cri = cr.csc_index(D.shape, S.shape, dimK=dimK, dimN=dimN)
        self.cri = cri
        Di = cr.to_internal_D(D, cri)
        Si = cr.to_internal_S(S, cri)
        self.lmbda = lmbda
        self.cfg = CSCTVConfig(cri=cri, variant=self.VARIANT,
                               lin_check=lin_check)
        self.opts = opt.replace(dtype=dtype)
        wl1a = jnp.asarray(wl1, dtype)
        if wl1a.ndim > 0:
            wl1a = cr.l1_weight(wl1a, cri)
        wtva = jnp.asarray(wtv, dtype)
        if wtva.ndim == 1:
            wtva = wtva.reshape((1, 1, wtva.shape[0]) + (1,) * dimN)
        self.params = {"D": Di, "S": Si,
                       "lmbda": jnp.asarray(lmbda, dtype),
                       "mu": jnp.asarray(mu, dtype),
                       "wl1": wl1a, "wtv": wtva}
        self.problem = _SV_PROBLEMS[self.VARIANT] \
            if self.VARIANT != "rec" else _REC_PROBLEM
        # the reference's 50*lmbda+1 dval is dead code: the ADMM base
        # initialiser sets rho = 1.0 first and set_attr does not
        # overwrite (sporco/admm/cbpdntv.py:204,221 + common.py set_attr)
        rho0 = opt.rho if opt.rho is not None else 1.0
        rho_xi = (opt.auto_rho.rsdl_target
                  if opt.auto_rho.rsdl_target is not None else 1.0)
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, rho_xi, Y0=Y0, U0=U0)
        self._init_done()

    def getmin(self):
        if self.VARIANT == "rec":
            return cr.from_internal_X(self.state.Y[0], self.cri)
        return cr.from_internal_X(self.state.Y[-1], self.cri)

    def getcoef(self):
        return self.getmin()

    def reconstruct(self, X=None):
        Xi = self.state.X[0] if X is None \
            else cr.to_internal_X(jnp.asarray(X), self.cri)
        Si = _reconstruct_jit(self.params["D"], Xi,
                              jnp.zeros(self.cri.Nv))
        return _internal_S_to_user(Si, self.cri)


class ConvBPDNVectorTV(ConvBPDNScalarTV):
    r"""CSC with vector TV jointly over filters
    (``sporco/admm/cbpdntv.py:577``)."""
    VARIANT = "vector"


class ConvBPDNRecTV(ConvBPDNScalarTV):
    r"""CSC with TV of the *reconstruction*
    (``sporco/admm/cbpdntv.py:733``): the TV operator rows are
    ``G_i D``, solved via an augmented-rank iterated Sherman-Morrison
    x-step (``cbpdntv.py:1024-1106``)."""
    VARIANT = "rec"
