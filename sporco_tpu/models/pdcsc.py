"""CSC with product dictionaries (convolutional x standard).

Capability parity with ``sporco/admm/pdcsc.py``:
:class:`ConvProdDictBPDN` (``:28``), :class:`ConvProdDictBPDNJoint`
(``:198``), :class:`ConvProdDictL1L1Grd` (``:293``),
:class:`ConvProdDictL1L1GrdJoint` (``:584``) -- the model
``argmin_X (1/2)||D X B^T - S||^2 + ...`` where ``D`` is a
single-channel convolutional dictionary acting spatially and ``B`` a
standard dictionary acting on the channel axis (e.g. a spectral basis).

The x-step diagonalises ``B`` via the eigendecomposition of ``B^T B``
(garcia-2018-convolutional2): in B's eigenbasis each eigen-channel is an
independent scaled rank-1 DFT-domain system solved by Sherman-Morrison
(``pdcsc.py:137-146,509-525``).
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
                                     init_state, tree_norm)
from sporco_tpu import refopts
from sporco_tpu.models.common import ADMMModel, default_rho_xi
from sporco_tpu.utils.signal import gradient_filters

__all__ = ["ConvProdDictBPDN", "ConvProdDictBPDNJoint",
           "ConvProdDictL1L1Grd", "ConvProdDictL1L1GrdJoint"]


@dataclass(frozen=True)
class PDCSCConfig:
    cri: cr.CSCIndex          # with C = signal channels; R = B columns
    R: int
    variant: str = "l1"       # l1 | joint | l1l1grd | l1l1grdjoint


def _fftaxes(cri):
    return tuple(range(-cri.dimN, 0))


def _dotc(mat, x, axis=1):
    """Matrix product against the channel axis (axis 1)."""
    return sl.dot(mat, x, axis=axis)


def _setup(cfg, params):
    cri = cfg.cri
    axes = _fftaxes(cri)
    B = params["B"]
    Gamma, Q = jnp.linalg.eigh(B.T @ B)
    Gamma = jnp.abs(Gamma)
    Df = sf.rfftn(params["D"], s=cri.Nv, axes=axes)   # (1,1,M,f)
    Sf = sf.rfftn(params["S"], axes=axes)             # (K,C,1,f)
    shpg = (1, cfg.R, 1) + (1,) * cri.dimN
    gDf = jnp.sqrt(Gamma).reshape(shpg) * Df          # (1,R,M,f)
    aux = {"B": B, "Gamma": Gamma, "Q": Q, "Df": Df, "Sf": Sf,
           "gDf": gDf}
    if cfg.variant.startswith("l1l1grd"):
        _, GHGf = gradient_filters(cri.dimN, cri.Nv,
                                   dtype=params["D"].dtype)
        aux["GHGfW"] = params["wgrd"] * GHGf
    else:
        DSf = jnp.conj(Df) * Sf                        # (K,C,M,f)
        aux["DSf"] = DSf
        aux["DSfBQ"] = _dotc((B @ Q).T, DSf)           # (K,R,M,f)
    return aux


# --- plain / joint ---------------------------------------------------------

def _xstep(cfg, aux, params, state):
    cri = cfg.cri
    axes = _fftaxes(cri)
    rho = state.rho
    Zf = sf.rfftn(state.Y - state.U, axes=axes)        # (K,R,M,f)
    ZfQ = _dotc(aux["Q"].T, Zf)
    b = aux["DSfBQ"] + rho * ZfQ
    Xh = sl.solvedbi_sm(aux["gDf"], rho, b, axis=2)
    Xf = _dotc(aux["Q"], Xh)
    X = sf.irfftn(Xf, s=cri.Nv, axes=axes)
    return X, {"Xf": Xf}


def _ystep(cfg, aux, params, state, AXU):
    rho = state.rho
    if cfg.variant == "joint":
        Y = sp.prox_sl1l2(AXU, (params["lmbda"] / rho) * params["wl1"],
                          (params["mu"] / rho) * params["wl21"],
                          axis=1)
    else:
        Y = sp.prox_l1(AXU, (params["lmbda"] / rho) * params["wl1"])
    return Y


def _obfn(cfg, aux, params, state, xaux):
    cri = cfg.cri
    DXf = jnp.sum(aux["Df"] * xaux["Xf"], axis=2, keepdims=True)
    DXBf = _dotc(aux["B"], DXf)
    dfd = 0.5 * sf.rfl2norm2(DXBf - aux["Sf"], cri.Nv,
                             axis=_fftaxes(cri))
    gv = state.X
    rl1 = jnp.sum(jnp.abs(params["wl1"] * gv))
    if cfg.variant == "joint":
        rl21 = jnp.sum(params["wl21"]
                       * jnp.sqrt(jnp.sum(gv ** 2, axis=1)))
        return (dfd + params["lmbda"] * rl1 + params["mu"] * rl21,
                dfd, rl1, rl21)
    return (dfd + params["lmbda"] * rl1, dfd, rl1)


def _yinit(cfg, params):
    cri = cfg.cri
    shp = (cri.K, cfg.R, cri.M) + tuple(cri.Nv)
    return jnp.zeros(shp, params["S"].dtype)


_PD_PROBLEMS = {
    "l1": ADMMProblem(setup=_setup, xstep=_xstep, ystep=_ystep,
                      obfn=_obfn, yinit=_yinit, uinit=_yinit,
                      stat_names=("ObjFun", "DFid", "RegL1")),
    "joint": ADMMProblem(setup=_setup, xstep=_xstep, ystep=_ystep,
                         obfn=_obfn, yinit=_yinit, uinit=_yinit,
                         stat_names=("ObjFun", "DFid", "RegL1",
                                     "RegL21")),
}


# --- l1 fidelity + gradient (masked) two-block variants --------------------
# blocks: y0 = D X B^T - S (signal shaped), y1 = X

def _g_xstep(cfg, aux, params, state):
    cri = cfg.cri
    axes = _fftaxes(cri)
    rho = state.rho
    Y0, Y1 = state.Y
    U0, U1 = state.U
    Z0f = sf.rfftn(Y0 - U0 + params["S"], axes=axes)   # (K,C,1,f)
    Z1f = sf.rfftn(Y1 - U1, axes=axes)                 # (K,R,M,f)
    DZ0f = jnp.conj(aux["Df"]) * Z0f                   # (K,C,M,f)
    DZ0fBQ = _dotc((aux["B"] @ aux["Q"]).T, DZ0f)      # (K,R,M,f)
    Z1fQ = _dotc(aux["Q"].T, Z1f)
    b = DZ0fBQ + Z1fQ
    d = (params["mu"] / rho) * aux["GHGfW"] + 1.0
    Xh = sl.solvedbd_sm(aux["gDf"], d, b, axis=2)
    Xf = _dotc(aux["Q"], Xh)
    X = sf.irfftn(Xf, s=cri.Nv, axes=axes)
    DXf = jnp.sum(aux["Df"] * Xf, axis=2, keepdims=True)
    DXB = sf.irfftn(_dotc(aux["B"], DXf), s=cri.Nv, axes=axes)
    return (X, DXB), {"Xf": Xf}


def _g_cnst_a(cfg, aux, params, XD):
    X, DXB = XD
    return (DXB, X)


def _g_cnst_at(cfg, aux, params, V):
    cri = cfg.cri
    axes = _fftaxes(cri)
    V0, V1 = V
    V0f = sf.rfftn(V0, axes=axes)
    At = _dotc(aux["B"].T, jnp.conj(aux["Df"]) * V0f)
    return sf.irfftn(At, s=cri.Nv, axes=axes) + V1


def _g_cnst_b(cfg, aux, params, Y):
    return jax.tree_util.tree_map(jnp.negative, Y)


def _g_cnst_c(cfg, aux, params):
    return (params["S"], 0.0 * params["S"][:, :1, :1])


def _g_ystep(cfg, aux, params, state, AXU):
    rho = state.rho
    A0, A1 = AXU
    Y0 = sp.prox_l1(A0 - params["S"], params["W"] / rho)
    if cfg.variant == "l1l1grdjoint":
        Y1 = sp.prox_sl1l2(A1, (params["lmbda"] / rho) * params["wl1"],
                           (params["mu2"] / rho) * params["wl21"],
                           axis=1)
    else:
        Y1 = sp.prox_l1(A1, (params["lmbda"] / rho) * params["wl1"])
    return (Y0, Y1)


def _g_obfn(cfg, aux, params, state, xaux):
    cri = cfg.cri
    X, DXB = state.X
    err = DXB - params["S"]
    dfd = jnp.sum(jnp.abs(params["W"] * err))
    rl1 = jnp.sum(jnp.abs(params["wl1"] * X))
    rgr = 0.5 * sf.rfl2norm2(jnp.sqrt(aux["GHGfW"]) * xaux["Xf"],
                             cri.Nv, axis=_fftaxes(cri))
    if cfg.variant == "l1l1grdjoint":
        rl21 = jnp.sum(params["wl21"]
                       * jnp.sqrt(jnp.sum(X ** 2, axis=1)))
        return (dfd + params["lmbda"] * rl1 + params["mu"] * rgr
                + params["mu2"] * rl21, dfd, rl1, rgr, rl21)
    return (dfd + params["lmbda"] * rl1 + params["mu"] * rgr,
            dfd, rl1, rgr)


def _g_rsdl_s(cfg, aux, params, state, Yprev):
    return state.rho * _g_cnst_at(cfg, aux, params, state.U)


def _g_rsdl_sn(cfg, aux, params, state):
    return state.rho * tree_norm(state.U)


def _g_yinit(cfg, params):
    cri = cfg.cri
    return (jnp.zeros_like(params["S"]),
            jnp.zeros((cri.K, cfg.R, cri.M) + tuple(cri.Nv),
                      params["S"].dtype))


def _g_xinit(cfg, params):
    cri = cfg.cri
    return (jnp.zeros((cri.K, cfg.R, cri.M) + tuple(cri.Nv),
                      params["S"].dtype),
            jnp.zeros_like(params["S"]))


_PDG_PROBLEMS = {
    v: ADMMProblem(setup=_setup, xstep=_g_xstep, ystep=_g_ystep,
                   obfn=_g_obfn, cnst_a=_g_cnst_a, cnst_at=_g_cnst_at,
                   cnst_b=_g_cnst_b, cnst_c=_g_cnst_c,
                   rsdl_s=_g_rsdl_s, rsdl_sn=_g_rsdl_sn,
                   yinit=_g_yinit, uinit=_g_yinit, xinit=_g_xinit,
                   stat_names=names)
    for v, names in [
        ("l1l1grd", ("ObjFun", "DFid", "RegL1", "RegGrad")),
        ("l1l1grdjoint", ("ObjFun", "DFid", "RegL1", "RegGrad",
                          "RegL21"))]
}


def _pd_l1_weight(wl1, dimN, dtype):
    """Translate an l1 weight array to the product-dict internal
    layout ``(K, R, M, n0, n1)``: scalars pass through; per-filter
    vectors and reference-layout arrays with a trailing filter axis
    (``sporco/cnvrep.py:492``, e.g. ``(1, 1, 1, 1, M)``) land on the
    M axis."""
    w = jnp.asarray(wl1, dtype)
    if w.ndim > 1 and all(s == 1 for s in w.shape[:-1]):
        w = w.reshape(-1)
    if w.ndim == 1:
        w = w.reshape((1, 1, w.shape[0]) + (1,) * dimN)
    return w


class ConvProdDictBPDN(ADMMModel):
    r"""CSC with a product dictionary:
    ``argmin_X (1/2)||D X B^T - S||^2 + lmbda ||X||_1``
    (``sporco/admm/pdcsc.py:28``).  ``D`` is a single-channel
    convolutional dictionary, ``B`` (C x R) a standard dictionary on
    the channel axis."""

    # reference pdcsc option keys (ConvBPDN tree, sporco/admm/pdcsc.py)
    REF_OPT_EXTRA = {
        **refopts._ADMM_EQUAL,
        "AuxVarObj": refopts.IGNORE,
        "HighMemSolve": refopts.IGNORE,
        "LinSolveCheck": refopts.WARN,
        "NonNegCoef": refopts.WARN,
        "NoBndryCross": refopts.WARN,
        "L1Weight": ("k", "wl1"),
    }

    VARIANT = "l1"

    @staticmethod
    def options(**kw):
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=True, period=1,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, D, B, S, lmbda, opt=None, dimK=None, dimN=2,
                 wl1=1.0, mu=0.0, wl21=1.0, dtype=jnp.float32,
                 Y0=None, U0=None):
        super().__init__()
        if opt is None:
            opt = self.options()
        D = jnp.asarray(D, dtype)
        B = jnp.asarray(B, dtype)
        S = jnp.asarray(S, dtype)
        cri = cr.csc_index(D.shape, S.shape, dimK=dimK, dimN=dimN)
        if cri.Cd > 1:
            raise ValueError("Only single-channel convolutional "
                             "dictionaries are supported")
        self.cri = cri
        self.R = B.shape[1]
        Di = cr.to_internal_D(D, cri)
        Si = cr.to_internal_S(S, cri)
        self.lmbda = lmbda
        self.cfg = PDCSCConfig(cri=cri, R=self.R, variant=self.VARIANT)
        self.opts = opt.replace(dtype=dtype)
        self.params = {"D": Di, "B": B, "S": Si,
                       "lmbda": jnp.asarray(lmbda, dtype),
                       "mu": jnp.asarray(mu, dtype),
                       "wl1": _pd_l1_weight(wl1, dimN, dtype),
                       "wl21": jnp.asarray(wl21, dtype)}
        self.problem = _PD_PROBLEMS[self.VARIANT]
        rho0 = opt.rho if opt.rho is not None else 50.0 * lmbda + 1.0
        rho_xi = (opt.auto_rho.rsdl_target
                  if opt.auto_rho.rsdl_target is not None
                  else default_rho_xi(lmbda))
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, rho_xi, Y0=Y0, U0=U0)
        self._init_done()

    def _xcri(self):
        cri = self.cri
        return cr.CSCIndex(dimN=cri.dimN, dimC=1, dimK=cri.dimK,
                           dimCd=cri.dimCd, C=self.R, Cd=cri.Cd,
                           Cx=self.R, K=cri.K, M=cri.M, Nv=cri.Nv,
                           dsz=cri.dsz)

    def getmin(self):
        return cr.from_internal_X(self.state.Y, self._xcri())

    def getcoef(self):
        return self.getmin()

    def reconstruct(self, X=None):
        Xi = self.state.Y if X is None \
            else cr.to_internal_X(jnp.asarray(X), self._xcri())
        return np.asarray(_pd_reconstruct(self.params["D"],
                                          self.params["B"], Xi,
                                          jnp.zeros(self.cri.Nv)))


@jax.jit
def _pd_reconstruct(D, B, X, Nv_dummy):
    axes = tuple(range(-(Nv_dummy.ndim), 0))
    Df = sf.rfftn(D, s=Nv_dummy.shape, axes=axes)
    Xf = sf.rfftn(X, axes=axes)
    DXf = jnp.sum(Df * Xf, axis=2, keepdims=True)
    return sf.irfftn(_dotc(B, DXf), s=Nv_dummy.shape, axes=axes)


class ConvProdDictBPDNJoint(ConvProdDictBPDN):
    r"""Product-dictionary CSC with joint sparsity over the B-basis
    axis (``sporco/admm/pdcsc.py:198``)."""

    REF_OPT_EXTRA = {"L21Weight": ("k", "wl21")}
    VARIANT = "joint"

    def __init__(self, D, B, S, lmbda, mu=0.0, opt=None, **kw):
        super().__init__(D, B, S, lmbda, mu=mu, opt=opt, **kw)


class ConvProdDictL1L1Grd(ConvProdDictBPDN):
    r"""Product-dictionary CSC with l1 fidelity and gradient penalty,
    optional mask (``sporco/admm/pdcsc.py:293``)."""

    REF_OPT_EXTRA = {"GradWeight": ("k", "wgrd")}
    VARIANT = "l1l1grd"

    @staticmethod
    def options(**kw):
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=False))
        base = dict(relax_param=1.8, auto_rho=ar, rho=1.0)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, D, B, S, lmbda, mu=0.0, W=None, opt=None,
                 dimK=0, dimN=2, wl1=1.0, wl21=1.0, mu2=0.0, wgrd=1.0,
                 dtype=jnp.float32, Y0=None, U0=None):
        ADMMModel.__init__(self)
        if opt is None:
            opt = self.options()
        D = jnp.asarray(D, dtype)
        B = jnp.asarray(B, dtype)
        S = jnp.asarray(S, dtype)
        # infer dims from the B-transformed signal like the reference
        # (pdcsc.py: SB = B^T S)
        scidx = -2 if dimK == 1 else -1
        SB = sl.dot(B.T, S, axis=scidx % S.ndim)
        cri = cr.csc_index(D.shape, SB.shape, dimK=dimK, dimN=dimN)
        if cri.Cd > 1:
            raise ValueError("Only single-channel convolutional "
                             "dictionaries are supported")
        self.cri = cr.CSCIndex(dimN=cri.dimN, dimC=cri.dimC,
                               dimK=cri.dimK, dimCd=cri.dimCd,
                               C=S.shape[scidx % S.ndim], Cd=cri.Cd,
                               Cx=cri.Cx, K=cri.K, M=cri.M, Nv=cri.Nv,
                               dsz=cri.dsz)
        cri = self.cri
        self.R = B.shape[1]
        Di = cr.to_internal_D(D, cri)
        Si = cr.to_internal_S(S, cri)
        if W is None:
            W = jnp.ones((1,) * (3 + dimN), dtype)
        else:
            W = cr.fidelity_mask(jnp.asarray(W, dtype), cri)
        self.lmbda = lmbda
        self.cfg = PDCSCConfig(cri=cri, R=self.R, variant=self.VARIANT)
        self.opts = opt.replace(dtype=dtype)
        wgrda = jnp.asarray(wgrd, dtype)
        if wgrda.ndim == 1:
            wgrda = wgrda.reshape((1, 1, wgrda.shape[0]) + (1,) * dimN)
        self.params = {"D": Di, "B": B, "S": Si, "W": W,
                       "lmbda": jnp.asarray(lmbda, dtype),
                       "mu": jnp.asarray(mu, dtype),
                       "mu2": jnp.asarray(mu2, dtype),
                       "wl1": _pd_l1_weight(wl1, dimN, dtype),
                       "wl21": jnp.asarray(wl21, dtype),
                       "wgrd": wgrda}
        self.problem = _PDG_PROBLEMS[self.VARIANT]
        rho0 = opt.rho if opt.rho is not None else 1.0
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, 1.0, Y0=Y0, U0=U0)
        self._init_done()

    def getmin(self):
        return cr.from_internal_X(self.state.Y[1], self._xcri())

    def reconstruct(self, X=None):
        if X is None:
            return np.asarray(self.state.X[1])
        Xi = cr.to_internal_X(jnp.asarray(X), self._xcri())
        return np.asarray(_pd_reconstruct(self.params["D"],
                                          self.params["B"], Xi,
                                          jnp.zeros(self.cri.Nv)))


class ConvProdDictL1L1GrdJoint(ConvProdDictL1L1Grd):
    r"""Adds joint sparsity over the B-basis axis
    (``sporco/admm/pdcsc.py:584``)."""
    VARIANT = "l1l1grdjoint"

    def __init__(self, D, B, S, lmbda, mu=0.0, mu2=0.0, W=None,
                 opt=None, **kw):
        super().__init__(D, B, S, lmbda, mu=mu, mu2=mu2, W=W, opt=opt,
                         **kw)
