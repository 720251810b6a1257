"""CSC with lateral/self inhibition (music transcription etc.).

Capability parity with ``sporco/admm/cbpdnin.py:28``
(:class:`ConvBPDNInhib`): adds to ConvBPDN evolving weighted-l1 terms
``mu sum_m w_m^T |y_m|`` (lateral inhibition within filter groups) and
``gamma sum_m z_m^T |y_m|`` (self inhibition), where the weights are
windowed convolutions of ``|X|`` recomputed and exponentially smoothed
every iteration (``cbpdnin.py:294-345``).  The smoothed weights are
carried through the jitted loop in the solver state's ``extra`` slot.
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
from sporco_tpu.models.common import ADMMModel, default_rho_xi
from sporco_tpu.models.cbpdn import _max_abs_dhs, _apply_masks, CSCConfig

__all__ = ["ConvBPDNInhib"]


@dataclass(frozen=True)
class InhibConfig:
    cri: cr.CSCIndex
    non_neg: bool = False
    no_bndry: bool = False
    use_lat: bool = True
    use_self: bool = False
    smooth: float = 0.9


def _fftaxes(cri):
    return tuple(range(-cri.dimN, 0))


def _setup(cfg, params):
    cri = cfg.cri
    axes = _fftaxes(cri)
    Df = sf.rfftn(params["D"], s=cri.Nv, axes=axes)
    Sf = sf.rfftn(params["S"], axes=axes)
    DSf = jnp.conj(Df) * Sf
    if cri.Cd > 1:
        DSf = jnp.sum(DSf, axis=1, keepdims=True)
    return {"Df": Df, "Sf": Sf, "DSf": DSf}


def _xstep(cfg, aux, params, state):
    cri = cfg.cri
    axes = _fftaxes(cri)
    rho = state.rho
    b = aux["DSf"] + rho * sf.rfftn(state.Y - state.U, axes=axes)
    if cri.Cd == 1:
        Xf = sl.solvedbi_sm(aux["Df"], rho, b, axis=2)
    else:
        Xf = sl.solvemdbi_ism(aux["Df"], rho, b, axisM=2, axisK=1)
    X = sf.irfftn(Xf, s=cri.Nv, axes=axes)
    return X, {"Xf": Xf}


def _ystep(cfg, aux, params, state, AXU):
    rho = state.rho
    wml, wms = state.extra
    thresh = (params["lmbda"] * params["wl1"] + params["mu"] * wml
              + params["gamma"] * wms) / rho
    Y = sp.prox_l1(AXU, thresh)
    mcfg = CSCConfig(cri=cfg.cri, non_neg=cfg.non_neg,
                     no_bndry=cfg.no_bndry)
    return _apply_masks(mcfg, Y)


def _update_extra(cfg, aux, params, state, xaux):
    """Recompute the smoothed inhibition weights from |X|
    (``sporco/admm/cbpdnin.py:310-340``)."""
    cri = cfg.cri
    axes = _fftaxes(cri)
    wml, wms = state.extra
    Xaf = sf.rfftn(jnp.abs(state.X), axes=axes)
    sm = cfg.smooth
    if cfg.use_lat:
        Whfl = params["Whfl"][0] + 1j * params["Whfl"][1]
        WhXal = sf.irfftn(Whfl * Xaf, s=cri.Nv, axes=axes)
        Wg = params["Wg"]                     # (Ng, M)
        # sum of in-group members' windowed activity, excluding self
        grp = jnp.einsum("kcm...,gm->kcg...", WhXal, Wg)
        wml_new = jnp.einsum("kcg...,gm->kcm...", grp, Wg) \
            - jnp.sum(Wg, axis=0).reshape((1, 1, -1) + (1,) * cri.dimN) \
            * WhXal
        wml = sm * wml + (1 - sm) * wml_new
    if cfg.use_self:
        Whfs = params["Whfs"][0] + 1j * params["Whfs"][1]
        wms_new = sf.irfftn(Whfs * Xaf, s=cri.Nv, axes=axes)
        wms = sm * wms + (1 - sm) * wms_new
    return (wml, wms)


def _obfn(cfg, aux, params, state, xaux):
    cri = cfg.cri
    dfd = 0.5 * sf.rfl2norm2(
        jnp.sum(aux["Df"] * xaux["Xf"], axis=2, keepdims=True)
        - aux["Sf"], cri.Nv, axis=_fftaxes(cri))
    gv = state.X
    wml, wms = state.extra
    rl1 = jnp.sum(jnp.abs(params["wl1"] * gv))
    rlat = jnp.sum(wml * jnp.abs(gv))
    rself = jnp.sum(wms * jnp.abs(gv))
    return (dfd + params["lmbda"] * rl1 + params["mu"] * rlat
            + params["gamma"] * rself, dfd, rl1, rlat, rself)


def _yinit(cfg, params):
    return jnp.zeros(cfg.cri.shpX, params["S"].dtype)


def _extra_init(cfg, params):
    z = jnp.zeros(cfg.cri.shpX, params["S"].dtype)
    return (z, z)


_INHIB = ADMMProblem(setup=_setup, xstep=_xstep, ystep=_ystep,
                     obfn=_obfn, yinit=_yinit, uinit=_yinit,
                     extra_init=_extra_init, update_extra=_update_extra,
                     stat_names=("ObjFun", "DFid", "RegL1", "RegLat",
                                 "RegSelf"))


def _make_window(Nv, dimN, Whn, win_args, dtype):
    """Spatial inhibition window (tukey by default), centred at the
    origin with radius Whn/2, and its zero-centre variant
    (``sporco/admm/cbpdnin.py:150-175``)."""
    from scipy.signal import get_window
    Whn += int(not Whn % 2)
    w1 = np.asarray(get_window(win_args, Whn))
    grids = np.meshgrid(*([w1] * dimN))
    wnd = np.power(np.prod(np.stack(grids, 0), axis=0), 1.0 / dimN)
    Whl = np.zeros(Nv)
    Whl[tuple(slice(0, Whn) for _ in range(dimN))] = wnd
    for i in range(dimN):
        Whl = np.roll(Whl, -Whn // 2 + 1, axis=i)
    Whs = Whl.copy()
    Whs[(0,) * dimN] = 0.0
    # host-side spectra, stored as stacked (real, imag) since complex
    # arrays cannot cross jit boundaries on this TPU runtime
    def spec(w):
        wf = np.fft.rfftn(w, axes=tuple(range(dimN)))
        return jnp.asarray(np.stack([wf.real, wf.imag]), dtype)
    return spec(Whl), spec(Whs)


class ConvBPDNInhib(ADMMModel):
    r"""CSC with lateral and/or self inhibition
    (``sporco/admm/cbpdnin.py:28``).  ``Wg`` is the (Ng, M) group
    matrix; ``Whn`` the inhibition window diameter; ``mu``/``gamma``
    the lateral/self inhibition weights."""

    # reference ConvBPDNInhib option keys (sporco/admm/cbpdnin.py:118)
    REF_OPT_EXTRA = {
        **refopts._ADMM_EQUAL,
        "AuxVarObj": refopts.IGNORE,
        "HighMemSolve": refopts.IGNORE,
        "LinSolveCheck": refopts.WARN,
        "NonNegCoef": ("k", "non_neg"),
        "NoBndryCross": ("k", "no_bndry"),
        "L1Weight": ("k", "wl1"),
        "SmoothWeight": ("k", "smooth"),
    }

    @staticmethod
    def options(**kw):
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=True, period=1,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, D, S, Wg=None, Whn=None, win_args=None,
                 lmbda=None, mu=None, gamma=None, opt=None, dimK=None,
                 dimN=2, wl1=1.0, non_neg=False, no_bndry=False,
                 smooth=0.9, dtype=jnp.float32, Y0=None, U0=None):
        super().__init__()
        if opt is None:
            opt = self.options()
        D = jnp.asarray(D, dtype)
        S = jnp.asarray(S, dtype)
        cri = cr.csc_index(D.shape, S.shape, dimK=dimK, dimN=dimN)
        self.cri = cri
        Di = cr.to_internal_D(D, cri)
        Si = cr.to_internal_S(S, cri)
        if lmbda is None:
            lmbda = 0.1 * float(_max_abs_dhs(Di, Si, jnp.zeros(cri.Nv)))
        if mu is None:
            mu = 10.0 * lmbda
        if gamma is None:
            gamma = 0.0
        self.lmbda = lmbda
        use_lat = Wg is not None and mu != 0
        use_self = gamma != 0
        self.cfg = InhibConfig(cri=cri, non_neg=non_neg,
                               no_bndry=no_bndry, use_lat=use_lat,
                               use_self=use_self, smooth=smooth)
        self.opts = opt.replace(dtype=dtype)
        if Whn is None:
            Whn = D.shape[0]
        if win_args is None:
            win_args = ("tukey", 0.5)
        Whfl, Whfs = _make_window(cri.Nv, dimN, int(Whn), win_args,
                                  dtype)
        wl1a = jnp.asarray(wl1, dtype)
        if wl1a.ndim > 0:
            wl1a = cr.l1_weight(wl1a, cri)
        self.params = {
            "D": Di, "S": Si,
            "lmbda": jnp.asarray(lmbda, dtype),
            "mu": jnp.asarray(mu, dtype),
            "gamma": jnp.asarray(gamma, dtype),
            "wl1": wl1a,
            "Wg": jnp.asarray(Wg, dtype) if Wg is not None
            else jnp.zeros((1, cri.M), dtype),
            "Whfl": Whfl, "Whfs": Whfs,
        }
        self.problem = _INHIB
        rho0 = opt.rho if opt.rho is not None else 50.0 * lmbda + 1.0
        rho_xi = (opt.auto_rho.rsdl_target
                  if opt.auto_rho.rsdl_target is not None
                  else default_rho_xi(lmbda))
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, rho_xi, Y0=Y0, U0=U0)
        self._init_done()

    def getmin(self):
        return cr.from_internal_X(self.state.Y, self.cri)

    def getcoef(self):
        return self.getmin()
