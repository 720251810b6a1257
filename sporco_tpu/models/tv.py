"""Total Variation denoising and deconvolution via ADMM.

Capability parity with ``sporco/admm/tvl2.py`` (:class:`TVL2Denoise`
``:27``, :class:`TVL2Deconv` ``:377``) and ``sporco/admm/tvl1.py``
(:class:`TVL1Denoise` ``:27``, :class:`TVL1Deconv` ``:403``), supporting
N-dimensional TV axes, scalar or vector (joint-channel) TV via ``caxis``,
data-fidelity and TV weight arrays.

TPU notes: the reference's "Gauss-Seidel" x-step
(``sporco/admm/tvl2.py:362``) is in fact a *Jacobi* sweep (every
neighbour read comes from the previous iterate), so it vectorises
exactly; it runs as an inner ``lax.while_loop`` with the same
centre-weight normalisation (``LaplaceCentreWeight``,
``sporco/admm/tvl2.py:350``) and iteration/tolerance controls.  The
deconvolution x-steps are pointwise DFT solves
(``sporco/admm/tvl2.py:594-610``, ``sporco/admm/tvl1.py:629-641``).
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu.ops import fft as sf
from sporco_tpu.ops import linalg as sl
from sporco_tpu.ops import prox as sp
from sporco_tpu.solvers.admm import (ADMMOpts, AutoRhoOpts, ADMMProblem,
                                     init_state, tree_norm)
from sporco_tpu import refopts
from sporco_tpu.models.common import ADMMModel
from sporco_tpu.utils.signal import grad, gradT
from sporco_tpu.utils.array import zpad

__all__ = ["TVL2Denoise", "TVL2Deconv", "TVL1Denoise", "TVL1Deconv"]


@dataclass(frozen=True)
class TVConfig:
    axes: Tuple[int, ...]
    saxes: Tuple[int, ...]        # prox_l2 grouping axes ((-1,) or (caxis,-1))
    sndim: int
    l1_fidelity: bool = False     # TVL1 variants
    deconv: bool = False
    gs_max_iter: int = 2
    gs_tol: float = 0.0
    real: bool = True             # complex-input dispatch
    g_eval_y: bool = True         # reference's gEvalY: evaluate the
                                  # g-term of the objective at Y (True)
                                  # or at A(X)-c (False)


def _sq(v):
    """|v|^2, complex-aware."""
    return jnp.abs(v) ** 2 if jnp.iscomplexobj(v) else v ** 2


def _tv_cnst_a_grad(cfg, X):
    """Stack of non-circular forward differences on a new trailing axis
    (``sporco/admm/tvl2.py:316``)."""
    return jnp.stack([grad(X, ax) for ax in cfg.axes], axis=-1)


def _tv_cnst_at_grad(cfg, V):
    return sum(gradT(V[..., j], ax) for j, ax in enumerate(cfg.axes))


def _lcw(cfg, shape, dtype):
    """Laplacian centre weights (``sporco/admm/tvl2.py:350``): 2*J in
    the interior, reduced by 1 at each boundary face."""
    sz = [1] * cfg.sndim
    for ax in cfg.axes:
        sz[ax] = shape[ax]
    lcw = 2.0 * len(cfg.axes) * np.ones(sz, dtype=np.float64)
    for ax in cfg.axes:
        idx = [slice(None)] * cfg.sndim
        idx_ = tuple(idx[:ax])
        lcw[idx_ + ([0, -1],)] -= 1.0
    return jnp.asarray(lcw, dtype)


def _jacobi_sweeps(cfg, S_eff, X0, ATYU, rho_eff, lcw, W2):
    """The reference's GaussSeidelStep loop (actually Jacobi,
    ``sporco/admm/tvl2.py:245-262,362``) as an inner while_loop with the
    same relative-residual stopping test."""
    def sweep(X):
        Xss = jnp.zeros_like(S_eff)
        for ax in cfg.axes:
            Xss = Xss + zpad(jax.lax.slice_in_dim(X, 0, X.shape[ax] - 1,
                                                  axis=ax), (1, 0), ax)
            Xss = Xss + zpad(jax.lax.slice_in_dim(X, 1, X.shape[ax],
                                                  axis=ax), (0, 1), ax)
        return (rho_eff * (Xss + ATYU) + W2 * S_eff) / \
            (W2 + rho_eff * lcw)

    def resid(X):
        ax_ = rho_eff * _tv_cnst_at_grad(cfg, _tv_cnst_a_grad(cfg, X)) \
            + W2 * X
        return sl.rrs(ax_, W2 * S_eff + rho_eff * ATYU)

    def cond(c):
        X, r, k = c
        return jnp.logical_and(r > cfg.gs_tol, k < cfg.gs_max_iter)

    def body(c):
        X, _, k = c
        Xn = sweep(X)
        return (Xn, resid(Xn), k + 1)

    X, r, k = jax.lax.while_loop(
        cond, body, (X0, jnp.asarray(jnp.inf, X0.real.dtype),
                     jnp.asarray(0, jnp.int32)))
    return X, r, k


# --- TVL2 denoise ----------------------------------------------------------

def _tvl2den_setup(cfg, params):
    return {"lcw": _lcw(cfg, params["S"].shape, params["S"].dtype)}


def _tvl2den_xstep(cfg, aux, params, state):
    ATYU = _tv_cnst_at_grad(cfg, state.Y - state.U)
    W2 = params["Wdf"] ** 2
    X, r, k = _jacobi_sweeps(cfg, params["S"], state.X, ATYU, state.rho,
                             aux["lcw"], W2)
    return X, {"gsit": k, "gsrrs": r}


def _tvl2den_ystep(cfg, aux, params, state, AXU):
    return sp.prox_l2(AXU, (params["lmbda"] / state.rho) * params["Wtvna"],
                      axis=cfg.saxes)


def _tv_cnst_a(cfg, aux, params, X):
    return _tv_cnst_a_grad(cfg, X)


def _tv_cnst_at(cfg, aux, params, V):
    return _tv_cnst_at_grad(cfg, V)


def _tvl2den_obfn(cfg, aux, params, state, xaux):
    dfd = 0.5 * jnp.sum(_sq(params["Wdf"] * (state.X - params["S"])))
    gv = state.Y if cfg.g_eval_y else _tv_cnst_a_grad(cfg, state.X)
    reg = jnp.sum(params["Wtv"]
                  * jnp.sqrt(jnp.sum(_sq(gv), axis=cfg.saxes)))
    return (dfd + params["lmbda"] * reg, dfd, reg,
            xaux["gsit"], xaux["gsrrs"])


def _tvl2den_yinit(cfg, params):
    return jnp.zeros(params["S"].shape + (len(cfg.axes),),
                     params["S"].dtype)


def _tvl2den_xinit(cfg, params):
    return params["S"]


_TVL2DEN = ADMMProblem(
    setup=_tvl2den_setup, xstep=_tvl2den_xstep, ystep=_tvl2den_ystep,
    obfn=_tvl2den_obfn, cnst_a=_tv_cnst_a, cnst_at=_tv_cnst_at,
    yinit=_tvl2den_yinit, uinit=_tvl2den_yinit, xinit=_tvl2den_xinit,
    stat_names=("ObjFun", "DFid", "RegTV", "GSIter", "GSRelRes"))


# --- TVL1 denoise ----------------------------------------------------------

def _tvl1_cnst_a(cfg, aux, params, X):
    """(G_r; G_c; ...; I) x, blocks on trailing axis
    (``sporco/admm/tvl1.py:316``)."""
    return jnp.concatenate([_tv_cnst_a_grad(cfg, X), X[..., None]],
                           axis=-1)


def _tvl1_cnst_at(cfg, aux, params, V):
    return _tv_cnst_at_grad(cfg, V[..., :-1]) + V[..., -1]


def _tvl1_cnst_c(cfg, aux, params):
    S = params["S"]
    c = jnp.zeros(S.shape + (len(cfg.axes) + 1,), S.dtype)
    return c.at[..., -1].set(S)


def _tvl1den_xstep(cfg, aux, params, state):
    YU = state.Y - state.U
    SYU = params["S"] + YU[..., -1]
    ATYU = _tv_cnst_at_grad(cfg, YU[..., :-1])
    X, r, k = _jacobi_sweeps(cfg, SYU, state.X, ATYU, 1.0, aux["lcw"],
                             1.0)
    return X, {"gsit": k, "gsrrs": r}


def _tvl1den_ystep(cfg, aux, params, state, AXU):
    rho = state.rho
    Yg = sp.prox_l2(AXU[..., :-1],
                    (params["lmbda"] / rho) * params["Wtvna"],
                    axis=cfg.saxes)
    Yd = sp.prox_l1(AXU[..., -1] - params["S"],
                    (1.0 / rho) * params["Wdf"])
    return jnp.concatenate([Yg, Yd[..., None]], axis=-1)


def _tvl1den_obfn(cfg, aux, params, state, xaux):
    gv = state.Y if cfg.g_eval_y else \
        (_tvl1_cnst_a(cfg, aux, params, state.X)
         - _tvl1_cnst_c(cfg, aux, params))
    dfd = jnp.sum(jnp.abs(params["Wdf"] * gv[..., -1]))
    reg = jnp.sum(params["Wtv"]
                  * jnp.sqrt(jnp.sum(_sq(gv[..., :-1]), axis=cfg.saxes)))
    return (dfd + params["lmbda"] * reg, dfd, reg,
            xaux["gsit"], xaux["gsrrs"])


def _tvl1_rsdl_s(cfg, aux, params, state, Yprev):
    """Dual-feasibility residual ``rho A^T U``
    (``sporco/admm/tvl1.py:362``)."""
    return state.rho * _tvl1_cnst_at(cfg, aux, params, state.U)


def _tvl1_rsdl_sn(cfg, aux, params, state):
    return state.rho * tree_norm(state.U)


def _tvl1den_yinit(cfg, params):
    return jnp.zeros(params["S"].shape + (len(cfg.axes) + 1,),
                     params["S"].dtype)


_TVL1DEN = ADMMProblem(
    setup=_tvl2den_setup, xstep=_tvl1den_xstep, ystep=_tvl1den_ystep,
    obfn=_tvl1den_obfn, cnst_a=_tvl1_cnst_a, cnst_at=_tvl1_cnst_at,
    cnst_c=_tvl1_cnst_c,
    rsdl_s=_tvl1_rsdl_s, rsdl_sn=_tvl1_rsdl_sn,
    yinit=_tvl1den_yinit, uinit=_tvl1den_yinit, xinit=_tvl2den_xinit,
    stat_names=("ObjFun", "DFid", "RegTV", "GSIter", "GSRelRes"))


# --- deconvolution (DFT-domain x-steps) ------------------------------------

def _tv_freq_filters(cfg, params):
    """DFT-domain kernel + gradient filters with trailing filter index,
    for the specified TV ``axes`` of S."""
    S = params["S"]
    axshp = tuple(S.shape[ax] for ax in cfg.axes)
    A = params["A"]
    fwd = sf.rfftn if cfg.real else sf.fftn
    Af = fwd(A, s=axshp, axes=cfg.axes)
    Sf = fwd(S, s=axshp, axes=cfg.axes)
    # gradient filters per TV axis, stacked trailing
    Gfs = []
    for j, ax in enumerate(cfg.axes):
        g = np.zeros([2 if a == ax else 1 for a in range(cfg.sndim)])
        idx = tuple(slice(None) if a == ax else 0
                    for a in range(cfg.sndim))
        g[idx] = np.array([1.0, -1.0])
        Gfs.append(fwd(jnp.asarray(g, sf.real_dtype(S.dtype)), s=axshp,
                       axes=cfg.axes))
    Gf = jnp.stack(Gfs, axis=-1)
    GHGf = jnp.sum((jnp.conj(Gf) * Gf).real, axis=-1)
    return {"Af": Af, "Sf": Sf, "AHAf": (jnp.conj(Af) * Af).real,
            "AHSf": jnp.conj(Af) * Sf, "Gf": Gf, "GHGf": GHGf,
            "axshp": None}


def _axshp(cfg, params):
    return tuple(params["S"].shape[ax] for ax in cfg.axes)


def _tvl2dcn_setup(cfg, params):
    return _tv_freq_filters(cfg, params)


def _dcn_fwd(cfg, x, axes):
    return sf.rfftn(x, axes=axes) if cfg.real else sf.fftn(x, axes=axes)


def _dcn_inv(cfg, xf, s_, axes):
    if cfg.real:
        return sf.irfftn(xf, s=s_, axes=axes)
    return sf.ifftn(xf, s=s_, axes=axes)


def _tvl2dcn_xstep(cfg, aux, params, state):
    rho = state.rho
    YUf = _dcn_fwd(cfg, state.Y - state.U, cfg.axes)
    b = aux["AHSf"] + rho * jnp.sum(jnp.conj(aux["Gf"]) * YUf, axis=-1)
    Xf = b / (aux["AHAf"] + rho * aux["GHGf"])
    X = _dcn_inv(cfg, Xf, _axshp(cfg, params), cfg.axes)
    xrrs = sl.rrs((aux["AHAf"] + rho * aux["GHGf"]) * Xf, b)
    return X, {"Xf": Xf, "xrrs": xrrs}


def _tvdcn_cnst_a(cfg, aux, params, X):
    """Circular gradients via the DFT filters."""
    Xf = _dcn_fwd(cfg, X, cfg.axes)
    return _dcn_inv(cfg, aux["Gf"] * Xf[..., None],
                    _axshp(cfg, params), cfg.axes)


def _tvdcn_cnst_at(cfg, aux, params, V):
    Vf = _dcn_fwd(cfg, V, cfg.axes)
    return _dcn_inv(cfg, jnp.sum(jnp.conj(aux["Gf"]) * Vf, axis=-1),
                    _axshp(cfg, params), cfg.axes)


def _tvl2dcn_obfn(cfg, aux, params, state, xaux):
    if cfg.real:
        dfd = 0.5 * sf.rfl2norm2(aux["Af"] * xaux["Xf"] - aux["Sf"],
                                 _axshp(cfg, params), axis=cfg.axes)
    else:
        dfd = 0.5 * sf.fl2norm2(aux["Af"] * xaux["Xf"] - aux["Sf"],
                                axis=cfg.axes)
    gv = state.Y if cfg.g_eval_y else \
        _tvdcn_cnst_a(cfg, aux, params, state.X)
    reg = jnp.sum(params["Wtv"]
                  * jnp.sqrt(jnp.sum(_sq(gv), axis=cfg.saxes)))
    return (dfd + params["lmbda"] * reg, dfd, reg, xaux["xrrs"])


_TVL2DCN = ADMMProblem(
    setup=_tvl2dcn_setup, xstep=_tvl2dcn_xstep, ystep=_tvl2den_ystep,
    obfn=_tvl2dcn_obfn, cnst_a=_tvdcn_cnst_a, cnst_at=_tvdcn_cnst_at,
    yinit=_tvl2den_yinit, uinit=_tvl2den_yinit, xinit=_tvl2den_xinit,
    stat_names=("ObjFun", "DFid", "RegTV", "XSlvRelRes"))


def _tvl1dcn_cnst_a(cfg, aux, params, X):
    """(G; H) x with the convolution block trailing
    (``sporco/admm/tvl1.py:700``)."""
    Xf = _dcn_fwd(cfg, X, cfg.axes)
    GAf = jnp.concatenate([aux["Gf"], aux["Af"][..., None]], axis=-1)
    return _dcn_inv(cfg, GAf * Xf[..., None], _axshp(cfg, params),
                    cfg.axes)


def _tvl1dcn_cnst_at(cfg, aux, params, V):
    Vf = _dcn_fwd(cfg, V, cfg.axes)
    GAf = jnp.concatenate([aux["Gf"], aux["Af"][..., None]], axis=-1)
    return _dcn_inv(cfg, jnp.sum(jnp.conj(GAf) * Vf, axis=-1),
                    _axshp(cfg, params), cfg.axes)


def _tvl1dcn_xstep(cfg, aux, params, state):
    YUf = _dcn_fwd(cfg, state.Y - state.U, cfg.axes)
    GAf = jnp.concatenate([aux["Gf"], aux["Af"][..., None]], axis=-1)
    b = aux["AHSf"] + jnp.sum(jnp.conj(GAf) * YUf, axis=-1)
    Xf = b / (aux["AHAf"] + aux["GHGf"])
    X = _dcn_inv(cfg, Xf, _axshp(cfg, params), cfg.axes)
    xrrs = sl.rrs((aux["AHAf"] + aux["GHGf"]) * Xf, b)
    return X, {"Xf": Xf, "xrrs": xrrs}


def _tvl1dcn_ystep(cfg, aux, params, state, AXU):
    return _tvl1den_ystep(cfg, aux, params, state, AXU)


def _tvl1dcn_obfn(cfg, aux, params, state, xaux):
    gv = state.Y if cfg.g_eval_y else \
        (_tvl1dcn_cnst_a(cfg, aux, params, state.X)
         - _tvl1_cnst_c(cfg, aux, params))
    dfd = jnp.sum(jnp.abs(params["Wdf"] * gv[..., -1]))
    reg = jnp.sum(params["Wtv"]
                  * jnp.sqrt(jnp.sum(_sq(gv[..., :-1]), axis=cfg.saxes)))
    return (dfd + params["lmbda"] * reg, dfd, reg, xaux["xrrs"])


def _tvl1dcn_rsdl_s(cfg, aux, params, state, Yprev):
    return state.rho * _tvl1dcn_cnst_at(cfg, aux, params, state.U)


_TVL1DCN = ADMMProblem(
    setup=_tvl2dcn_setup, xstep=_tvl1dcn_xstep, ystep=_tvl1dcn_ystep,
    obfn=_tvl1dcn_obfn, cnst_a=_tvl1dcn_cnst_a, cnst_at=_tvl1dcn_cnst_at,
    cnst_c=_tvl1_cnst_c,
    rsdl_s=_tvl1dcn_rsdl_s, rsdl_sn=_tvl1_rsdl_sn,
    yinit=_tvl1den_yinit, uinit=_tvl1den_yinit, xinit=_tvl2den_xinit,
    stat_names=("ObjFun", "DFid", "RegTV", "XSlvRelRes"))


# --- model classes ---------------------------------------------------------

class _TVBase(ADMMModel):
    # reference TVL1/TVL2 option keys (sporco/admm/tvl2.py:101-125)
    REF_OPT_EXTRA = {
        "gEvalY": ("k", "g_eval_y"),
        "fEvalX": refopts.IGNORE,
        "DFidWeight": ("k", "Wdf"),
        "TVWeight": ("k", "Wtv"),
    }

    def getmin(self):
        return self.state.X

    def getitstat(self):
        return super().getitstat()


class TVL2Denoise(_TVBase):
    r"""l2-TV denoising: ``argmin_x (1/2)||W_df (x - s)||_2^2 +
    lmbda || W_tv sqrt(sum_i (G_i x)^2) ||_1``
    (``sporco/admm/tvl2.py:27``).  ``axes`` selects the TV axes;
    ``caxis`` enables vector TV over a channel axis."""

    REF_OPT_EXTRA = {
        "GSTol": ("k", "gs_tol"),
        "MaxGSIter": ("k", "gs_max_iter"),
    }

    PROBLEM = _TVL2DEN
    L1_FID = False

    @staticmethod
    def options(**kw):
        # reference defaults: RelaxParam 1.8, AutoRho disabled,
        # rho = 2 lmbda + 0.1 (sporco/admm/tvl2.py:117-124,202)
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=False, period=1,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, S, lmbda, opt=None, axes=(0, 1), caxis=None,
                 Wdf=1.0, Wtv=1.0, gs_max_iter=2, gs_tol=0.0,
                 dtype=jnp.float32, Y0=None, U0=None, g_eval_y=True):
        super().__init__()
        if opt is None:
            opt = self.options()
        real = not jnp.iscomplexobj(jnp.asarray(S))
        if not real:
            dtype = sf.complex_dtype(dtype)
        S = jnp.asarray(S, dtype)
        saxes = (-1,) if caxis is None else (caxis, -1)
        self.cfg = TVConfig(axes=tuple(axes), saxes=saxes, sndim=S.ndim,
                            l1_fidelity=self.L1_FID, real=real,
                            gs_max_iter=gs_max_iter, gs_tol=gs_tol,
                            g_eval_y=g_eval_y)
        self.opts = opt.replace(dtype=dtype)
        rdt = sf.real_dtype(dtype)
        Wtv_ = jnp.asarray(Wtv, rdt)
        Wtvna = Wtv_[..., None] if Wtv_.ndim == S.ndim else Wtv_
        self.params = {
            "S": S,
            "lmbda": jnp.asarray(lmbda, rdt),
            "Wdf": jnp.asarray(Wdf, rdt),
            "Wtv": Wtv_, "Wtvna": Wtvna,
        }
        self.lmbda = lmbda
        self.problem = self.PROBLEM
        rho0 = opt.rho if opt.rho is not None else 2.0 * lmbda + 0.1
        rho_xi = (opt.auto_rho.rsdl_target
                  if opt.auto_rho.rsdl_target is not None else 1.0)
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, rho_xi, Y0=Y0, U0=U0)
        self._init_done()


class TVL1Denoise(TVL2Denoise):
    r"""l1-TV denoising: ``argmin_x ||W_df (x - s)||_1 +
    lmbda || W_tv sqrt(sum_i (G_i x)^2) ||_1``
    (``sporco/admm/tvl1.py:27``)."""

    PROBLEM = _TVL1DEN
    L1_FID = True

    @staticmethod
    def options(**kw):
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=False, period=1,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, S, lmbda, opt=None, **kw):
        super().__init__(S, lmbda, opt=opt, **kw)


class TVL2Deconv(_TVBase):
    r"""l2-TV deconvolution: ``argmin_x (1/2)||H x - s||_2^2 +
    lmbda || W_tv sqrt(sum_i (G_i x)^2) ||_1`` with circular
    convolution operator ``H`` given by kernel ``A``
    (``sporco/admm/tvl2.py:377``)."""

    REF_OPT_EXTRA = {"LinSolveCheck": refopts.WARN}

    PROBLEM = _TVL2DCN

    @staticmethod
    def options(**kw):
        # reference defaults: AutoRho enabled, Period 1, AutoScaling
        # (sporco/admm/tvl2.py:465-470)
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=True, period=1,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2,
                                            rsdl_target=1.0))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, A, S, lmbda, opt=None, axes=(0, 1), caxis=None,
                 Wdf=1.0, Wtv=1.0, dtype=jnp.float32, Y0=None, U0=None,
                 g_eval_y=True):
        ADMMModel.__init__(self)
        if opt is None:
            opt = self.options()
        real = not (jnp.iscomplexobj(jnp.asarray(S))
                    or jnp.iscomplexobj(jnp.asarray(A)))
        if not real:
            dtype = sf.complex_dtype(dtype)
        S = jnp.asarray(S, dtype)
        A = jnp.asarray(A, dtype)
        if A.ndim < S.ndim:
            A = A.reshape(A.shape + (1,) * (S.ndim - A.ndim))
        saxes = (-1,) if caxis is None else (caxis, -1)
        self.cfg = TVConfig(axes=tuple(axes), saxes=saxes, sndim=S.ndim,
                            deconv=True, real=real, g_eval_y=g_eval_y)
        self.opts = opt.replace(dtype=dtype)
        rdt = sf.real_dtype(dtype)
        Wtv_ = jnp.asarray(Wtv, rdt)
        Wtvna = Wtv_[..., None] if Wtv_.ndim == S.ndim else Wtv_
        self.params = {
            "S": S, "A": A,
            "lmbda": jnp.asarray(lmbda, rdt),
            "Wdf": jnp.asarray(Wdf, rdt),
            "Wtv": Wtv_, "Wtvna": Wtvna,
        }
        self.lmbda = lmbda
        self.problem = self.PROBLEM
        rho0 = opt.rho if opt.rho is not None else 2.0 * lmbda + 0.1
        rho_xi = (opt.auto_rho.rsdl_target
                  if opt.auto_rho.rsdl_target is not None else 1.0)
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, rho_xi, Y0=Y0, U0=U0)
        self._init_done()


class TVL1Deconv(TVL2Deconv):
    r"""l1-TV deconvolution (``sporco/admm/tvl1.py:403``)."""

    PROBLEM = _TVL1DCN

    @staticmethod
    def options(**kw):
        # reference defaults: AutoRho disabled (sporco/admm/tvl1.py:498)
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=False, period=1,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)
