"""PGM (FISTA) problem classes.

Capability parity with ``sporco/pgm/``: :class:`BPDN` /
:class:`WeightedBPDN` (``pgm/bpdn.py:26,248``), :class:`ConvBPDN` /
:class:`ConvBPDNMask` (``pgm/cbpdn.py:29,387``), :class:`CnstrMOD` /
:class:`WeightedCnstrMOD` (``pgm/cmod.py:24,238``),
:class:`ConvCnstrMOD` / :class:`ConvCnstrMODMask`
(``pgm/ccmod.py:28,408``).

The reference keeps convolutional state in the DFT domain (``PGMDFT``);
here state is spatial (real at jit boundaries) and each ``grad_f``
internally round-trips through the DFT -- the same two transforms per
iteration (see :mod:`sporco_tpu.solvers.pgm`).
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu import cnvrep as cr
from sporco_tpu.ops import fft as sf
from sporco_tpu.ops import prox as sp
from sporco_tpu.solvers.pgm import PGMOpts, PGMProblem, pgm_init_state
from sporco_tpu import refopts
from sporco_tpu.models.common import PGMModel
from sporco_tpu.models.cbpdn import (_max_abs_dhs, _reconstruct_jit,
                                     _internal_S_to_user, _apply_masks,
                                     CSCConfig)

__all__ = ["BPDN", "WeightedBPDN", "ConvBPDN", "ConvBPDNMask",
           "CnstrMOD", "WeightedCnstrMOD", "ConvCnstrMOD",
           "ConvCnstrMODMask"]


# ---------------------------------------------------------------------------
# BPDN (dense): argmin_x (1/2)||Dx - s||_2^2 + lmbda||x||_1

@dataclass(frozen=True)
class PGMBPDNConfig:
    non_neg: bool = False
    weighted: bool = False


def _bp_setup(cfg, params):
    return {}


def _bp_grad(cfg, aux, params, Y):
    D = params["D"]
    R = D @ Y - params["S"]
    if cfg.weighted:
        R = params["W"] * R
    return D.T @ R


def _bp_prox(cfg, aux, params, V, L):
    U = sp.prox_l1(V, (params["lmbda"] / L) * params["wl1"])
    if cfg.non_neg:
        U = jnp.maximum(U, 0.0)
    return U


def _bp_f(cfg, aux, params, X):
    R = params["D"] @ X - params["S"]
    if cfg.weighted:
        return 0.5 * jnp.sum(params["W"] * R ** 2)
    return 0.5 * jnp.sum(R ** 2)


def _bp_g(cfg, aux, params, X):
    return params["lmbda"] * jnp.sum(jnp.abs(params["wl1"] * X))


def _bp_hess(cfg, aux, params, V):
    D = params["D"]
    if cfg.weighted:
        return D.T @ (params["W"] * (D @ V))
    return D.T @ (D @ V)


def _bp_xinit(cfg, params):
    return jnp.zeros((params["D"].shape[1], params["S"].shape[1]),
                     params["S"].dtype)


def _bp_obfn(cfg, aux, params, X):
    # RegL1 reported unscaled, as the reference does
    # (sporco/pgm/bpdn.py:214-220)
    f = _bp_f(cfg, aux, params, X)
    reg = jnp.sum(jnp.abs(params["wl1"] * X))
    return (f + params["lmbda"] * reg, f, reg)


_BPDN_PGM = PGMProblem(setup=_bp_setup, grad_f=_bp_grad, prox_g=_bp_prox,
                       obfn_f=_bp_f, obfn_g=_bp_g, hessian_f=_bp_hess,
                       xinit=_bp_xinit, obfn=_bp_obfn,
                       stat_names=("ObjFun", "DFid", "RegL1"))


class BPDN(PGMModel):
    r"""PGM/FISTA solver for BPDN (``sporco/pgm/bpdn.py:26``); default
    ``L = 500`` (``sporco/pgm/bpdn.py:88``)."""

    # reference pgm.BPDN option keys (sporco/pgm/bpdn.py:87-88)
    REF_OPT_EXTRA = {
        "NonNegCoef": ("k", "non_neg"),
        "L1Weight": ("k", "wl1"),
    }

    WEIGHTED = False

    @staticmethod
    def options(**kw):
        return PGMOpts(**kw)

    def __init__(self, D, S, lmbda=None, opt=None, wl1=1.0, W=None,
                 non_neg=False, dtype=jnp.float32):
        super().__init__()
        if opt is None:
            opt = self.options()
        D = jnp.asarray(D, dtype)
        S = jnp.asarray(S, dtype)
        if S.ndim == 1:
            S = S[:, None]
        if lmbda is None:
            lmbda = 0.1 * float(jnp.max(jnp.abs(D.T @ S)))
        self.lmbda = lmbda
        self.cfg = PGMBPDNConfig(non_neg=non_neg, weighted=self.WEIGHTED)
        self.opts = opt.replace(dtype=dtype)
        Wa = jnp.asarray(1.0 if W is None else W, dtype)
        if Wa.ndim == 1:
            Wa = Wa[:, None]
        self.params = {"D": D, "S": S,
                       "lmbda": jnp.asarray(lmbda, dtype),
                       "wl1": jnp.asarray(wl1, dtype), "W": Wa}
        self.problem = _BPDN_PGM
        L0 = opt.L if opt.L is not None else 500.0
        self.state = pgm_init_state(self.problem, self.cfg, self.params,
                                    self.opts, L0)
        self._init_done()

    def getcoef(self):
        return self.state.X

    def reconstruct(self, X=None):
        if X is None:
            X = self.state.X
        return self.params["D"] @ X


class WeightedBPDN(BPDN):
    r"""BPDN with weighted-l2 data fidelity
    (``sporco/pgm/bpdn.py:248``)."""
    WEIGHTED = True

    def __init__(self, D, S, lmbda=None, W=None, opt=None, **kw):
        super().__init__(D, S, lmbda=lmbda, W=W, opt=opt, **kw)


# ---------------------------------------------------------------------------
# Convolutional BPDN via PGM

def _pcb_setup(cfg, params):
    cri = cfg.cri
    axes = tuple(range(-cri.dimN, 0))
    Df = sf.rfftn(params["D"], s=cri.Nv, axes=axes)
    Sf = sf.rfftn(params["S"], axes=axes)
    return {"Df": Df, "Sf": Sf}


def _pcb_Rf(cfg, aux, Vf):
    return jnp.sum(aux["Df"] * Vf, axis=2, keepdims=True) - aux["Sf"]


def _pcb_grad(cfg, aux, params, Y):
    cri = cfg.cri
    axes = tuple(range(-cri.dimN, 0))
    Yf = sf.rfftn(Y, axes=axes)
    Ryf = _pcb_Rf(cfg, aux, Yf)
    if cfg.masked:
        Ry = sf.irfftn(Ryf, s=cri.Nv, axes=axes)
        Ryf = sf.rfftn(params["W"] ** 2 * Ry, axes=axes)
    gradf = jnp.conj(aux["Df"]) * Ryf
    if cri.Cd > 1:
        gradf = jnp.sum(gradf, axis=1, keepdims=True)
    return sf.irfftn(gradf, s=cri.Nv, axes=axes)


def _pcb_prox(cfg, aux, params, V, L):
    U = sp.prox_l1(V, (params["lmbda"] / L) * params["wl1"])
    mcfg = CSCConfig(cri=cfg.cri, non_neg=cfg.non_neg,
                     no_bndry=cfg.no_bndry)
    return _apply_masks(mcfg, U)


def _pcb_f(cfg, aux, params, X):
    cri = cfg.cri
    axes = tuple(range(-cri.dimN, 0))
    Xf = sf.rfftn(X, axes=axes)
    Rf = _pcb_Rf(cfg, aux, Xf)
    if cfg.masked:
        R = sf.irfftn(Rf, s=cri.Nv, axes=axes)
        return 0.5 * jnp.sum((params["W"] * R) ** 2)
    return 0.5 * sf.rfl2norm2(Rf, cri.Nv, axis=axes)


def _pcb_g(cfg, aux, params, X):
    return params["lmbda"] * jnp.sum(jnp.abs(params["wl1"] * X))


def _pcb_obfn(cfg, aux, params, X):
    # RegL1 reported unscaled (sporco/pgm/cbpdn.py:355-366)
    f = _pcb_f(cfg, aux, params, X)
    reg = jnp.sum(jnp.abs(params["wl1"] * X))
    return (f + params["lmbda"] * reg, f, reg)


def _pcb_hess(cfg, aux, params, V):
    cri = cfg.cri
    axes = tuple(range(-cri.dimN, 0))
    Vf = sf.rfftn(V, axes=axes)
    h = jnp.conj(aux["Df"]) * jnp.sum(aux["Df"] * Vf, axis=2,
                                      keepdims=True)
    if cri.Cd > 1:
        h = jnp.sum(h, axis=1, keepdims=True)
    return sf.irfftn(h, s=cri.Nv, axes=axes)


def _pcb_xinit(cfg, params):
    return jnp.zeros(cfg.cri.shpX, params["S"].dtype)


@dataclass(frozen=True)
class PGMCSCConfig:
    cri: cr.CSCIndex
    non_neg: bool = False
    no_bndry: bool = False
    masked: bool = False


_CBPDN_PGM = PGMProblem(setup=_pcb_setup, grad_f=_pcb_grad,
                        prox_g=_pcb_prox, obfn_f=_pcb_f, obfn_g=_pcb_g,
                        hessian_f=_pcb_hess, xinit=_pcb_xinit,
                        obfn=_pcb_obfn,
                        stat_names=("ObjFun", "DFid", "RegL1"))


class ConvBPDN(PGMModel):
    r"""CSC via PGM/FISTA (``sporco/pgm/cbpdn.py:29``); default
    ``L = 500``."""

    # reference pgm.ConvBPDN option keys (sporco/pgm/cbpdn.py:95-98)
    REF_OPT_EXTRA = {
        "NonNegCoef": ("k", "non_neg"),
        "NoBndryCross": ("k", "no_bndry"),
        "L1Weight": ("k", "wl1"),
    }

    MASKED = False

    @staticmethod
    def options(**kw):
        return PGMOpts(**kw)

    def __init__(self, D, S, lmbda=None, opt=None, dimK=None, dimN=2,
                 wl1=1.0, W=None, non_neg=False, no_bndry=False,
                 dtype=jnp.float32, fused="auto"):
        super().__init__()
        self._fused = fused
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
        self.lmbda = lmbda
        self.cfg = PGMCSCConfig(cri=cri, non_neg=non_neg,
                                no_bndry=no_bndry, masked=self.MASKED)
        self.opts = opt.replace(dtype=dtype)
        wl1a = jnp.asarray(wl1, dtype)
        if wl1a.ndim > 0:
            wl1a = cr.l1_weight(wl1a, cri)
        Wm = jnp.ones((1,) * (3 + cri.dimN), dtype) if W is None \
            else cr.fidelity_mask(jnp.asarray(W, dtype), cri)
        self.params = {"D": Di, "S": Si,
                       "lmbda": jnp.asarray(lmbda, dtype),
                       "wl1": wl1a, "W": Wm}
        self.problem = _CBPDN_PGM
        L0 = opt.L if opt.L is not None else 500.0
        self.state = pgm_init_state(self.problem, self.cfg, self.params,
                                    self.opts, L0)
        self._init_done()

    def solve(self):
        """Run (or resume) the FISTA solve; routes through the fused
        packed-layout problem (:mod:`sporco_tpu.ops.fused_csc` -- zero
        FFTs per iteration) when the configuration is eligible."""
        from sporco_tpu.ops import fused_csc
        solver = None
        if self._fused is not False:
            if fused_csc.pgm_eligible(self.cfg, self.params,
                                      self.opts):
                solver = fused_csc.pgm_cbpdn_solve
            elif fused_csc.pgm_cfold_eligible(self.cfg, self.params,
                                              self.opts):
                # multi-channel signal + single-channel dictionary:
                # fold C into the batch axis (exact; see fused_csc)
                solver = fused_csc.pgm_cbpdn_solve_cfold
        if solver is None:
            return super().solve()
        from sporco_tpu.models.common import device_sync
        self.k_start = self.state.k
        self.timer.start("solve")
        self.state = solver(self.cfg, self.params, self.opts,
                            self.state)
        device_sync(self.state)
        self.timer.stop("solve")
        return self.getmin()

    def getmin(self):
        return cr.from_internal_X(self.state.X, self.cri)

    def getcoef(self):
        return self.getmin()

    def getcoef_internal(self):
        return self.state.X

    def setdict(self, D=None, internal=None):
        if internal is not None:
            self.params = {**self.params, "D": internal}
        else:
            self.params = {**self.params,
                           "D": cr.to_internal_D(
                               jnp.asarray(D, self.opts.dtype), self.cri)}

    def reconstruct(self, X=None):
        Xi = self.state.X if X is None \
            else cr.to_internal_X(jnp.asarray(X), self.cri)
        Si = _reconstruct_jit(self.params["D"], Xi,
                              jnp.zeros(self.cri.Nv))
        return _internal_S_to_user(Si, self.cri)


class ConvBPDNMask(ConvBPDN):
    r"""CSC with masked data fidelity via PGM
    (``sporco/pgm/cbpdn.py:387``): the gradient FFTs the masked
    residual."""
    MASKED = True

    def __init__(self, D, S, lmbda=None, W=None, opt=None, **kw):
        super().__init__(D, S, lmbda=lmbda, W=W, opt=opt, **kw)


# ---------------------------------------------------------------------------
# CnstrMOD (dense dictionary update) via PGM

@dataclass(frozen=True)
class PGMCMODConfig:
    zero_mean: bool = False
    non_neg: bool = False
    weighted: bool = False


def _cm_proj(cfg, D):
    """Unit-column-norm constraint projection
    (``sporco/admm/cmod.py:286-339``)."""
    if cfg.zero_mean:
        D = D - jnp.mean(D, axis=0, keepdims=True)
    if cfg.non_neg:
        D = jnp.maximum(D, 0.0)
    n = jnp.sqrt(jnp.sum(D ** 2, axis=0, keepdims=True))
    return D / jnp.where(n == 0.0, 1.0, n)


def _cm_setup(cfg, params):
    return {}


def _cm_grad(cfg, aux, params, Y):
    R = Y @ params["Z"] - params["S"]
    if cfg.weighted:
        R = params["W"] * R
    return R @ params["Z"].T


def _cm_prox(cfg, aux, params, V, L):
    return _cm_proj(cfg, V)


def _cm_f(cfg, aux, params, X):
    R = X @ params["Z"] - params["S"]
    if cfg.weighted:
        return 0.5 * jnp.sum(params["W"] * R ** 2)
    return 0.5 * jnp.sum(R ** 2)


def _cm_g(cfg, aux, params, X):
    return jnp.linalg.norm((_cm_proj(cfg, X) - X).ravel())


def _cm_hess(cfg, aux, params, V):
    if cfg.weighted:
        return (params["W"] * (V @ params["Z"])) @ params["Z"].T
    return (V @ params["Z"]) @ params["Z"].T


def _cm_xinit(cfg, params):
    return params["D0"]


def _cm_obfn(cfg, aux, params, X):
    return (_cm_f(cfg, aux, params, X), _cm_g(cfg, aux, params, X))


_CMOD_PGM = PGMProblem(setup=_cm_setup, grad_f=_cm_grad, prox_g=_cm_prox,
                       obfn_f=_cm_f, obfn_g=_cm_g, hessian_f=_cm_hess,
                       obfn=_cm_obfn,
                       xinit=_cm_xinit, stat_names=("DFid", "Cnstr"))


class CnstrMOD(PGMModel):
    r"""Constrained MOD dictionary update via PGM
    (``sporco/pgm/cmod.py:24``): ``argmin_D (1/2)||D Z - S||_2^2``
    subject to unit-norm columns."""

    # reference pgm.CnstrMOD option keys (sporco/pgm/cmod.py:86-87)
    REF_OPT_EXTRA = {
        "ZeroMean": ("k", "zero_mean"),
        "NonNegCoef": ("k", "non_neg"),
    }

    WEIGHTED = False

    @staticmethod
    def options(**kw):
        return PGMOpts(**kw)

    def __init__(self, Z, S, dsz=None, opt=None, D0=None, W=None,
                 zero_mean=False, non_neg=False, dtype=jnp.float32):
        super().__init__()
        if opt is None:
            opt = self.options()
        Z = jnp.asarray(Z, dtype)
        S = jnp.asarray(S, dtype)
        M = Z.shape[0] if dsz is None else dsz[-1]
        N = S.shape[0]
        if D0 is None:
            key = jax.random.PRNGKey(0)
            D0 = _cm_proj(PGMCMODConfig(), jax.random.normal(
                key, (N, M), dtype))
        self.cfg = PGMCMODConfig(zero_mean=zero_mean, non_neg=non_neg,
                                 weighted=self.WEIGHTED)
        self.opts = opt.replace(dtype=dtype)
        Wa = jnp.asarray(1.0 if W is None else W, dtype)
        self.params = {"Z": Z, "S": S, "D0": jnp.asarray(D0, dtype),
                       "W": Wa}
        self.problem = _CMOD_PGM
        L0 = opt.L if opt.L is not None else 500.0
        self.state = pgm_init_state(self.problem, self.cfg, self.params,
                                    self.opts, L0)
        self._init_done()

    def getdict(self):
        return self.state.X

    def setcoef(self, Z):
        self.params = {**self.params, "Z": jnp.asarray(Z,
                                                       self.opts.dtype)}


class WeightedCnstrMOD(CnstrMOD):
    r"""Weighted-l2 MOD update (``sporco/pgm/cmod.py:238``)."""
    WEIGHTED = True

    def __init__(self, Z, S, W=None, **kw):
        super().__init__(Z, S, W=W, **kw)


# ---------------------------------------------------------------------------
# Convolutional CnstrMOD via PGM

@dataclass(frozen=True)
class PGMCCMODConfig:
    cri: cr.CDUIndex
    zero_mean: bool = False
    masked: bool = False


def _ccm_setup(cfg, params):
    cri = cfg.cri
    axes = tuple(range(-cri.dimN, 0))
    Zf = sf.rfftn(params["Z"], axes=axes)
    Sf = sf.rfftn(params["S"], axes=axes)
    return {"Zf": Zf, "Sf": Sf}


def _ccm_Rf(cfg, aux, Df):
    # sum_m z_m * d_m over M, per signal k
    return jnp.sum(aux["Zf"] * Df, axis=2, keepdims=True) - aux["Sf"]


def _ccm_grad(cfg, aux, params, Y):
    cri = cfg.cri
    axes = tuple(range(-cri.dimN, 0))
    Yf = sf.rfftn(Y, axes=axes)
    Ryf = _ccm_Rf(cfg, aux, Yf)
    if cfg.masked:
        Ry = sf.irfftn(Ryf, s=cri.Nv, axes=axes)
        Ryf = sf.rfftn(params["W"] ** 2 * Ry, axes=axes)
    gradf = jnp.sum(jnp.conj(aux["Zf"]) * Ryf, axis=0, keepdims=True)
    return sf.irfftn(gradf, s=cri.Nv, axes=axes)


def _ccm_prox(cfg, aux, params, V, L):
    return cr.Pcn(V, cfg.cri.dsz, cfg.cri.Nv, dimN=cfg.cri.dimN,
                  zm=cfg.zero_mean)


def _ccm_f(cfg, aux, params, X):
    cri = cfg.cri
    axes = tuple(range(-cri.dimN, 0))
    Xf = sf.rfftn(X, axes=axes)
    Rf = _ccm_Rf(cfg, aux, Xf)
    if cfg.masked:
        R = sf.irfftn(Rf, s=cri.Nv, axes=axes)
        return 0.5 * jnp.sum((params["W"] * R) ** 2)
    return 0.5 * sf.rfl2norm2(Rf, cri.Nv, axis=axes)


def _ccm_g(cfg, aux, params, X):
    prj = cr.Pcn(X, cfg.cri.dsz, cfg.cri.Nv, dimN=cfg.cri.dimN,
                 zm=cfg.zero_mean)
    return jnp.linalg.norm((prj - X).ravel())


def _ccm_xinit(cfg, params):
    return params["D0"]


def _ccm_obfn(cfg, aux, params, X):
    return (_ccm_f(cfg, aux, params, X), _ccm_g(cfg, aux, params, X))


_CCMOD_PGM = PGMProblem(setup=_ccm_setup, grad_f=_ccm_grad,
                        prox_g=_ccm_prox, obfn_f=_ccm_f, obfn_g=_ccm_g,
                        obfn=_ccm_obfn,
                        xinit=_ccm_xinit, stat_names=("DFid", "Cnstr"))


class ConvCnstrMOD(PGMModel):
    r"""Convolutional constrained MOD via PGM
    (``sporco/pgm/ccmod.py:28``): dictionary update
    ``argmin_D (1/2) sum_k ||sum_m x_km * d_m - s_k||^2, d_m in C``.
    Default ``L = 14 K`` (``sporco/pgm/ccmod.py:221``).
    """

    # reference pgm.ConvCnstrMOD option keys (sporco/pgm/ccmod.py:93)
    REF_OPT_EXTRA = {"ZeroMean": ("k", "zero_mean")}

    MASKED = False

    @staticmethod
    def options(**kw):
        return PGMOpts(**kw)

    def __init__(self, Z, S, dsz, opt=None, dimK=None, dimN=2,
                 D0=None, W=None, zero_mean=False, dtype=jnp.float32):
        super().__init__()
        if opt is None:
            opt = self.options()
        S = jnp.asarray(S, dtype)
        cri = cr.cdu_index(dsz, S.shape, dimK=dimK, dimN=dimN)
        self.cri = cri
        Si = cr.to_internal_S(S, cri)
        # Z arrives in the reference's X layout Nv + (Cx, K, M)
        csc_like = cr.CSCIndex(dimN=cri.dimN, dimC=cri.dimC,
                               dimK=cri.dimK, dimCd=cri.dimCd, C=cri.C,
                               Cd=cri.Cd, Cx=cri.Cx, K=cri.K, M=cri.M,
                               Nv=cri.Nv, dsz=cri.Nv)
        Zi = cr.to_internal_X(jnp.asarray(Z, dtype), csc_like) \
            if Z is not None else jnp.zeros(cri.shpX, dtype)
        if D0 is None:
            D0 = jnp.zeros(cri.shpD, dtype)
        else:
            D0i = cr.to_internal_D(jnp.asarray(D0, dtype), csc_like)
            D0 = cr.zpad(D0i, cri.Nv)
        Wm = jnp.ones((1,) * (3 + cri.dimN), dtype) if W is None \
            else cr.fidelity_mask(jnp.asarray(W, dtype), cri)
        self.cfg = PGMCCMODConfig(cri=cri, zero_mean=zero_mean,
                                  masked=self.MASKED)
        self.opts = opt.replace(dtype=dtype)
        self.params = {"Z": Zi, "S": Si, "D0": D0, "W": Wm}
        self.problem = _CCMOD_PGM
        L0 = opt.L if opt.L is not None else 14.0 * cri.K
        self.state = pgm_init_state(self.problem, self.cfg, self.params,
                                    self.opts, L0)
        self._init_done()

    def getdict(self, crop=True):
        """Return the dictionary in user layout, cropped to ``dsz``."""
        D = self.state.X
        if crop:
            D = cr.bcrop(D, self.cri.dsz, self.cri.dimN)
        return cr.from_internal_D(D, self.cri)

    def getdict_internal(self):
        return self.state.X

    def setcoef(self, Z, internal=False):
        if not internal:
            csc_like = cr.CSCIndex(dimN=self.cri.dimN, dimC=self.cri.dimC,
                                   dimK=self.cri.dimK,
                                   dimCd=self.cri.dimCd, C=self.cri.C,
                                   Cd=self.cri.Cd, Cx=self.cri.Cx,
                                   K=self.cri.K, M=self.cri.M,
                                   Nv=self.cri.Nv, dsz=self.cri.Nv)
            Z = cr.to_internal_X(jnp.asarray(Z, self.opts.dtype),
                                 csc_like)
        self.params = {**self.params, "Z": Z}


class ConvCnstrMODMask(ConvCnstrMOD):
    r"""Masked convolutional MOD via PGM (``sporco/pgm/ccmod.py:408``)."""
    MASKED = True

    def __init__(self, Z, S, dsz, W=None, **kw):
        super().__init__(Z, S, dsz, W=W, **kw)
