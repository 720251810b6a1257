"""BPDN (basis pursuit denoising) family via ADMM.

Capability parity with ``sporco/admm/bpdn.py``: :class:`BPDN`
(``:271``), :class:`BPDNJoint` (``:469``), :class:`ElasticNet`
(``:592``), :class:`BPDNProjL1` (``:750``), :class:`MinL1InL2Ball`
(``:920``).

TPU-first x-step: where the reference caches a rho-dependent Cholesky
factor and refactorises on every rho change (``sporco/admm/bpdn.py:180,
264``), these models eigendecompose the Gram matrix once inside the
jitted solve (:func:`sporco_tpu.ops.linalg.gram_eig_factor`) so the
``(D^T D + rho I)^{-1}`` solve is two matmuls for *any* rho -- adaptive
rho never leaves the device and never refactorises.
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu.ops import linalg as sl
from sporco_tpu.ops import prox as sp
from sporco_tpu.solvers.admm import (ADMMOpts, AutoRhoOpts, ADMMProblem,
                                     init_state)
from sporco_tpu import refopts
from sporco_tpu.models.common import ADMMModel, default_rho_xi

__all__ = ["BPDN", "BPDNJoint", "ElasticNet", "BPDNProjL1",
           "MinL1InL2Ball"]


@dataclass(frozen=True)
class BPDNConfig:
    variant: str = "l1"    # l1 | joint | elastic | projl1
    non_neg: bool = False
    obj_from_y: bool = True   # AuxVarObj semantics (sporco/admm/bpdn.py:105)


# --- problem functions (module-level for stable jit caching) ---------------

def _setup(cfg, params):
    # The Gram eigendecomposition is computed once at model init (host
    # side, its own compilation) and carried in params -- eigh inside the
    # solve program would recompile slowly at large M.
    return {}


def _xstep(cfg, aux, params, state):
    # solve (D^T D + rho_eff I) x = D^T S + rho (Y - U) in split form
    # (cancellation-free in float32, see gram_solve_atai_split)
    rho = state.rho
    if cfg.variant == "elastic":
        rho_eff = rho + params["mu"]
    else:
        rho_eff = rho
    v = (rho / rho_eff) * (state.Y - state.U)
    X = sl.gram_solve_atai_split(params["factor"], rho_eff,
                                 params["S"], v)
    return X, None


def _ystep(cfg, aux, params, state, AXU):
    rho = state.rho
    if cfg.variant == "projl1":
        Y = sp.proj_l1(AXU, params["gamma"], axis=0)
    elif cfg.variant == "joint":
        Y = sp.prox_sl1l2(AXU, (params["lmbda"] / rho) * params["wl1"],
                          params["mu"] / rho, axis=-1)
    else:
        Y = sp.prox_l1(AXU, (params["lmbda"] / rho) * params["wl1"])
    if cfg.non_neg:
        Y = jnp.maximum(Y, 0.0)
    return Y


def _obfn(cfg, aux, params, state, xaux):
    V = state.Y if cfg.obj_from_y else state.X
    dfd = 0.5 * jnp.sum((params["D"] @ V - params["S"]) ** 2)
    if cfg.variant == "projl1":
        prj = sp.proj_l1(V, params["gamma"], axis=0)
        cns = jnp.linalg.norm((prj - V).ravel())
        return (dfd, cns)
    rl1 = jnp.sum(jnp.abs(params["wl1"] * V))
    if cfg.variant == "joint":
        rl21 = jnp.sum(jnp.sqrt(jnp.sum(V ** 2, axis=-1)))
        return (dfd + params["lmbda"] * rl1 + params["mu"] * rl21,
                dfd, rl1, rl21)
    if cfg.variant == "elastic":
        rl2 = 0.5 * jnp.sum(V ** 2)
        return (dfd + params["lmbda"] * rl1 + params["mu"] * rl2,
                dfd, rl1, rl2)
    return (dfd + params["lmbda"] * rl1, dfd, rl1)


def _yinit(cfg, params):
    return jnp.zeros_like(params["Y0"])


def _uinit(cfg, params):
    return jnp.zeros_like(params["Y0"])


_PROBLEMS = {
    v: ADMMProblem(setup=_setup, xstep=_xstep, ystep=_ystep, obfn=_obfn,
                   yinit=_yinit, uinit=_uinit, stat_names=names)
    for v, names in [("l1", ("ObjFun", "DFid", "RegL1")),
                     ("joint", ("ObjFun", "DFid", "RegL1", "RegL21")),
                     ("elastic", ("ObjFun", "DFid", "RegL1", "RegL2")),
                     ("projl1", ("DFid", "Cnstr"))]
}


class BPDN(ADMMModel):
    r"""ADMM solver for BPDN: ``argmin_x (1/2)||Dx - s||_2^2 +
    lmbda ||x||_1`` (``sporco/admm/bpdn.py:271``).

    ``D`` is (N, M), ``S`` is (N, K) (or (N,)); the solution ``X`` is
    (M, K).  Option defaults mirror the reference: RelaxParam 1.8,
    AutoRho enabled with AutoScaling (Scaling 1000, RsdlRatio 1.2,
    Period 10), rho default ``50 lmbda + 1``
    (``sporco/admm/bpdn.py:106-111,419``).
    """

    VARIANT = "l1"

    # reference GenericBPDN/BPDN option keys (sporco/admm/bpdn.py:92-130)
    REF_OPT_EXTRA = {
        **refopts._ADMM_EQUAL,
        "AuxVarObj": ("k", "obj_from_y"),
        "LinSolveCheck": refopts.WARN,
        "NonNegCoef": ("k", "non_neg"),
        "L1Weight": ("k", "wl1"),
    }

    @staticmethod
    def options(**kw):
        """Construct :class:`ADMMOpts` with this model's defaults."""
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=True, period=10,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, D, S, lmbda=None, opt=None, wl1=1.0, mu=0.0,
                 gamma=None, non_neg=False, dtype=jnp.float32,
                 Y0=None, U0=None, obj_from_y=True):
        super().__init__()
        if opt is None:
            opt = self.options()
        D = jnp.asarray(D, dtype)
        S = jnp.asarray(S, dtype)
        if S.ndim == 1:
            S = S[:, None]
        if lmbda is None:
            # default: 0.1 * ||D^T s||_inf  (sporco/admm/bpdn.py:406)
            DTS = D.T @ S
            lmbda = 0.1 * float(jnp.max(jnp.abs(DTS)))
        self.lmbda = lmbda
        self.cfg = BPDNConfig(variant=self.VARIANT, non_neg=non_neg,
                              obj_from_y=obj_from_y)
        self.opts = opt.replace(dtype=dtype)
        M, K = D.shape[1], S.shape[1]
        self.params = {
            "D": D, "S": S,
            "factor": sl.gram_eig_factor(D),
            "lmbda": jnp.asarray(lmbda, dtype),
            "wl1": jnp.asarray(wl1, dtype),
            "mu": jnp.asarray(mu, dtype),
            "gamma": jnp.asarray(0.0 if gamma is None else gamma, dtype),
            "Y0": jnp.zeros((M, K), dtype),
        }
        self.problem = _PROBLEMS[self.VARIANT]
        rho0 = opt.rho if opt.rho is not None else 50.0 * lmbda + 1.0
        rho_xi = (opt.auto_rho.rsdl_target
                  if opt.auto_rho.rsdl_target is not None
                  else default_rho_xi(lmbda))
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, rho_xi, Y0=Y0, U0=U0)
        self._init_done()

    def getmin(self):
        return self.state.Y

    def getcoef(self):
        return self.state.Y

    def reconstruct(self, X=None):
        if X is None:
            X = self.getcoef()
        return self.params["D"] @ X


class BPDNJoint(BPDN):
    r"""BPDN with joint sparsity over signals: adds ``mu ||X||_{2,1}``
    with the l2 norm over the signal axis (``sporco/admm/bpdn.py:469``)."""

    VARIANT = "joint"

    def __init__(self, D, S, lmbda=None, mu=0.0, opt=None, **kw):
        super().__init__(D, S, lmbda=lmbda, mu=mu, opt=opt, **kw)


class ElasticNet(BPDN):
    r"""Elastic net: ``(1/2)||Dx-s||^2 + lmbda||x||_1 + (mu/2)||x||_2^2``
    (``sporco/admm/bpdn.py:592``); the x-step solves with ``mu + rho``
    using the same rho-independent Gram factor."""

    VARIANT = "elastic"

    def __init__(self, D, S, lmbda=None, mu=0.0, opt=None, **kw):
        super().__init__(D, S, lmbda=lmbda, mu=mu, opt=opt, **kw)


class BPDNProjL1(BPDN):
    r"""Minimise the data fidelity subject to ``||x||_1 <= gamma``
    (per signal column; ``sporco/admm/bpdn.py:750``)."""

    VARIANT = "projl1"

    @staticmethod
    def options(**kw):
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=True, period=10,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2,
                                            rsdl_target=1.0))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, D, S, gamma, opt=None, **kw):
        if opt is None:
            opt = self.options()
        if opt.rho is None:
            opt = opt.replace(rho=1.0)
        super().__init__(D, S, lmbda=1.0, gamma=gamma, opt=opt, **kw)


# ---------------------------------------------------------------------------
# MinL1InL2Ball: two-block constrained problem

@dataclass(frozen=True)
class MinL1Config:
    non_neg: bool = False


def _ml1_setup(cfg, params):
    return {}


def _ml1_xstep(cfg, aux, params, state):
    # (I + D^T D) x = (Y0 - U0) + D^T (Y1 - U1): exactly the split form
    Y0, Y1 = state.Y
    U0, U1 = state.U
    X = sl.gram_solve_atai_split(params["factor"], 1.0,
                                 Y1 - U1, Y0 - U0)
    return X, None


def _ml1_ystep(cfg, aux, params, state, AXU):
    A0, A1 = AXU
    rho = state.rho
    Y0 = sp.prox_l1(A0, params["wl1"] / rho)
    if cfg.non_neg:
        Y0 = jnp.maximum(Y0, 0.0)
    S = params["S"]
    Y1 = S + sp.proj_l2(A1 - S, params["epsilon"], axis=0)
    return (Y0, Y1)


def _ml1_cnst_a(cfg, aux, params, X):
    return (X, params["D"] @ X)


def _ml1_cnst_at(cfg, aux, params, V):
    V0, V1 = V
    return V0 + params["D"].T @ V1


def _ml1_obfn(cfg, aux, params, state, xaux):
    Y0, Y1 = state.Y
    obj = jnp.sum(jnp.abs(params["wl1"] * Y0))
    S = params["S"]
    prj = S + sp.proj_l2(Y1 - S, params["epsilon"], axis=0)
    cns = jnp.linalg.norm((prj - Y1).ravel())
    return (obj, cns)


def _ml1_yinit(cfg, params):
    return (jnp.zeros_like(params["Y0"]),
            jnp.zeros_like(params["S"]))


def _ml1_xinit(cfg, params):
    return jnp.zeros_like(params["Y0"])


def _ml1_uinit(cfg, params):
    return (jnp.zeros_like(params["Y0"]),
            jnp.zeros_like(params["S"]))


def _ml1_rsdl_s(cfg, aux, params, state, Yprev):
    """Two-block dual residual ``rho A^T U``
    (``sporco/admm/bpdn.py:1160-1168``)."""
    return state.rho * _ml1_cnst_at(cfg, aux, params, state.U)


def _ml1_rsdl_sn(cfg, aux, params, state):
    from sporco_tpu.solvers.admm import tree_norm
    return state.rho * tree_norm(state.U)


_ML1_PROBLEM = ADMMProblem(
    setup=_ml1_setup, xstep=_ml1_xstep, ystep=_ml1_ystep, obfn=_ml1_obfn,
    cnst_a=_ml1_cnst_a, cnst_at=_ml1_cnst_at,
    yinit=_ml1_yinit, uinit=_ml1_uinit, xinit=_ml1_xinit,
    rsdl_s=_ml1_rsdl_s, rsdl_sn=_ml1_rsdl_sn,
    stat_names=("ObjFun", "Cnstr"))


class MinL1InL2Ball(ADMMModel):
    r"""Minimise ``||x||_1`` subject to ``||Dx - s||_2 <= epsilon``
    (``sporco/admm/bpdn.py:920``), as the two-block splitting
    ``(I; D) x = (y0; y1)`` with an l1 prox on ``y0`` and an l2-ball
    projection (centred at ``s``) on ``y1``."""

    # reference MinL1InL2Ball option keys (sporco/admm/bpdn.py:955-975)
    REF_OPT_EXTRA = {
        **refopts._ADMM_EQUAL,
        "AuxVarObj": refopts.IGNORE,
        "NonNegCoef": ("k", "non_neg"),
        "L1Weight": ("k", "wl1"),
    }

    @staticmethod
    def options(**kw):
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=True, period=10,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2,
                                            rsdl_target=1.0))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, D, S, epsilon, opt=None, wl1=1.0, non_neg=False,
                 dtype=jnp.float32, Y0=None, U0=None):
        super().__init__()
        if opt is None:
            opt = self.options()
        D = jnp.asarray(D, dtype)
        S = jnp.asarray(S, dtype)
        if S.ndim == 1:
            S = S[:, None]
        self.cfg = MinL1Config(non_neg=non_neg)
        self.opts = opt.replace(dtype=dtype)
        M, K = D.shape[1], S.shape[1]
        self.params = {
            "D": D, "S": S,
            "factor": sl.gram_eig_factor(D),
            "epsilon": jnp.asarray(epsilon, dtype),
            "wl1": jnp.asarray(wl1, dtype),
            "Y0": jnp.zeros((M, K), dtype),
        }
        self.problem = _ML1_PROBLEM
        rho0 = opt.rho if opt.rho is not None else 1.0
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, 1.0, Y0=Y0, U0=U0)
        self._init_done()

    def getmin(self):
        return self.state.X

    def getcoef(self):
        return self.state.X

    def reconstruct(self, X=None):
        if X is None:
            X = self.getcoef()
        return self.params["D"] @ X
