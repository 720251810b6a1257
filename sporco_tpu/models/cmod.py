"""Constrained MOD dictionary update via ADMM
(capability of ``sporco/admm/cmod.py:21``).

``argmin_D (1/2)||D Z - S||_2^2  s.t.  ||d_m||_2 = 1``: the x-step
solves the right-sided system ``D (Z Z^T + rho I) = S Z^T + rho (Y-U)``
with a rho-independent Gram eigendecomposition of ``Z`` in split form
(no refactorisation on rho change, unlike ``sporco/admm/cmod.py:261``);
the y-step projects columns onto the constraint set.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sporco_tpu.ops import linalg as sl
from sporco_tpu.solvers.admm import (ADMMOpts, AutoRhoOpts, ADMMProblem,
                                     init_state)
from sporco_tpu import refopts
from sporco_tpu.models.common import ADMMModel

__all__ = ["CnstrMOD", "getPcn", "zeromean", "normalise"]


def zeromean(v):
    """Subtract column means (``sporco/admm/cmod.py:286``)."""
    return v - jnp.mean(v, axis=0, keepdims=True)


def normalise(v):
    """Unit l2 norm columns (``sporco/admm/cmod.py:339``)."""
    n = jnp.sqrt(jnp.sum(v ** 2, axis=0, keepdims=True))
    return v / jnp.where(n == 0.0, 1.0, n)


def getPcn(zm):
    """Column constraint-set projection (``sporco/admm/cmod.py:286``)."""
    if zm:
        return lambda x: normalise(zeromean(x))
    return normalise


@dataclass(frozen=True)
class CMODConfig:
    zero_mean: bool = False


def _setup(cfg, params):
    return {}


def _xstep(cfg, aux, params, state):
    # D (ZZ^T + rho I) = S Z^T + rho (Y - U), solved in split form
    X = sl.gram_solve_aati_split(params["factor"], state.rho,
                                 params["S"], state.Y - state.U)
    return X, None


def _ystep(cfg, aux, params, state, AXU):
    P = getPcn(cfg.zero_mean)
    return P(AXU)


def _obfn(cfg, aux, params, state, xaux):
    # AuxVarObj=True default: evaluate with Y (sporco/admm/cmod.py:101)
    dfd = 0.5 * jnp.sum((state.Y @ params["Z"] - params["S"]) ** 2)
    P = getPcn(cfg.zero_mean)
    cns = jnp.linalg.norm((P(state.Y) - state.Y).ravel())
    return (dfd, cns)


def _yinit(cfg, params):
    return params["D0"]


def _uinit(cfg, params):
    return jnp.zeros_like(params["D0"])


_CMOD = ADMMProblem(setup=_setup, xstep=_xstep, ystep=_ystep, obfn=_obfn,
                    yinit=_yinit, uinit=_uinit,
                    stat_names=("DFid", "Cnstr"))


class CnstrMOD(ADMMModel):
    r"""ADMM constrained MOD dictionary update.  ``Z`` is (M, K), ``S``
    is (N, K); the solution ``D`` is (N, M) with unit-norm columns.
    Defaults mirror the reference: AutoRho enabled, rho = K / 500
    (``sporco/admm/cmod.py:104,185``)."""

    # reference CnstrMOD option keys (sporco/admm/cmod.py:106-118)
    REF_OPT_EXTRA = {
        **refopts._ADMM_EQUAL,
        "AuxVarObj": refopts.IGNORE,
        "ZeroMean": ("k", "zero_mean"),
    }

    @staticmethod
    def options(**kw):
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=True, period=10,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, Z, S, dsz=None, opt=None, D0=None,
                 zero_mean=False, dtype=jnp.float32, Y0=None, U0=None):
        super().__init__()
        if opt is None:
            opt = self.options()
        Z = jnp.asarray(Z, dtype)
        S = jnp.asarray(S, dtype)
        M = Z.shape[0] if dsz is None else dsz[-1]
        N = S.shape[0]
        if D0 is None:
            D0 = normalise(jax.random.normal(jax.random.PRNGKey(0),
                                             (N, M), dtype))
        self.cfg = CMODConfig(zero_mean=zero_mean)
        self.opts = opt.replace(dtype=dtype)
        self.params = {"Z": Z, "S": S,
                       "factor": sl.gram_eig_factor(Z),
                       "D0": jnp.asarray(D0, dtype)}
        self.problem = _CMOD
        rho0 = opt.rho if opt.rho is not None else S.shape[1] / 500.0
        rho_xi = (opt.auto_rho.rsdl_target
                  if opt.auto_rho.rsdl_target is not None else 1.0)
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, rho_xi, Y0=Y0, U0=U0)
        self._init_done()

    def getmin(self):
        return self.state.Y

    def getdict(self):
        return self.state.Y

    def setcoef(self, Z):
        """Update the coefficient array (dictionary-learning outer
        loop); refactorises the Gram eigendecomposition."""
        Z = jnp.asarray(Z, self.opts.dtype)
        self.params = {**self.params, "Z": Z,
                       "factor": sl.gram_eig_factor(Z)}
