"""Robust PCA via ADMM (capability of ``sporco/admm/rpca.py:23``).

``argmin_{X,Y} ||X||_* + lmbda ||Y||_1  s.t.  X + Y = S``: the x-step is
singular-value soft thresholding (batched ``jnp.linalg.svd`` on TPU) and
the y-step elementwise shrinkage.
"""

from dataclasses import dataclass

import jax.numpy as jnp

from sporco_tpu.ops import prox as sp
from sporco_tpu.solvers.admm import (ADMMOpts, AutoRhoOpts, ADMMProblem,
                                     init_state)
from sporco_tpu import refopts
from sporco_tpu.models.common import ADMMModel

__all__ = ["RobustPCA"]


@dataclass(frozen=True)
class RPCAConfig:
    # randomized-SVD nuclear prox (halko-2011 subspace iteration):
    # None = exact full SVD; an int bounds the x-step's target rank
    svd_rank: int = None
    svd_iters: int = 2


def _setup(cfg, params):
    return {}


def _xstep(cfg, aux, params, state):
    X, ss = sp.prox_nuclear(params["S"] - state.Y - state.U,
                            1.0 / state.rho, rank=cfg.svd_rank,
                            n_iter=cfg.svd_iters)
    return X, {"ss": ss}


def _ystep(cfg, aux, params, state, AXU):
    # AXU = AX + U; the reference's ystep is prox_l1(S - AX - U, ...)
    return sp.prox_l1(params["S"] - AXU, params["lmbda"] / state.rho)


def _cnst_b(cfg, aux, params, Y):
    return Y          # constraint is X + Y = S


def _cnst_c(cfg, aux, params):
    return params["S"]


def _obfn(cfg, aux, params, state, xaux):
    rnn = jnp.sum(xaux["ss"])
    rl1 = jnp.sum(jnp.abs(state.Y))
    cns = jnp.linalg.norm((state.X + state.Y - params["S"]).ravel())
    return (rnn + params["lmbda"] * rl1, rnn, rl1, cns)


def _yinit(cfg, params):
    return jnp.zeros_like(params["S"])


_RPCA = ADMMProblem(setup=_setup, xstep=_xstep, ystep=_ystep, obfn=_obfn,
                    cnst_b=_cnst_b, cnst_c=_cnst_c,
                    yinit=_yinit, uinit=_yinit,
                    stat_names=("ObjFun", "NrmNuc", "NrmL1", "Cnstr"))


class RobustPCA(ADMMModel):
    r"""Robust PCA: low-rank + sparse decomposition.  ``solve`` returns
    ``(X, Y)`` (low-rank, sparse), like the reference
    (``sporco/admm/rpca.py:160``)."""

    # reference RobustPCA option keys (sporco/admm/rpca.py:84-88)
    REF_OPT_EXTRA = {"fEvalX": refopts.IGNORE, "gEvalY": refopts.IGNORE}

    @staticmethod
    def options(**kw):
        # reference defaults (sporco/admm/rpca.py:44-50)
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=True, period=1,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2,
                                            rsdl_target=1.0))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, S, lmbda=None, opt=None, dtype=jnp.float32,
                 Y0=None, U0=None, svd_rank=None, svd_iters=2):
        super().__init__()
        if opt is None:
            opt = self.options()
        S = jnp.asarray(S, dtype)
        if lmbda is None:
            lmbda = float(S.shape[0]) ** -0.5
        self.lmbda = lmbda
        self.cfg = RPCAConfig(svd_rank=svd_rank, svd_iters=svd_iters)
        self.opts = opt.replace(dtype=dtype)
        self.params = {"S": S, "lmbda": jnp.asarray(lmbda, dtype)}
        self.problem = _RPCA
        rho0 = opt.rho if opt.rho is not None else 2.0 * lmbda + 0.1
        rho_xi = (opt.auto_rho.rsdl_target
                  if opt.auto_rho.rsdl_target is not None else 1.0)
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, rho_xi, Y0=Y0, U0=U0)
        self._init_done()

    def solve(self):
        super().solve()
        return self.state.X, self.state.Y

    def getmin(self):
        return self.state.X
