"""l1-spline fitting via ADMM (capability of ``sporco/admm/spline.py:24``).

``argmin_x ||W(x - s)||_1 + (lmbda/2)||D x||_2^2`` where ``D`` is the
discrete Laplacian on the selected axes; the x-step is an exact
pointwise solve in the DCT domain (garcia-2010-robust).  The DCT-domain
scaling ``Gamma`` depends on rho and is recomputed inside the iteration
(the reference's ``rhochange`` hook, ``sporco/admm/spline.py:207``,
disappears).
"""

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from sporco_tpu.ops import fft as sf
from sporco_tpu.ops import linalg as sl
from sporco_tpu.ops import prox as sp
from sporco_tpu.solvers.admm import (ADMMOpts, AutoRhoOpts, ADMMProblem,
                                     init_state)
from sporco_tpu import refopts
from sporco_tpu.models.common import ADMMModel

__all__ = ["SplineL1"]


@dataclass(frozen=True)
class SplineConfig:
    axes: Tuple[int, ...]
    sndim: int
    lin_check: bool = False
    g_eval_y: bool = True   # reference's gEvalY option


def _setup(cfg, params):
    S = params["S"]
    alpha = jnp.zeros([1] * cfg.sndim, S.dtype)
    for ax in cfg.axes:
        ashp = [1] * cfg.sndim
        ashp[ax] = S.shape[ax]
        axn = jnp.arange(ashp[ax], dtype=S.dtype).reshape(ashp)
        alpha = alpha + (-2.0 + 2.0 * jnp.cos(axn * np.pi / ashp[ax]))
    return {"alpha": alpha}


def _xstep(cfg, aux, params, state):
    gamma = 1.0 / (1.0 + (params["lmbda"] / state.rho)
                   * aux["alpha"] ** 2)
    V = state.Y + params["S"] - state.U
    X = sf.idctii(gamma * sf.dctii(V, axes=cfg.axes), axes=cfg.axes)
    xaux = {}
    if cfg.lin_check:
        lhs = X + (params["lmbda"] / state.rho) * sf.idctii(
            aux["alpha"] ** 2 * sf.dctii(X, axes=cfg.axes),
            axes=cfg.axes)
        xaux["xrrs"] = sl.rrs(lhs, V)
    return X, xaux


def _ystep(cfg, aux, params, state, AXU):
    return sp.prox_l1(AXU - params["S"], params["Wdf"] / state.rho)


def _cnst_c(cfg, aux, params):
    return params["S"]


def _obfn(cfg, aux, params, state, xaux):
    gv = state.Y if cfg.g_eval_y else state.X - params["S"]
    dfd = jnp.sum(jnp.abs(params["Wdf"] * gv))
    dX = aux["alpha"] * sf.dctii(state.X, axes=cfg.axes)
    reg = 0.5 * jnp.sum(dX ** 2)
    xr = xaux.get("xrrs", jnp.nan) if cfg.lin_check else jnp.nan
    return (dfd + params["lmbda"] * reg, dfd, reg, xr)


def _yinit(cfg, params):
    return jnp.zeros_like(params["S"])


_SPLINE = ADMMProblem(setup=_setup, xstep=_xstep, ystep=_ystep,
                      obfn=_obfn, cnst_c=_cnst_c,
                      yinit=_yinit, uinit=_yinit,
                      stat_names=("ObjFun", "DFid", "Reg", "XSlvRelRes"))


class SplineL1(ADMMModel):
    r"""l1-spline: robust smoothing under a Laplacian penalty."""

    # reference SplineL1 option keys (sporco/admm/spline.py:97-103)
    REF_OPT_EXTRA = {
        "gEvalY": ("k", "g_eval_y"),
        "DFidWeight": ("k", "Wdf"),
        "LinSolveCheck": ("k", "lin_check"),
    }

    @staticmethod
    def options(**kw):
        # reference defaults (sporco/admm/spline.py:102-110)
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=True, period=1,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2,
                                            rsdl_target=1.0))
        base = dict(relax_param=1.8, auto_rho=ar)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, S, lmbda, opt=None, axes=(0, 1), Wdf=1.0,
                 lin_check=False, dtype=jnp.float32, Y0=None, U0=None,
                 g_eval_y=True):
        super().__init__()
        if opt is None:
            opt = self.options()
        S = jnp.asarray(S, dtype)
        self.lmbda = lmbda
        self.cfg = SplineConfig(axes=tuple(axes), sndim=S.ndim,
                                lin_check=lin_check, g_eval_y=g_eval_y)
        self.opts = opt.replace(dtype=dtype)
        self.params = {"S": S, "lmbda": jnp.asarray(lmbda, dtype),
                       "Wdf": jnp.asarray(Wdf, dtype)}
        self.problem = _SPLINE
        rho0 = opt.rho if opt.rho is not None else 2.0 * lmbda + 0.1
        rho_xi = (opt.auto_rho.rsdl_target
                  if opt.auto_rho.rsdl_target is not None else 1.0)
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, rho_xi, Y0=Y0, U0=U0)
        self._init_done()

    def getmin(self):
        return self.state.X
