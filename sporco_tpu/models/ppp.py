"""Plug-and-Play Priors (PPP).

Capability parity with ``sporco/admm/ppp.py`` (:class:`PPP` ADMM form
``:120``, :class:`PPPConsensus` / MACE via weighted consensus ``:258``)
and ``sporco/pgm/ppp.py`` (:class:`PPPPGM` ``:124``).

The user supplies the data-fidelity pieces and the prior ("denoiser")
as callables.  Callables must be jax-traceable to run inside the jitted
loop; wrap host-side denoisers with :func:`host_prior` (a
``jax.pure_callback`` adapter) to plug in arbitrary numpy code.
"""

from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu.solvers.admm import (ADMMOpts, AutoRhoOpts, ADMMProblem,
                                     init_state, tree_norm)
from sporco_tpu.solvers.pgm import PGMOpts, PGMProblem, pgm_init_state
from sporco_tpu.models.common import ADMMModel, PGMModel

__all__ = ["PPP", "PPPConsensus", "PPPPGM", "host_prior"]


def host_prior(fn, example_out=None):
    """Wrap a host-side (numpy) denoiser so it can run inside a jitted
    solver loop via ``jax.pure_callback``.  ``fn(x: np.ndarray) ->
    np.ndarray`` must preserve shape/dtype."""
    def wrapped(x, *a):
        return jax.pure_callback(
            lambda v: np.asarray(fn(np.asarray(v)), dtype=v.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype), x)
    return wrapped


@dataclass(frozen=True)
class _PPPConfig:
    pass


class PPP(ADMMModel):
    r"""Plug-and-Play ADMM (``sporco/admm/ppp.py:120``):
    x-step = ``proxf``, y-step = ``proxg`` (the prior/denoiser).

    Parameters: ``xshape``; ``f(x)`` data fidelity value (may return
    nan if unavailable); ``proxf(x, rho)``; ``proxg(x, rho)``.
    """

    @staticmethod
    def options(**kw):
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=False))
        base = dict(relax_param=1.0, auto_rho=ar, rho=1.0)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, xshape, f, proxf, proxg, opt=None,
                 dtype=jnp.float32, Y0=None, U0=None):
        super().__init__()
        if opt is None:
            opt = self.options()
        self.cfg = _PPPConfig()
        self.opts = opt.replace(dtype=dtype)
        self.params = {"x0": jnp.zeros(xshape, dtype)}

        def _setup(cfg, params):
            return {}

        def _xstep(cfg, aux, params, state):
            return proxf(state.Y - state.U, state.rho), None

        def _ystep(cfg, aux, params, state, AXU):
            return proxg(AXU, state.rho)

        def _obfn(cfg, aux, params, state, xaux):
            return (f(state.X),)

        def _yinit(cfg, params):
            return jnp.zeros_like(params["x0"])

        self.problem = ADMMProblem(
            setup=_setup, xstep=_xstep, ystep=_ystep, obfn=_obfn,
            yinit=_yinit, uinit=_yinit, stat_names=("FVal",))
        rho0 = opt.rho if opt.rho is not None else 1.0
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, 1.0, Y0=Y0, U0=U0)
        self._init_done()

    def getmin(self):
        return self.state.X


class PPPConsensus(ADMMModel):
    r"""Multi-Agent Consensus Equilibrium via weighted ADMM consensus
    (buzzard-2018-plug; ``sporco/admm/ppp.py:156-318``): each agent
    contributes a proximal operator ``proxfi(x, rho)``; blocks are
    stacked on a new leading axis; the y-step is the (weighted) block
    mean followed by ``proxg`` (identity by default)."""

    @staticmethod
    def options(**kw):
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=False))
        base = dict(relax_param=1.0, auto_rho=ar, rho=1.0)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, xshape, proxfi: Sequence[Callable], proxg=None,
                 mu=None, opt=None, dtype=jnp.float32, Y0=None, U0=None):
        super().__init__()
        if opt is None:
            opt = self.options()
        Nb = len(proxfi)
        if mu is None:
            mu = np.ones((Nb,))
        mu = jnp.asarray(np.asarray(mu) / np.sum(mu), dtype)
        self.cfg = _PPPConfig()
        self.opts = opt.replace(dtype=dtype)
        self.params = {"x0": jnp.zeros(xshape, dtype),
                       "mu": mu.reshape((Nb,) + (1,) * len(xshape))}

        def _setup(cfg, params):
            return {}

        def _xstep(cfg, aux, params, state):
            YU = [state.Y[0] - state.U[i] for i in range(Nb)]
            X = jnp.stack([proxfi[i](YU[i], state.rho)
                           for i in range(Nb)], axis=0)
            return X, None

        def _ystep(cfg, aux, params, state, AXU):
            m = jnp.sum(params["mu"] * AXU, axis=0, keepdims=True)
            if proxg is not None:
                m = proxg(m[0], state.rho)[None]
            return m

        def _cnst_b(cfg, aux, params, Y):
            return jnp.negative(Y)       # broadcast over blocks

        def _rsdl_s(cfg, aux, params, state, Yprev):
            return state.rho * jnp.sqrt(float(Nb)) * (Yprev - state.Y)

        def _rsdl_sn(cfg, aux, params, state):
            return state.rho * tree_norm(state.U)

        def _rsdl_rn(cfg, aux, params, state, AXnr):
            return jnp.maximum(tree_norm(AXnr),
                               jnp.sqrt(float(Nb))
                               * tree_norm(state.Y))

        def _yinit(cfg, params):
            return jnp.zeros((1,) + xshape, dtype)

        def _uinit(cfg, params):
            return jnp.zeros((Nb,) + xshape, dtype)

        self.problem = ADMMProblem(
            setup=_setup, xstep=_xstep, ystep=_ystep, obfn=None,
            cnst_b=_cnst_b, rsdl_s=_rsdl_s, rsdl_sn=_rsdl_sn,
            rsdl_rn=_rsdl_rn, yinit=_yinit, uinit=_uinit,
            xinit=_uinit, stat_names=())
        rho0 = opt.rho if opt.rho is not None else 1.0
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, 1.0, Y0=Y0, U0=U0)
        self._init_done()

    def getmin(self):
        return self.state.Y[0]


class PPPPGM(PGMModel):
    r"""Plug-and-Play PGM (``sporco/pgm/ppp.py:124``): gradient step on
    the data fidelity + prior as the proximal step.

    Parameters: ``xshape``; ``f(x)``; ``gradf(x)``; ``proxg(x, L)``.
    """

    @staticmethod
    def options(**kw):
        return PGMOpts(**kw)

    def __init__(self, xshape, f, gradf, proxg, opt=None,
                 dtype=jnp.float32):
        super().__init__()
        if opt is None:
            opt = self.options()
        self.cfg = _PPPConfig()
        self.opts = opt.replace(dtype=dtype)
        self.params = {"x0": jnp.zeros(xshape, dtype)}

        def _setup(cfg, params):
            return {}

        def _grad(cfg, aux, params, Y):
            return gradf(Y)

        def _prox(cfg, aux, params, V, L):
            return proxg(V, L)

        def _f(cfg, aux, params, X):
            return f(X)

        def _g(cfg, aux, params, X):
            return jnp.asarray(0.0, X.dtype)

        def _xinit(cfg, params):
            return params["x0"]

        self.problem = PGMProblem(
            setup=_setup, grad_f=_grad, prox_g=_prox, obfn_f=_f,
            obfn_g=_g, xinit=_xinit, stat_names=("ObjFun", "F", "G"))
        L0 = opt.L if opt.L is not None else 1.0
        self.state = pgm_init_state(self.problem, self.cfg, self.params,
                                    self.opts, L0)
        self._init_done()
