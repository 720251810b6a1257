"""Generic PGM / accelerated proximal-gradient (FISTA) loop driver.

Functional re-design of the reference PGM framework (``sporco/pgm/``):
the iteration (gradient step, prox, momentum extrapolation), the
momentum strategies (Nesterov / linear / generalised-linear,
``sporco/pgm/momentum.py:47-130``), the step-size policies (Cauchy,
Barzilai-Borwein, ``sporco/pgm/stepsize.py:49-130``), the monotone
variant (beck-2009-tv), and both backtracking line searches (standard
beck-2009-fast and robust florea-2017-robust,
``sporco/pgm/backtrack.py:49-180``) all run inside a single jitted
``lax.while_loop``; backtracking is an inner ``while_loop``.

The reference's ``PGMDFT`` specialisation (state kept in the DFT domain,
``sporco/pgm/pgm.py:708``) is intentionally absent: with trailing
spatial axes, a spatial-domain state needs exactly the same two
transforms per iteration (one forward of Y inside ``grad_f``, one
inverse of the gradient step), and a real-valued state is required at
jit boundaries on TPU anyway.  Convolutional problems simply implement
``grad_f`` with an internal rfft/irfft pair.

Strategy objects are selected by static strings in :class:`PGMOpts`
(instead of the reference's object-valued options) so the whole
configuration is hashable and jit-cacheable.
"""

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from sporco_tpu.solvers.admm import IterStats, tree_norm, _tmap

__all__ = ["PGMOpts", "PGMProblem", "PGMState", "pgm_solve",
           "pgm_init_state", "pgm_iterstats"]


@dataclass(frozen=True)
class PGMOpts:
    """PGM options (semantics of ``sporco/pgm/pgm.py:160-163``)."""
    max_iter: int = 1000
    rel_stop_tol: float = 1e-3
    L: Optional[float] = None           # None -> problem default
    monotone: bool = False
    momentum: str = "nesterov"          # nesterov | linear | genlinear
    momentum_a: float = 50.0
    momentum_b: float = 2.0
    stepsize: str = "none"              # none | cauchy | bb
    backtrack: str = "none"             # none | standard | robust
    bt_gamma_u: float = 1.2             # standard default (2.0 for robust)
    bt_gamma_d: float = 0.9
    bt_maxiter: int = 50
    auto_stop: bool = False             # adaptive tolerance tau0/(1+k)
    auto_stop_tau0: float = 1e-2
    fast_solve: bool = False
    verbose: bool = False
    dtype: Any = jnp.float32

    def replace(self, **kw):
        from dataclasses import replace as _r
        return _r(self, **kw)


@dataclass(frozen=True)
class PGMProblem:
    """Static bundle of pure functions defining a PGM problem:
    ``argmin_x f(x) + g(x)`` with smooth ``f`` and prox-able ``g``.

    Signatures::

        setup(cfg, params) -> aux
        grad_f(cfg, aux, params, Y) -> grad
        prox_g(cfg, aux, params, V, L) -> X
        obfn_f(cfg, aux, params, X) -> scalar   (data term; backtracking)
        obfn_g(cfg, aux, params, X) -> scalar   (regulariser)
        hessian_f(cfg, aux, params, V) -> array (Cauchy policy only)
        xinit(cfg, params) -> X0
    """
    setup: Callable
    grad_f: Callable
    prox_g: Callable
    obfn_f: Callable
    obfn_g: Callable
    xinit: Callable
    hessian_f: Optional[Callable] = None
    obfn: Optional[Callable] = None     # full tuple override
    stat_names: Tuple[str, ...] = ("Obj", "F", "G")


class PGMState(NamedTuple):
    """Serialisable PGM solver state pytree (real arrays only)."""
    X: Any
    Y: Any
    Xprv: Any
    Gprv: Any          # previous gradient (BB policy)
    Zrb: Any           # robust-backtrack Z sequence
    t: jnp.ndarray
    Tk: jnp.ndarray    # robust-backtrack T sequence
    L: jnp.ndarray
    k: jnp.ndarray
    rsdl: jnp.ndarray
    objprv: jnp.ndarray   # monotone variant memory
    stats: jnp.ndarray


def pgm_init_state(prob, cfg, params, opts, L0):
    X0 = prob.xinit(cfg, params)
    rdt = jnp.zeros((), opts.dtype).real.dtype
    nstat = 1 + len(prob.stat_names) + 5   # Rsdl, F_Btrack, Q_Btrack, ItBt, L
    return PGMState(
        X=X0, Y=X0, Xprv=X0,
        Gprv=_tmap(jnp.zeros_like, X0),
        Zrb=X0,
        t=jnp.asarray(1.0, rdt), Tk=jnp.asarray(0.0, rdt),
        L=jnp.asarray(L0, rdt),
        k=jnp.asarray(0, jnp.int32),
        rsdl=jnp.asarray(jnp.inf, rdt),
        objprv=jnp.asarray(jnp.inf, rdt),
        stats=jnp.full((opts.max_iter, nstat), jnp.nan, jnp.float32),
    )


def _momentum_update(opts, t, k):
    """New momentum parameter (``sporco/pgm/momentum.py``)."""
    if opts.momentum == "nesterov":
        return 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t ** 2))
    kf = k.astype(t.dtype)
    if opts.momentum == "linear":
        return (kf + opts.momentum_b) / opts.momentum_b
    if opts.momentum == "genlinear":
        return (kf + opts.momentum_a) / opts.momentum_b
    raise ValueError(f"unknown momentum {opts.momentum!r}")


def _dotp(a, b):
    return jax.tree_util.tree_reduce(
        lambda acc, v: acc + v,
        _tmap(lambda x, y: jnp.sum(jnp.real(jnp.conj(x) * y)), a, b), 0.0)


@partial(jax.jit, static_argnums=(0, 1, 3))
def _pgm_run(prob, cfg, params, opts, state):
    aux = prob.setup(cfg, params)
    k0 = state.k

    def eval_obj(X):
        if prob.obfn is not None:
            return prob.obfn(cfg, aux, params, X)
        f = prob.obfn_f(cfg, aux, params, X)
        g = prob.obfn_g(cfg, aux, params, X)
        return (f + g, f, g)

    def cond(st):
        tol = opts.rel_stop_tol
        if opts.auto_stop:
            tol = opts.auto_stop_tau0 / (1.0 + st.k.astype(st.rsdl.dtype))
        return jnp.logical_and(st.k - k0 < opts.max_iter, st.rsdl >= tol)

    def plain_step(st):
        """x-step + momentum y-step (no backtracking)."""
        grad = prob.grad_f(cfg, aux, params, st.Y)
        L = st.L
        if opts.stepsize == "cauchy":
            den = _dotp(grad, grad)
            num = _dotp(grad, prob.hessian_f(cfg, aux, params, grad))
            L = jnp.where(st.k > 1, num / den, L)
        elif opts.stepsize == "bb":
            dx = _tmap(lambda a, b: a - b, st.X, st.Xprv)
            dg = _tmap(lambda a, b: a - b, grad, st.Gprv)
            Lbb = _dotp(dg, dg) / _dotp(dx, dg)
            L = jnp.where(jnp.logical_and(st.k > 1, Lbb >= 0.0), Lbb, L)
        V = _tmap(lambda y, g: y - g / L, st.Y, grad)
        X = prob.prox_g(cfg, aux, params, V, L)
        objprv = st.objprv
        if opts.monotone:
            obj = eval_obj(X)[0]
            revert = jnp.logical_and(st.k > 0, objprv < obj)
            ZZ = X
            X = _tmap(lambda a, b: jnp.where(revert, b, a), X, st.X)
            obj = jnp.where(revert, objprv, obj)
            objprv = obj
        tprv = st.t
        t = _momentum_update(opts, st.t, st.k)
        if opts.monotone:
            Y = _tmap(lambda x, z, xp: x + (tprv / t) * (z - x)
                      + ((tprv - 1.0) / t) * (x - xp), X, ZZ, st.X)
        else:
            Y = _tmap(lambda x, xp: x + ((tprv - 1.0) / t) * (x - xp),
                      X, st.X)
        nanv = jnp.asarray(jnp.nan, st.L.dtype)
        return st._replace(X=X, Y=Y, Xprv=st.X, Gprv=grad, t=t, L=L,
                           objprv=objprv), (nanv, nanv,
                                            jnp.asarray(0, jnp.int32))

    def bt_standard_step(st):
        """Standard backtracking (beck-2009-fast): increase L until the
        majorisation F <= Q holds, then the usual momentum y-step."""
        grad = prob.grad_f(cfg, aux, params, st.Y)
        fY = prob.obfn_f(cfg, aux, params, st.Y)

        def trial(L):
            V = _tmap(lambda y, g: y - g / L, st.Y, grad)
            X = prob.prox_g(cfg, aux, params, V, L)
            F = prob.obfn_f(cfg, aux, params, X)
            Dxy = _tmap(lambda a, b: a - b, X, st.Y)
            Q = fY + _dotp(Dxy, grad) + (L / 2.0) * tree_norm(Dxy) ** 2
            return X, F, Q

        X0, F0, Q0 = trial(st.L)

        def bt_cond(c):
            _, F, Q, L, i = c
            return jnp.logical_and(F > Q, i < opts.bt_maxiter)

        def bt_body(c):
            _, _, _, L, i = c
            L = L * opts.bt_gamma_u
            X, F, Q = trial(L)
            return (X, F, Q, L, i + 1)

        X, F, Q, L, ibt = jax.lax.while_loop(
            bt_cond, bt_body, (X0, F0, Q0, st.L, jnp.asarray(1, jnp.int32)))
        tprv = st.t
        t = _momentum_update(opts, st.t, st.k)
        Y = _tmap(lambda x, xp: x + ((tprv - 1.0) / t) * (x - xp), X, st.X)
        return st._replace(X=X, Y=Y, Xprv=st.X, Gprv=grad, t=t, L=L), \
            (F, Q, ibt)

    def bt_robust_step(st):
        """Robust backtracking (florea-2017-robust): decrease L first,
        re-derive the extrapolation point inside the line search; the
        momentum extrapolation is embedded, so no separate y-step."""
        L0 = st.L * opts.bt_gamma_d
        gamma_u = opts.bt_gamma_u

        def trial(L):
            t = (1.0 + jnp.sqrt(1.0 + 4.0 * L * st.Tk)) / (2.0 * L)
            T = st.Tk + t
            y = _tmap(lambda xp, z: (st.Tk * xp + t * z) / T, st.X, st.Zrb)
            grad = prob.grad_f(cfg, aux, params, y)
            V = _tmap(lambda yy, g: yy - g / L, y, grad)
            X = prob.prox_g(cfg, aux, params, V, L)
            F = prob.obfn_f(cfg, aux, params, X)
            Dxy = _tmap(lambda a, b: a - b, X, y)
            Q = prob.obfn_f(cfg, aux, params, y) + _dotp(Dxy, grad) \
                + (L / 2.0) * tree_norm(Dxy) ** 2
            return X, y, grad, F, Q, t, T

        c0 = trial(L0) + (L0, jnp.asarray(1, jnp.int32))

        def bt_cond(c):
            F, Q, i = c[3], c[4], c[8]
            return jnp.logical_and(F > Q, i < opts.bt_maxiter)

        def bt_body(c):
            L = c[7] * gamma_u
            return trial(L) + (L, c[8] + 1)

        X, y, grad, F, Q, t, T, L, ibt = jax.lax.while_loop(
            bt_cond, bt_body, c0)
        Zrb = _tmap(lambda z, x, yy: z + t * L * (x - yy), st.Zrb, X, y)
        return st._replace(X=X, Y=y, Xprv=st.X, Gprv=grad, Zrb=Zrb,
                           t=t, Tk=T, L=L), (F, Q, ibt)

    def body(st):
        Yprv = st.Y
        if opts.backtrack == "standard":
            st2, bt = bt_standard_step(st)
        elif opts.backtrack == "robust":
            st2, bt = bt_robust_step(st)
        else:
            st2, bt = plain_step(st)
        # fixed-point residual (sporco/pgm/pgm.py:696-702)
        if opts.monotone:
            rsdl = tree_norm(_tmap(lambda a, b: a - b, st2.X, st2.Y))
        else:
            rsdl = tree_norm(_tmap(lambda a, b: a - b, st2.X, Yprv))
        row_idx = st.k - k0
        if opts.fast_solve:
            objv = (jnp.nan,) * len(prob.stat_names)
        else:
            objv = eval_obj(st2.X)
        F, Q, ibt = bt
        row = jnp.stack([jnp.float32(st.k)]
                        + [jnp.float32(o) for o in objv]
                        + [jnp.float32(rsdl), jnp.float32(F),
                           jnp.float32(Q), jnp.float32(ibt),
                           jnp.float32(st2.L)])
        stats = jax.lax.dynamic_update_slice(
            st.stats, row[None, :], (row_idx, jnp.zeros_like(row_idx)))
        if opts.verbose:
            jax.debug.print("it {k}  obj {o:.4e}  rsdl {r:.3e}  L {L:.3e}",
                            k=st.k, o=row[1], r=rsdl, L=st2.L)
        return st2._replace(k=st.k + 1, rsdl=rsdl, stats=stats)

    # per-step while_loop overhead amortisation with exact cond guards
    # (same scheme and rationale as solvers/admm.py:_admm_run)
    unroll = 4 if jax.default_backend() in ("tpu", "axon") else 1

    def body_unrolled(st):
        st = body(st)
        for _ in range(unroll - 1):
            st = jax.lax.cond(cond(st), body, lambda s: s, st)
        return st

    return jax.lax.while_loop(cond, body_unrolled, state)


def pgm_solve(prob, cfg, params, opts, state):
    """Run one (re-entrant) PGM solve call; returns the final state.
    Traced under ``default_matmul_precision('highest')`` -- same
    rationale as :func:`sporco_tpu.solvers.admm.admm_solve`."""
    with jax.default_matmul_precision("highest"):
        return _pgm_run(prob, cfg, params, opts, state)


def pgm_iterstats(prob, state, k_start=0):
    names = ("Iter",) + tuple(prob.stat_names) + \
        ("Rsdl", "F_Btrack", "Q_Btrack", "IterBTrack", "L")
    return IterStats(names, state.stats, int(state.k) - int(k_start))
