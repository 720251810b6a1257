"""Filter-parallel CSC: ParConvBPDN (skau-2018-fast).

Capability parity with ``sporco/admm/parcbpdn.py:353``: the M dictionary
filters are partitioned into L groups with ADMM constraint
``(D_G0; ...; D_G(L-1); alpha I) x = (y0_0; ...; y0_(L-1); alpha y1)``;
every step is independent per group except the coupled ``y0`` solve,
which reduces to a single sum over the group axis with a cached inverse
off-diagonal element (``parcbpdn.py:182-205``).

TPU mapping (SURVEY.md §2.10(2)): the reference runs groups in a
process pool over shared memory; here the group axis is a leading array
axis -- every per-group step is one batched op, the ``y0`` coupling is
a sum over that axis, and the whole iteration is a jitted
``lax.while_loop``.  With ``mesh=``, the group axis is sharded over the
mesh ``"filter"`` axis (model/tensor parallelism over dictionary
filters): XLA lowers the two cross-group sums per iteration (the
``y0`` coupling and the objective reconstruction) to ICI all-reduces --
exactly the reference's single serial merge point per iteration.
Supports the optional fidelity mask ``W`` (``parcbpdn.py:365-385``).

Residual and stopping semantics mirror the reference exactly
(``parcbpdn.py:318-352, 783-819``): unnormalised residuals
``r = sqrt(sum_g ||DX_g - Y0_g||^2 + alpha^2 ||X - Y1||^2)``,
``s = sqrt(||Y0prev - Y0||^2 + alpha^2 ||Y1prev - Y1||^2)`` (the
reference's non-standard rho-free dual residual), tested against
``epri/edua`` built from AbsStopTol/RelStopTol; no adaptive rho (the
reference ships it commented out).
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec

from sporco_tpu import cnvrep as cr
from sporco_tpu.ops import fft as sf
from sporco_tpu.ops import linalg as sl
from sporco_tpu.ops import prox as sp
from sporco_tpu import refopts
from sporco_tpu.models.common import ADMMModel, device_sync
from sporco_tpu.models.cbpdn import _max_abs_dhs
from sporco_tpu.solvers.admm import ADMMOpts, AutoRhoOpts, IterStats

__all__ = ["ParConvBPDN"]

_STAT_NAMES = ("Iter", "ObjFun", "DFid", "RegL1", "PrimalRsdl",
               "DualRsdl", "EPrimal", "EDual", "Rho")


@dataclass(frozen=True)
class ParCfg:
    cri: cr.CSCIndex
    ngrp: int
    non_neg: bool = False
    no_bndry: bool = False
    max_iter: int = 100
    rel_stop_tol: float = 1e-3
    abs_stop_tol: float = 0.0
    fast_solve: bool = False


@partial(jax.jit, static_argnums=(0,))
def _par_solve(cfg, params, state):
    cri = cfg.cri
    L = cfg.ngrp
    axes = tuple(range(-cri.dimN, 0))
    Nv = cri.Nv
    S = params["S"]                       # (K, C, 1, Nv)
    rho = params["rho"]
    alpha = params["alpha"]
    W = params["W"]
    W2 = W ** 2
    inv_off_diag = -W2 / (rho * (rho + W2 * L))
    SW = W2 * S          # the reference's mp_S (parcbpdn.py:636)
    lmbda = params["lmbda"]

    # grouped dictionary spectrum: (L, 1, 1, Mg, f...)
    Dg = params["D"]
    Dfg = sf.rfftn(Dg, s=Nv, axes=axes)
    DHDg = jnp.sum((Dfg * jnp.conj(Dfg)).real, axis=3, keepdims=True)

    k0 = state[6]
    kmax = k0 + cfg.max_iter
    # constraint/dual space sizes for the AbsStopTol terms
    # (sqrt(Nc), sqrt(Nx) of parcbpdn.py:790-795)
    nY0 = L * cri.K * cri.C * int(np.prod(Nv))
    nY1 = L * cri.K * (cri.M // L) * int(np.prod(Nv))
    rtNc = jnp.sqrt(jnp.float32(nY0 + nY1)).astype(S.dtype)
    rtNx = rtNc

    def cond(st):
        k, r, s, epri, edua = st[6], st[7], st[8], st[9], st[10]
        return jnp.logical_and(
            k < kmax,
            jnp.logical_not(jnp.logical_and(r <= epri, s <= edua)))

    def body(st):
        Y0, U0, Y1, U1, X, DX, k, _, _, _, _, stats = st
        # --- x-step per group (parcbpdn.py:132-161); the AL rho
        # cancels, leaving (D_g^H D_g + alpha^2 I) ---
        YU0f = sf.rfftn(Y0 - U0, axes=axes)
        YU1f = sf.rfftn(Y1 - U1 / alpha, axes=axes)
        b = jnp.conj(Dfg) * YU0f + alpha ** 2 * YU1f
        Xf = sl.solvedbi_sm(Dfg, alpha ** 2, b, axis=3, aah=DHDg)
        Xnew = sf.irfftn(Xf, s=Nv, axes=axes)          # (L,K,1,Mg,Nv)
        DXf = jnp.sum(Dfg * Xf, axis=3, keepdims=True)
        DXnew = sf.irfftn(DXf, s=Nv, axes=axes)        # (L,K,C,1,Nv)
        Xnr, DXnr = Xnew, DXnew
        # relax (parcbpdn.py:164-179)
        rlx = params["rlx"]
        Xr = rlx * Xnew + (1 - rlx) * Y1
        DXr = rlx * DXnew + (1 - rlx) * Y0

        # --- the single serial merge: coupled y0 solve
        # (parcbpdn.py:182-205) -- a sum over the (sharded) group axis,
        # lowered to an all-reduce on a mesh ---
        b0 = inv_off_diag * jnp.sum(SW + rho * (DXr + U0), axis=0,
                                    keepdims=True)
        Y0n = SW / rho + DXr + U0 + b0

        # --- y1 / u steps per group (parcbpdn.py:208-265) ---
        XU1 = Xr + U1 / alpha
        gamma = lmbda / (alpha ** 2 * rho) * params["wl1"]
        Y1n = sp.prox_l1(XU1, gamma)
        if cfg.non_neg:
            Y1n = jnp.maximum(Y1n, 0.0)
        if cfg.no_bndry:
            for n in range(cri.dimN):
                end = cri.dsz[n] - 1
                if end > 0:
                    sl_ = (Ellipsis,) + (slice(-end, None),) + \
                        (slice(None),) * (cri.dimN - 1 - n)
                    Y1n = Y1n.at[sl_].set(0.0)
        U0n = U0 + DXr - Y0n
        U1n = U1 + alpha * (Xr - Y1n)

        # --- residuals (parcbpdn.py:318-352, 783-795): unnormalised,
        # with epri/edua thresholds; group sums reduced ---
        if cfg.fast_solve:
            r = s = jnp.asarray(jnp.inf, S.dtype)
            epri = edua = jnp.asarray(0.0, S.dtype)
        else:
            ry = jnp.sum((DXnr - Y0n) ** 2) \
                + alpha ** 2 * jnp.sum((Xnr - Y1n) ** 2)
            sy = jnp.sum((Y0 - Y0n) ** 2) \
                + alpha ** 2 * jnp.sum((Y1 - Y1n) ** 2)
            nrmAx = jnp.sqrt(jnp.sum(DXnr ** 2)
                             + alpha ** 2 * jnp.sum(Xnr ** 2))
            nrmBy = jnp.sqrt(jnp.sum(Y0n ** 2)
                             + alpha ** 2 * jnp.sum(Y1n ** 2))
            nrmu = jnp.sqrt(jnp.sum(U0n ** 2) + jnp.sum(U1n ** 2))
            r = jnp.sqrt(ry)
            s = jnp.sqrt(sy)
            epri = rtNc * cfg.abs_stop_tol \
                + jnp.maximum(nrmAx, nrmBy) * cfg.rel_stop_tol
            edua = rtNx * cfg.abs_stop_tol + nrmu * cfg.rel_stop_tol

        # --- objective (fEvalX dfd / gEvalY reg defaults,
        # parcbpdn.py:883-917) + stats row ---
        if cfg.fast_solve:
            obj = dfd = rl1 = jnp.nan
        else:
            DXsum = jnp.sum(DXnew, axis=0)             # all-reduce
            dfd = 0.5 * jnp.sum((W * (DXsum - S)) ** 2)
            rl1 = jnp.sum(jnp.abs(params["wl1"] * Y1n))
            obj = dfd + lmbda * rl1
        row = jnp.stack([jnp.float32(k), jnp.float32(obj),
                         jnp.float32(dfd), jnp.float32(rl1),
                         jnp.float32(r), jnp.float32(s),
                         jnp.float32(epri), jnp.float32(edua),
                         jnp.float32(rho)])
        stats = jax.lax.dynamic_update_slice(
            stats, row[None, :], (k - k0, jnp.zeros_like(k)))

        return (Y0n, U0n, Y1n, U1n, Xnew, DXnew, k + 1, r, s, epri,
                edua, stats)

    return jax.lax.while_loop(cond, body, state)


class ParConvBPDN(ADMMModel):
    r"""Filter-parallel CSC solver (+ optional fidelity mask).

    ``ngrp`` is the number of filter groups L (must divide M; it is
    reduced to the nearest divisor otherwise).  With ``mesh=``, the
    leading group axis is sharded over the mesh ``"filter"`` axis.
    """

    # reference ParConvBPDN option keys (sporco/admm/parcbpdn.py:418-427)
    REF_OPT_EXTRA = {
        **refopts._ADMM_EQUAL,
        "AuxVarObj": refopts.IGNORE,
        "HighMemSolve": refopts.IGNORE,
        "LinSolveCheck": refopts.WARN,
        "NonNegCoef": ("k", "non_neg"),
        "NoBndryCross": ("k", "no_bndry"),
        "L1Weight": ("k", "wl1"),
        "alpha": ("k", "alpha"),
        "Y1": refopts.WARN,
        "U1": refopts.WARN,
    }

    @staticmethod
    def options(**kw):
        return ADMMOpts(**{**dict(relax_param=1.8,
                                  auto_rho=AutoRhoOpts(enabled=False)),
                           **kw})

    def __init__(self, D, S, lmbda=None, W=None, opt=None, ngrp=None,
                 alpha=None, dimK=None, dimN=2, wl1=1.0, non_neg=False,
                 no_bndry=False, dtype=jnp.float32, mesh=None):
        super().__init__()
        if opt is None:
            opt = self.options()
        D = jnp.asarray(D, dtype)
        S = jnp.asarray(S, dtype)
        cri = cr.csc_index(D.shape, S.shape, dimK=dimK, dimN=dimN)
        if cri.Cd > 1:
            raise NotImplementedError("multi-channel dictionaries not "
                                      "supported by ParConvBPDN")
        self.cri = cri
        Di = cr.to_internal_D(D, cri)
        Si = cr.to_internal_S(S, cri)
        if lmbda is None:
            lmbda = 0.1 * float(_max_abs_dhs(Di, Si, jnp.zeros(cri.Nv)))
        self.lmbda = lmbda
        if ngrp is None:
            ngrp = min(16, cri.M)
        while cri.M % ngrp != 0:
            ngrp -= 1
        self.ngrp = ngrp
        Mg = cri.M // ngrp
        self.cfg = ParCfg(cri=cri, ngrp=ngrp, non_neg=non_neg,
                          no_bndry=no_bndry, max_iter=opt.max_iter,
                          rel_stop_tol=opt.rel_stop_tol,
                          abs_stop_tol=opt.abs_stop_tol,
                          fast_solve=opt.fast_solve)
        self.opts = opt.replace(dtype=dtype)
        # group the filter axis: (1, 1, M, dsz) -> (L, 1, 1, Mg, dsz)
        Dgrp = Di.reshape((1, 1, ngrp, Mg) + Di.shape[3:])
        Dgrp = jnp.moveaxis(Dgrp, 2, 0)
        if W is None:
            W = jnp.ones((1,) * (3 + dimN), dtype)
        else:
            W = cr.fidelity_mask(jnp.asarray(W, dtype), cri)
        rho0 = opt.rho if opt.rho is not None else 50.0 * lmbda + 1.0
        wl1a = jnp.asarray(wl1, dtype)
        self.params = {
            "D": Dgrp, "S": Si, "W": W,
            "lmbda": jnp.asarray(lmbda, dtype),
            "rho": jnp.asarray(rho0, dtype),
            "alpha": jnp.asarray(1.0 if alpha is None else alpha,
                                 dtype),
            "rlx": jnp.asarray(opt.relax_param, dtype),
            "wl1": wl1a,
        }
        L = ngrp
        shp0 = (L, cri.K, cri.C, 1) + tuple(cri.Nv)
        shp1 = (L, cri.K, 1, Mg) + tuple(cri.Nv)
        self.mesh = mesh
        if mesh is None:
            z = lambda shp: jnp.zeros(shp, dtype)
        else:
            fsh = lambda nd: NamedSharding(
                mesh, PartitionSpec("filter", *([None] * (nd - 1))))
            z = lambda shp: jnp.zeros(shp, dtype,
                                      device=fsh(len(shp)))
            self.params["D"] = jax.device_put(self.params["D"],
                                              fsh(Dgrp.ndim))
        self.k_start = 0
        self.state = (z(shp0), z(shp0),
                      z(shp1), z(shp1),
                      z(shp1), z(shp0),
                      jnp.asarray(0, jnp.int32),
                      jnp.asarray(jnp.inf, dtype),
                      jnp.asarray(jnp.inf, dtype),
                      jnp.asarray(0.0, dtype),
                      jnp.asarray(0.0, dtype),
                      jnp.full((opt.max_iter, len(_STAT_NAMES)),
                               jnp.nan, jnp.float32))
        self._init_done()

    def solve(self):
        self.timer.start("solve")
        self.k_start = int(self.state[6])
        # fresh stats window per solve call (re-entrant semantics)
        self.state = self.state[:11] + (
            jnp.full((self.cfg.max_iter, len(_STAT_NAMES)), jnp.nan,
                     jnp.float32),)
        self.state = _par_solve(self.cfg, self.params, self.state)
        device_sync(self.state)
        self.timer.stop("solve")
        return self.getmin()

    def getmin(self):
        return self.getcoef()

    def getcoef(self):
        # (L, K, 1, Mg, Nv) -> internal (K, 1, M, Nv) -> user layout
        Y1 = self.state[2]
        L, K = Y1.shape[0], Y1.shape[1]
        Xi = jnp.moveaxis(Y1, 0, 2).reshape(
            (K, 1, self.cri.M) + tuple(self.cri.Nv))
        return cr.from_internal_X(Xi, self.cri)

    def getitstat(self):
        """Per-iteration statistics (standard contract: same fields as
        the generic ADMM driver, ``sporco/admm/parcbpdn.py:798-802``)."""
        nvalid = int(self.state[6]) - self.k_start
        return IterStats(_STAT_NAMES, self.state[11], nvalid)

    @property
    def itstat(self):
        return self.getitstat()

    def reconstruct(self, X=None):
        from sporco_tpu.models.cbpdn import _reconstruct_jit, \
            _internal_S_to_user
        if X is None:
            Y1 = self.state[2]
            K = Y1.shape[1]
            Xi = jnp.moveaxis(Y1, 0, 2).reshape(
                (K, 1, self.cri.M) + tuple(self.cri.Nv))
        else:
            Xi = cr.to_internal_X(jnp.asarray(X), self.cri)
        Di = jnp.moveaxis(self.params["D"], 0, 2).reshape(
            (1, 1, self.cri.M) + self.params["D"].shape[4:])
        Si = _reconstruct_jit(Di, Xi, jnp.zeros(self.cri.Nv))
        return _internal_S_to_user(Si, self.cri)
