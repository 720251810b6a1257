"""Convolutional sparse coding (CSC) via ADMM: the ConvBPDN family.

Capability parity with ``sporco/admm/cbpdn.py``: :class:`ConvBPDN`
(``:386``), :class:`ConvBPDNJoint` (``:636``), :class:`ConvElasticNet`
(``:813``), :class:`ConvBPDNGradReg` (``:992``), :class:`ConvBPDNProjL1`
(``:1220``), and the two-block constrained variants
:class:`ConvBPDNMaskDcpl` (``:2066``), :class:`ConvL1L1Grd` (``:2488``),
:class:`ConvMinL1InL2Ball` (``:1830``), plus the additive mask
simulation wrapper :class:`AddMaskSim` (``:2287``) re-expressed as
explicit problem composition.

The hot loop (``sporco/admm/cbpdn.py:267-311``) -- forward rfft of
``Y - U``, per-DFT-bin Sherman-Morrison solve over the filter axis,
inverse rfft, shrinkage -- runs entirely inside the jitted
``lax.while_loop``; XLA fuses the elementwise chains around the TPU FFT.
No Sherman-Morrison cache is carried (the reference's ``HighMemSolve``):
recomputing the rank-1 cache per iteration is a single fused elementwise
pass and makes adaptive rho free.

Layout: internal arrays are ``(K, C, M, N0, N1)`` (spatial trailing, see
:mod:`sporco_tpu.cnvrep`); user-facing D/S/X follow the reference's
conventions.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

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
from sporco_tpu.utils.signal import gradient_filters

__all__ = ["ConvBPDN", "ConvBPDNJoint", "ConvElasticNet",
           "ConvBPDNGradReg", "ConvBPDNProjL1", "ConvBPDNMaskDcpl",
           "ConvL1L1Grd", "ConvMinL1InL2Ball", "AddMaskSim",
           "MultiDictConvBPDN"]


@dataclass(frozen=True)
class CSCConfig:
    cri: cr.CSCIndex
    variant: str = "l1"       # l1|joint|elastic|gradreg|projl1
    non_neg: bool = False
    no_bndry: bool = False
    obj_from_x: bool = True   # AuxVarObj=False semantics (cbpdn default)
    lin_check: bool = False
    ams_nimp: int = 0         # >0: last ams_nimp filters are AMS impulses
    real: bool = True         # complex-input dispatch (the analogue of
                              # sporco/admm/cbpdn.py:213-217)


# --- shared DFT-domain pieces ---------------------------------------------

def _fftaxes(cri):
    return tuple(range(-cri.dimN, 0))


def _fwd(cfg):
    return sf.rfftn if cfg.real else sf.fftn


def _inv(cfg, xf, Nv, axes):
    if cfg.real:
        return sf.irfftn(xf, s=Nv, axes=axes)
    return sf.ifftn(xf, s=Nv, axes=axes)


def _pnorm2(cfg, xf, Nv, axes):
    """Parseval norm matching the bound transform family."""
    if cfg.real:
        return sf.rfl2norm2(xf, Nv, axis=axes)
    return sf.fl2norm2(xf, axis=axes)


def _csc_setup(cfg, params):
    cri = cfg.cri
    axes = _fftaxes(cri)
    Df = _fwd(cfg)(params["D"], s=cri.Nv, axes=axes)
    Sf = _fwd(cfg)(params["S"], axes=axes)
    DSf = jnp.conj(Df) * Sf
    if cri.Cd > 1:
        DSf = jnp.sum(DSf, axis=1, keepdims=True)
    aux = {"Df": Df, "Sf": Sf, "DSf": DSf}
    if cri.Cd == 1:
        # rho-independent per-bin dictionary energy for the SM solve
        aux["DHD"] = jnp.sum((Df * jnp.conj(Df)).real, axis=2,
                             keepdims=True)
    if cfg.variant == "gradreg":
        _, GHGf = gradient_filters(cri.dimN, cri.Nv,
                                   dtype=params["D"].dtype)
        aux["GHGfW"] = params["wgrd"] * GHGf
    return aux


def _sm_solve(cfg, aux, d_or_rho, b, diagonal=False):
    """Per-bin solve of ``(rho I + D^H D) x = b`` (or with a diagonal
    term), dispatching on channel structure like
    ``sporco/admm/cbpdn.py:275-293``."""
    cri = cfg.cri
    Df = aux["Df"]
    if cri.Cd == 1:
        if diagonal:
            return sl.solvedbd_sm(Df, d_or_rho, b, axis=2)
        return sl.solvedbi_sm(Df, d_or_rho, b, axis=2,
                              aah=aux.get("DHD"))
    return sl.solvemdbi_ism(Df, d_or_rho, b, axisM=2, axisK=1)


def _xrrs(cfg, aux, Xf, b, rho_diag):
    """Inner linear-solve relative residual (LinSolveCheck,
    ``sporco/admm/cbpdn.py:283-293``)."""
    cri = cfg.cri
    Df = aux["Df"]
    DXf = jnp.sum(Df * Xf, axis=2, keepdims=True)
    if cri.Cd == 1:
        DHDXf = jnp.conj(Df) * DXf
    else:
        DHDXf = jnp.sum(jnp.conj(Df) * DXf, axis=1, keepdims=True)
    return sl.rrs(DHDXf + rho_diag * Xf, b)


def _csc_xstep(cfg, aux, params, state):
    cri = cfg.cri
    axes = _fftaxes(cri)
    rho = state.rho
    YU = state.Y - state.U
    b = aux["DSf"] + rho * _fwd(cfg)(YU, axes=axes)
    if cfg.variant == "elastic":
        rho_s = rho + params["mu"]
        Xf = _sm_solve(cfg, aux, rho_s, b)
        diag = rho_s
    elif cfg.variant == "gradreg":
        d = params["mu"] * aux["GHGfW"] + rho
        Xf = _sm_solve(cfg, aux, d, b, diagonal=(cri.Cd == 1))
        diag = d
    else:
        Xf = _sm_solve(cfg, aux, rho, b)
        diag = rho
    X = _inv(cfg, Xf, cri.Nv, axes)
    xaux = {"Xf": Xf}
    if cfg.lin_check:
        xaux["xrrs"] = _xrrs(cfg, aux, Xf, b, diag)
    return X, xaux


def _apply_masks(cfg, Y):
    if cfg.non_neg:
        Y = jnp.maximum(Y, 0.0)
    if cfg.no_bndry:
        for n in range(cfg.cri.dimN):
            end = cfg.cri.dsz[n] - 1
            if end > 0:
                sl_ = (Ellipsis,) + (slice(-end, None),) + \
                    (slice(None),) * (cfg.cri.dimN - 1 - n)
                Y = Y.at[sl_].set(0.0)
    return Y


def _csc_ystep(cfg, aux, params, state, AXU):
    rho = state.rho
    if cfg.variant == "projl1":
        axes = (2,) + tuple(range(3, 3 + cfg.cri.dimN))
        Y = sp.proj_l1(AXU, params["gamma"], axis=axes)
    elif cfg.variant == "joint":
        Y = sp.prox_sl1l2(AXU, (params["lmbda"] / rho) * params["wl1"],
                          (params["mu"] / rho) * params["wl21"], axis=1)
    else:
        Y = sp.prox_l1(AXU, (params["lmbda"] / rho) * params["wl1"])
    Y = _apply_masks(cfg, Y)
    if cfg.ams_nimp > 0:
        # Additive Mask Simulation: the impulse coefficient maps take
        # the unshrunk value (1 - W) * (AX + U), i.e. they absorb the
        # residual only where the mask is zero
        # (sporco/admm/cbpdn.py:2392-2404)
        ni = cfg.ams_nimp
        Yams = (1.0 - params["Wams"]) * AXU[:, :, -ni:]
        Y = jnp.concatenate([Y[:, :, :-ni], Yams], axis=2)
    return Y


def _csc_dfd(cfg, aux, fvarf):
    """Data fidelity ``(1/2)||sum_m d_m * x_m - s||^2`` in the DFT
    domain with Parseval correction (``sporco/admm/cbpdn.py:337``)."""
    DXf = jnp.sum(aux["Df"] * fvarf, axis=2, keepdims=True)
    return 0.5 * _pnorm2(cfg, DXf - aux["Sf"], cfg.cri.Nv,
                         tuple(range(-cfg.cri.dimN, 0)))


def _csc_obfn(cfg, aux, params, state, xaux):
    cri = cfg.cri
    axes = _fftaxes(cri)
    if cfg.obj_from_x:
        fvarf = xaux["Xf"]
        gvar = state.X
    else:
        fvarf = _fwd(cfg)(state.Y, axes=axes)
        gvar = state.Y
    dfd = _csc_dfd(cfg, aux, fvarf)
    xr = xaux.get("xrrs", jnp.nan) if cfg.lin_check else jnp.nan
    if cfg.variant == "projl1":
        axs = (2,) + tuple(range(3, 3 + cri.dimN))
        prj = sp.proj_l1(gvar, params["gamma"], axis=axs)
        cns = jnp.linalg.norm((prj - gvar).ravel())
        return (dfd, cns, xr)
    rl1 = jnp.sum(jnp.abs(params["wl1"] * gvar))
    if cfg.variant == "joint":
        rl21 = jnp.sum(params["wl21"]
                       * jnp.sqrt(jnp.sum(jnp.abs(gvar) ** 2, axis=1)))
        return (dfd + params["lmbda"] * rl1 + params["mu"] * rl21,
                dfd, rl1, rl21, xr)
    if cfg.variant == "elastic":
        rl2 = 0.5 * jnp.sum(gvar ** 2)
        return (dfd + params["lmbda"] * rl1 + params["mu"] * rl2,
                dfd, rl1, rl2, xr)
    if cfg.variant == "gradreg":
        rgr = 0.5 * sf.rfl2norm2(jnp.sqrt(aux["GHGfW"]) * fvarf, cri.Nv,
                                 axis=axes)
        return (dfd + params["lmbda"] * rl1 + params["mu"] * rgr,
                dfd, rl1, rgr, xr)
    return (dfd + params["lmbda"] * rl1, dfd, rl1, xr)


def _csc_yinit(cfg, params):
    return jnp.zeros(cfg.cri.shpX, params["S"].dtype)


def _csc_uinit(cfg, params):
    return jnp.zeros(cfg.cri.shpX, params["S"].dtype)


_STATS = {
    "l1": ("ObjFun", "DFid", "RegL1", "XSlvRelRes"),
    "joint": ("ObjFun", "DFid", "RegL1", "RegL21", "XSlvRelRes"),
    "elastic": ("ObjFun", "DFid", "RegL1", "RegL2", "XSlvRelRes"),
    "gradreg": ("ObjFun", "DFid", "RegL1", "RegGrad", "XSlvRelRes"),
    "projl1": ("DFid", "Cnstr", "XSlvRelRes"),
}

_CSC_PROBLEMS = {
    v: ADMMProblem(setup=_csc_setup, xstep=_csc_xstep, ystep=_csc_ystep,
                   obfn=_csc_obfn, yinit=_csc_yinit, uinit=_csc_uinit,
                   stat_names=names)
    for v, names in _STATS.items()
}


@jax.jit
def _max_abs_dhs(D, S, Nv_dummy):
    """``max |D^H S|`` for the default lmbda heuristic
    (``sporco/admm/cbpdn.py:573-578``); jitted so the complex
    intermediates never cross the jit boundary."""
    axes = tuple(range(-(Nv_dummy.ndim), 0))
    if jnp.iscomplexobj(D) or jnp.iscomplexobj(S):
        Df = sf.fftn(D, s=Nv_dummy.shape, axes=axes)
        Sf = sf.fftn(S, axes=axes)
    else:
        Df = sf.rfftn(D, s=Nv_dummy.shape, axes=axes)
        Sf = sf.rfftn(S, axes=axes)
    return jnp.max(jnp.abs(jnp.conj(Df) * Sf))


class ConvBPDN(ADMMModel):
    r"""ADMM CSC solver: ``argmin_x (1/2)||sum_m d_m * x_m - s||_2^2
    + lmbda sum_m ||x_m||_1`` (``sporco/admm/cbpdn.py:386``).

    ``D`` has user shape ``dsz + [Cd] + (M,)``, ``S`` has
    ``Nv + [C] + [K]``; the returned coefficient array has the
    reference's layout ``Nv + (Cx, K, M)``.

    Defaults mirror the reference: RelaxParam 1.8, AutoRho enabled with
    Period 1 + AutoScaling, rho = 50 lmbda + 1, lmbda = 0.1 max|D^H S|
    (``sporco/admm/cbpdn.py:127-133,573-593``).
    """

    VARIANT = "l1"

    # reference GenericConvBPDN/ConvBPDN option keys
    # (sporco/admm/cbpdn.py:104-134,484-495)
    REF_OPT_EXTRA = {
        **refopts._ADMM_EQUAL,
        "AuxVarObj": ("k", "obj_from_x", refopts._not),
        "HighMemSolve": refopts.IGNORE,   # no cached-factor trade-off here
        "LinSolveCheck": ("k", "lin_check"),
        "NonNegCoef": ("k", "non_neg"),
        "NoBndryCross": ("k", "no_bndry"),
        "L1Weight": ("k", "wl1"),
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

    def __init__(self, D, S, lmbda=None, opt=None, dimK=None, dimN=2,
                 wl1=1.0, mu=0.0, wl21=1.0, wgrd=1.0, gamma=None,
                 non_neg=False, no_bndry=False, lin_check=False,
                 dtype=jnp.float32, Y0=None, U0=None, fused="auto",
                 obj_from_x=True):
        super().__init__()
        self._fused = fused
        if opt is None:
            opt = self.options()
        # complex-input dispatch (sporco/admm/cbpdn.py:213-217)
        real = not (jnp.iscomplexobj(jnp.asarray(D))
                    or jnp.iscomplexobj(jnp.asarray(S)))
        if not real:
            dtype = sf.complex_dtype(dtype)
        D = jnp.asarray(D, dtype)
        S = jnp.asarray(S, dtype)
        cri = cr.csc_index(D.shape, S.shape, dimK=dimK, dimN=dimN)
        self.cri = cri
        Di = cr.to_internal_D(D, cri)
        Si = cr.to_internal_S(S, cri)
        if lmbda is None and self.VARIANT in ("l1", "joint", "elastic",
                                              "gradreg"):
            lmbda = 0.1 * float(_max_abs_dhs(Di, Si,
                                             jnp.zeros(cri.Nv)))
        self.lmbda = lmbda
        self.cfg = CSCConfig(cri=cri, variant=self.VARIANT,
                             non_neg=non_neg, no_bndry=no_bndry,
                             lin_check=lin_check, real=real,
                             obj_from_x=obj_from_x)
        self.opts = opt.replace(dtype=dtype)
        rdt = sf.real_dtype(dtype)
        wl1a = jnp.asarray(wl1, rdt)
        if wl1a.ndim > 0:
            wl1a = cr.l1_weight(wl1a, cri)
        self.params = {
            "D": Di, "S": Si,
            "lmbda": jnp.asarray(0.0 if lmbda is None else lmbda, rdt),
            "wl1": wl1a,
            "mu": jnp.asarray(mu, rdt),
            "wl21": jnp.asarray(wl21, rdt),
            "wgrd": _wgrd_internal(wgrd, cri, rdt),
            "gamma": jnp.asarray(0.0 if gamma is None else gamma, rdt),
        }
        self.problem = _CSC_PROBLEMS[self.VARIANT]
        lm = lmbda if lmbda is not None else 1.0
        rho0 = opt.rho if opt.rho is not None else 50.0 * lm + 1.0
        rho_xi = (opt.auto_rho.rsdl_target
                  if opt.auto_rho.rsdl_target is not None
                  else default_rho_xi(lm))
        if Y0 is not None:
            Y0 = cr.to_internal_X(jnp.asarray(Y0, dtype), cri)
        if U0 is not None:
            U0 = cr.to_internal_X(jnp.asarray(U0, dtype), cri)
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, rho_xi, Y0=Y0, U0=U0)
        self._init_done()

    def solve(self):
        """Run (or resume) the solve; routes through the fused
        spatial-Woodbury driver (:mod:`sporco_tpu.ops.fused_csc`, the
        ``sporco.cuda.cbpdn`` analogue: XLA convolutions/einsums in a
        packed polyphase layout inside one ``lax.while_loop``) when the
        configuration is eligible, else the generic jitted driver."""
        from sporco_tpu.ops import fused_csc
        solver = None
        if self._fused is not False:
            if fused_csc.eligible(self.cfg, self.params, self.opts,
                                  force=(self._fused is True
                                         and self.cri.C <= 1)):
                solver = fused_csc.cbpdn_solve
            elif fused_csc.cfold_eligible(self.cfg, self.params,
                                          self.opts,
                                          force=(self._fused is True)):
                # multi-channel signal, single-channel dictionary: the
                # channels are independent problems -- fold C into the
                # batch axis and run the fused driver (exact)
                solver = fused_csc.cbpdn_solve_cfold
        if solver is None:
            if self._fused is True:
                raise ValueError(
                    "fused=True requested, but this configuration is "
                    "not supported by the fused driver (directly or "
                    "via channel folding)")
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
        return cr.from_internal_X(self.state.Y, self.cri)

    def getcoef(self):
        return self.getmin()

    def getcoef_internal(self):
        """Internal-layout coefficients (dictionary-learning loop)."""
        return self.state.Y

    def setdict(self, D=None, internal=None):
        """Update the dictionary (dictionary-learning outer loop).
        ``internal`` takes a ``(1, Cd, M, dsz...)`` array directly."""
        if internal is not None:
            self.params = {**self.params, "D": internal}
        else:
            self.params = {**self.params,
                           "D": cr.to_internal_D(
                               jnp.asarray(D, self.opts.dtype), self.cri)}

    def reconstruct(self, X=None):
        """Reconstruct ``sum_m d_m * x_m`` (user S layout)."""
        Xi = self.state.Y if X is None \
            else cr.to_internal_X(jnp.asarray(X), self.cri)
        Si = _reconstruct_jit(self.params["D"], Xi,
                              jnp.zeros(self.cri.Nv))
        return _internal_S_to_user(Si, self.cri)


def _wgrd_internal(wgrd, cri, dtype):
    w = jnp.asarray(wgrd, dtype)
    if w.ndim == 1:   # per-filter weights -> broadcast on the M axis
        w = w.reshape((1, 1, w.shape[0]) + (1,) * cri.dimN)
    return w


@jax.jit
def _reconstruct_jit(D, X, Nv_dummy):
    axes = tuple(range(-(Nv_dummy.ndim), 0))
    if jnp.iscomplexobj(D) or jnp.iscomplexobj(X):
        Df = sf.fftn(D, s=Nv_dummy.shape, axes=axes)
        Xf = sf.fftn(X, axes=axes)
        DXf = jnp.sum(Df * Xf, axis=2, keepdims=True)
        return sf.ifftn(DXf, s=Nv_dummy.shape, axes=axes)
    Df = sf.rfftn(D, s=Nv_dummy.shape, axes=axes)
    Xf = sf.rfftn(X, axes=axes)
    DXf = jnp.sum(Df * Xf, axis=2, keepdims=True)
    return sf.irfftn(DXf, s=Nv_dummy.shape, axes=axes)


def _internal_S_to_user(Si, cri):
    """Internal ``(K, C, 1, Nv...)`` -> user ``Nv + [C] + [K]``."""
    Si = Si[:, :, 0]   # (K, C, Nv...)
    perm = tuple(range(2, 2 + cri.dimN)) + (1, 0)
    S = jnp.transpose(Si, perm)            # Nv + (C, K)
    if cri.dimK == 0:
        S = jnp.squeeze(S, axis=-1)        # drop singleton K
        if cri.dimC == 0:
            S = jnp.squeeze(S, axis=-1)    # drop singleton C (now last)
    elif cri.dimC == 0:
        S = jnp.squeeze(S, axis=-2)        # drop singleton C before K
    return S


class ConvBPDNJoint(ConvBPDN):
    r"""CSC with joint sparsity over channels: adds
    ``mu ||X||_{2,1}`` with the l2 norm over the channel axis
    (``sporco/admm/cbpdn.py:636``)."""
    VARIANT = "joint"
    REF_OPT_EXTRA = {"L21Weight": ("k", "wl21")}

    def __init__(self, D, S, lmbda=None, mu=0.0, opt=None, **kw):
        super().__init__(D, S, lmbda=lmbda, mu=mu, opt=opt, **kw)


class ConvElasticNet(ConvBPDN):
    r"""CSC elastic net: adds ``(mu/2)||x||_2^2``; the per-bin solve
    uses ``mu + rho`` (``sporco/admm/cbpdn.py:813,948-975``)."""
    VARIANT = "elastic"

    def __init__(self, D, S, lmbda=None, mu=0.0, opt=None, **kw):
        super().__init__(D, S, lmbda=lmbda, mu=mu, opt=opt, **kw)


class ConvBPDNGradReg(ConvBPDN):
    r"""CSC with gradient penalty ``(mu/2) sum_i ||G_i x||_2^2``; the
    per-bin solve has the diagonal term ``mu GHGf + rho`` via
    ``solvedbd_sm`` (``sporco/admm/cbpdn.py:992,1173-1201``).  ``wgrd``
    is the per-filter GradWeight array."""
    VARIANT = "gradreg"
    REF_OPT_EXTRA = {"GradWeight": ("k", "wgrd")}

    def __init__(self, D, S, lmbda=None, mu=0.0, opt=None, wgrd=1.0, **kw):
        super().__init__(D, S, lmbda=lmbda, mu=mu, opt=opt, wgrd=wgrd,
                         **kw)


class ConvBPDNProjL1(ConvBPDN):
    r"""CSC with an l1-ball constraint ``||x||_1 <= gamma`` per signal
    (``sporco/admm/cbpdn.py:1220,1373``)."""
    VARIANT = "projl1"

    @staticmethod
    def options(**kw):
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=True, period=1,
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
# Two-block constrained CSC: (D; I) x = (y0 + s; y1)
# (re-design of ConvTwoBlockCnstrnt, sporco/admm/cbpdn.py:1401: the
# reference concatenates blocks on the filter axis with a C/M axis swap;
# here Y/U are simply pytree tuples (signal-shaped y0, coef-shaped y1).)

@dataclass(frozen=True)
class CSC2Config:
    cri: cr.CSCIndex
    variant: str = "maskdcpl"   # maskdcpl | l1l1grd | minl2ball
    non_neg: bool = False
    no_bndry: bool = False


def _csc2_setup(cfg, params):
    cri = cfg.cri
    axes = _fftaxes(cri)
    Df = sf.rfftn(params["D"], s=cri.Nv, axes=axes)
    aux = {"Df": Df}
    if cfg.variant == "l1l1grd":
        _, GHGf = gradient_filters(cri.dimN, cri.Nv,
                                   dtype=params["D"].dtype)
        aux["GHGfW"] = params["wgrd"] * GHGf
    return aux


def _csc2_xstep(cfg, aux, params, state):
    cri = cfg.cri
    axes = _fftaxes(cri)
    Y0, Y1 = state.Y
    U0, U1 = state.U
    Df = aux["Df"]
    YU0f = sf.rfftn(Y0 - U0 + params["S"], axes=axes)
    YU1f = sf.rfftn(Y1 - U1, axes=axes)
    if cri.Cd == 1:
        b = jnp.conj(Df) * YU0f + YU1f
    else:
        b = jnp.sum(jnp.conj(Df) * YU0f, axis=1, keepdims=True) + YU1f
    if cfg.variant == "l1l1grd":
        d = (params["mu"] / state.rho) * aux["GHGfW"] + 1.0
        Xf = _sm_solve(cfg, aux, d, b, diagonal=(cri.Cd == 1))
    else:
        Xf = _sm_solve(cfg, aux, 1.0, b)
    X = sf.irfftn(Xf, s=cri.Nv, axes=axes)
    DXf = jnp.sum(Df * Xf, axis=2, keepdims=True)
    DX = sf.irfftn(DXf, s=cri.Nv, axes=axes)
    # the primal variable carries (X, DX) so cnst_A needs no extra FFTs
    return (X, DX), {"Xf": Xf}


def _csc2_cnst_a(cfg, aux, params, XDX):
    X, DX = XDX
    return (DX, X)


def _csc2_cnst_at(cfg, aux, params, V):
    cri = cfg.cri
    axes = _fftaxes(cri)
    V0, V1 = V
    V0f = sf.rfftn(V0, axes=axes)
    if cri.Cd == 1:
        DTV0f = jnp.conj(aux["Df"]) * V0f
    else:
        DTV0f = jnp.sum(jnp.conj(aux["Df"]) * V0f, axis=1, keepdims=True)
    DTV0 = sf.irfftn(DTV0f, s=cri.Nv, axes=axes)
    return DTV0 + V1


def _csc2_cnst_b(cfg, aux, params, Y):
    return jax.tree_util.tree_map(jnp.negative, Y)


def _csc2_cnst_c(cfg, aux, params):
    return (params["S"], 0.0 * params["S"][..., :1, :1])


def _csc2_ystep(cfg, aux, params, state, AXU):
    rho = state.rho
    A0, A1 = AXU
    v0 = A0 - params["S"]
    if cfg.variant == "minl2ball":
        # ball projection per signal/channel over spatial axes only
        # (sporco/admm/cbpdn.py:2019-2021)
        axs = tuple(range(3, 3 + cfg.cri.dimN))
        Y0 = sp.proj_l2(v0, params["epsilon"], axis=axs)
    elif cfg.variant == "l1l1grd":
        Y0 = sp.prox_l1(v0, params["W"] / rho)
    else:  # maskdcpl: prox of (1/2)||W y0||^2
        Y0 = rho * v0 / (params["W"] ** 2 + rho)
    Y1 = sp.prox_l1(A1, (params["lmbda"] / rho) * params["wl1"])
    cfg1 = CSCConfig(cri=cfg.cri, non_neg=cfg.non_neg,
                     no_bndry=cfg.no_bndry)
    Y1 = _apply_masks(cfg1, Y1)
    return (Y0, Y1)


def _csc2_obfn(cfg, aux, params, state, xaux):
    cri = cfg.cri
    X, DX = state.X
    err = DX - params["S"]
    rl1 = jnp.sum(jnp.abs(params["wl1"] * X))
    if cfg.variant == "minl2ball":
        axs = tuple(range(3, 3 + cri.dimN))
        prj = sp.proj_l2(err, params["epsilon"], axis=axs)
        cns = jnp.linalg.norm((prj - err).ravel())
        return (rl1, cns)
    if cfg.variant == "l1l1grd":
        dfd = jnp.sum(jnp.abs(params["W"] * err))
        rgr = 0.5 * sf.rfl2norm2(jnp.sqrt(aux["GHGfW"]) * xaux["Xf"],
                                 cri.Nv, axis=_fftaxes(cri))
        return (dfd + params["lmbda"] * rl1 + params["mu"] * rgr,
                dfd, rl1, rgr)
    dfd = 0.5 * jnp.sum((params["W"] * err) ** 2)
    return (dfd + params["lmbda"] * rl1, dfd, rl1)


def _csc2_yinit(cfg, params):
    return (jnp.zeros(cfg.cri.shpS, params["S"].dtype),
            jnp.zeros(cfg.cri.shpX, params["S"].dtype))


def _csc2_uinit(cfg, params):
    return _csc2_yinit(cfg, params)


def _csc2_xinit(cfg, params):
    return (jnp.zeros(cfg.cri.shpX, params["S"].dtype),
            jnp.zeros(cfg.cri.shpS, params["S"].dtype))


def _csc2_rsdl_s_dualfeas(cfg, aux, params, state, Yprev):
    """Two-block dual residual of the reference's ConvTwoBlockCnstrnt:
    ``rho A^T U`` (``sporco/admm/cbpdn.py:1814``), not the standard
    ``rho A^T B(Y - Yprev)``; ConvL1L1Grd restores the standard form
    (``sporco/admm/cbpdn.py:2753``)."""
    return state.rho * _csc2_cnst_at(cfg, aux, params, state.U)


def _csc2_rsdl_sn_u(cfg, aux, params, state):
    from sporco_tpu.solvers.admm import tree_norm
    return state.rho * tree_norm(state.U)


_CSC2_STATS = {
    "maskdcpl": ("ObjFun", "DFid", "RegL1"),
    "l1l1grd": ("ObjFun", "DFid", "RegL1", "RegGrad"),
    "minl2ball": ("ObjFun", "Cnstr"),
}

_CSC2_PROBLEMS = {
    v: ADMMProblem(setup=_csc2_setup, xstep=_csc2_xstep,
                   ystep=_csc2_ystep, obfn=_csc2_obfn,
                   cnst_a=_csc2_cnst_a, cnst_at=_csc2_cnst_at,
                   cnst_b=_csc2_cnst_b, cnst_c=_csc2_cnst_c,
                   yinit=_csc2_yinit, uinit=_csc2_uinit,
                   xinit=_csc2_xinit, stat_names=names,
                   rsdl_s=None if v == "l1l1grd" else _csc2_rsdl_s_dualfeas,
                   rsdl_sn=None if v == "l1l1grd" else _csc2_rsdl_sn_u)
    for v, names in _CSC2_STATS.items()
}


class ConvBPDNMaskDcpl(ADMMModel):
    r"""CSC with spatial mask via mask decoupling:
    ``argmin_x (1/2)||W(sum_m d_m * x_m - s)||_2^2 + lmbda||x||_1``
    (``sporco/admm/cbpdn.py:2066``).  ``W`` is the fidelity mask
    (any shape compatible with ``S``)."""

    VARIANT = "maskdcpl"

    # reference ConvTwoBlockCnstrnt/ConvBPDNMaskDcpl option keys
    # (sporco/admm/cbpdn.py:1493-1516,2131-2136)
    REF_OPT_EXTRA = {
        **refopts._ADMM_EQUAL,
        "AuxVarObj": refopts.IGNORE,
        "HighMemSolve": refopts.IGNORE,
        "LinSolveCheck": refopts.WARN,
        "NonNegCoef": ("k", "non_neg"),
        "NoBndryCross": ("k", "no_bndry"),
        "L1Weight": ("k", "wl1"),
    }

    @staticmethod
    def options(**kw):
        # reference defaults: rho = 1.0, AutoRho disabled
        # (sporco/admm/cbpdn.py:1506-1512)
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=False))
        base = dict(relax_param=1.8, auto_rho=ar, rho=1.0)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, D, S, lmbda=None, W=None, opt=None, dimK=None,
                 dimN=2, wl1=1.0, mu=0.0, wgrd=1.0, epsilon=None,
                 non_neg=False, no_bndry=False, dtype=jnp.float32,
                 Y0=None, U0=None):
        super().__init__()
        if opt is None:
            opt = self.options()
        D = jnp.asarray(D, dtype)
        S = jnp.asarray(S, dtype)
        cri = cr.csc_index(D.shape, S.shape, dimK=dimK, dimN=dimN)
        self.cri = cri
        Di = cr.to_internal_D(D, cri)
        Si = cr.to_internal_S(S, cri)
        if W is None:
            W = jnp.ones((1,) * (3 + cri.dimN), dtype)
        else:
            W = cr.fidelity_mask(jnp.asarray(W, dtype), cri)
        if lmbda is None:
            lmbda = 0.1 * float(_max_abs_dhs(Di, Si, jnp.zeros(cri.Nv)))
        self.lmbda = lmbda
        self.cfg = CSC2Config(cri=cri, variant=self.VARIANT,
                              non_neg=non_neg, no_bndry=no_bndry)
        self.opts = opt.replace(dtype=dtype)
        wl1a = jnp.asarray(wl1, dtype)
        if wl1a.ndim > 0:
            wl1a = cr.l1_weight(wl1a, cri)
        self.params = {
            "D": Di, "S": Si, "W": W,
            "lmbda": jnp.asarray(lmbda, dtype),
            "wl1": wl1a,
            "mu": jnp.asarray(mu, dtype),
            "wgrd": _wgrd_internal(wgrd, cri, dtype),
            "epsilon": jnp.asarray(0.0 if epsilon is None else epsilon,
                                   dtype),
        }
        self.problem = _CSC2_PROBLEMS[self.VARIANT]
        rho0 = opt.rho if opt.rho is not None else 1.0
        rho_xi = (opt.auto_rho.rsdl_target
                  if opt.auto_rho.rsdl_target is not None else 1.0)
        self.state = init_state(self.problem, self.cfg, self.params,
                                self.opts, rho0, rho_xi, Y0=Y0, U0=U0)
        self._init_done()

    def getmin(self):
        return cr.from_internal_X(self.state.Y[1], self.cri)

    def getcoef(self):
        return self.getmin()

    def reconstruct(self, X=None):
        # like the reference (sporco/admm/cbpdn.py:1770), the default
        # reconstruction uses the primal X (whose D*x is already carried
        # in the state), not the thresholded Y1
        if X is None:
            return _internal_S_to_user(self.state.X[1], self.cri)
        Xi = cr.to_internal_X(jnp.asarray(X), self.cri)
        Si = _reconstruct_jit(self.params["D"], Xi, jnp.zeros(self.cri.Nv))
        return _internal_S_to_user(Si, self.cri)


class ConvL1L1Grd(ConvBPDNMaskDcpl):
    r"""CSC with l1 fidelity, l1 sparsity and gradient penalty:
    ``||W(Dx - s)||_1 + lmbda||x||_1 + (mu/2) sum_i ||G_i x||_2^2``
    (``sporco/admm/cbpdn.py:2488``)."""

    VARIANT = "l1l1grd"
    REF_OPT_EXTRA = {"GradWeight": ("k", "wgrd")}

    def __init__(self, D, S, lmbda, mu=0.0, W=None, opt=None, **kw):
        super().__init__(D, S, lmbda=lmbda, mu=mu, W=W, opt=opt, **kw)


class ConvMinL1InL2Ball(ConvBPDNMaskDcpl):
    r"""Minimise ``||x||_1`` subject to ``||Dx - s||_2 <= epsilon``
    (convolutional form, ``sporco/admm/cbpdn.py:1830``); the ball
    projection is per-signal over channel+spatial axes."""

    VARIANT = "minl2ball"

    @staticmethod
    def options(**kw):
        # reference defaults: rho = 1.0, AutoRho enabled with Period 10
        # (sporco/admm/cbpdn.py:1928-1934)
        ar = kw.pop("auto_rho", AutoRhoOpts(enabled=True, period=10,
                                            auto_scaling=True,
                                            scaling=1000.0,
                                            rsdl_ratio=1.2,
                                            rsdl_target=1.0))
        base = dict(relax_param=1.8, auto_rho=ar, rho=1.0)
        base.update(kw)
        return ADMMOpts(**base)

    def __init__(self, D, S, epsilon, opt=None, **kw):
        if opt is None:
            opt = self.options()
        if opt.rho is None:
            opt = opt.replace(rho=1.0)
        super().__init__(D, S, lmbda=1.0, epsilon=epsilon, opt=opt, **kw)


class AddMaskSim:
    """Additive Mask Simulation (wohlberg-2016-boundary): solve a masked
    CSC problem with any ConvBPDN-family class by appending one impulse
    filter per channel to the dictionary; the impulse coefficient maps
    absorb the residual outside the mask (capability of
    ``sporco/admm/cbpdn.py:2287-2483``).

    The reference hijacks the inner solver's ``ystep``/``obfn_gvar``
    via MethodType monkey-patching; here the AMS step is an explicit,
    statically-configured branch of the CSC y-step (``ams_nimp`` in
    :class:`CSCConfig`) plus a zeroed l1 weight on the impulse maps.

    Usage: ``AddMaskSim(ConvBPDN, D, S, W, lmbda, opt=...)``.
    """

    def __init__(self, cbpdnclass, D, S, W, *args, dtype=jnp.float32,
                 **kwargs):
        # reference-style dict opts pass through to the inner class;
        # L1Weight must be lifted out here so the impulse maps can be
        # zero-weighted below
        _opt = kwargs.get("opt")
        if isinstance(_opt, dict) and "L1Weight" in _opt:
            _opt = dict(_opt)
            # explicit wl1 kwarg wins over the dict key, matching the
            # precedence of the refopts layer everywhere else
            kwargs.setdefault("wl1", _opt.pop("L1Weight"))
            _opt.pop("L1Weight", None)
            kwargs["opt"] = _opt
        D = jnp.asarray(D, dtype)
        S = jnp.asarray(S, dtype)
        W = jnp.asarray(W, dtype)
        dimN = kwargs.get("dimN", 2)
        cri = cr.csc_index(D.shape, S.shape, dimK=kwargs.get("dimK"),
                           dimN=dimN)
        self.cri = cri
        nimp = cri.Cd
        if cri.dimCd == 0:
            imp = jnp.zeros(D.shape[:dimN] + (1,), dtype)
            imp = imp.at[(0,) * dimN + (0,)].set(1.0)
        else:
            imp = jnp.zeros(D.shape[:dimN] + (cri.Cd, cri.Cd), dtype)
            for c in range(cri.Cd):
                imp = imp.at[(0,) * dimN + (c, c)].set(1.0)
        Daug = jnp.concatenate([D, imp], axis=-1)
        self.M = D.shape[-1]

        # mask in internal layout; a multi-channel mask addresses the
        # per-channel impulse maps, so its C axis moves to the M slot
        # (sporco/admm/cbpdn.py:2347-2353)
        Wi = cr.fidelity_mask(W, cri)          # (K|1, C|1, 1, Nv...)
        if cri.Cd > 1 and Wi.shape[1] > 1:
            Wi = jnp.swapaxes(Wi, 1, 2)        # -> (K|1, 1, Cd, Nv...)
        self.Wams = Wi

        # l1 weight zeroed on impulse maps (reference user layout
        # Nv + (C, K, M), here all-singleton except M).  The reference
        # expects weights already extended to M + nimp
        # (sporco/admm/cbpdn.py:2360); an un-extended per-filter array
        # is also accepted and padded.
        user_wl1 = jnp.asarray(kwargs.pop("wl1", 1.0), dtype)
        if user_wl1.ndim and user_wl1.shape[-1] == self.M:
            user_wl1 = jnp.concatenate(
                [user_wl1,
                 jnp.ones(user_wl1.shape[:-1] + (nimp,), dtype)],
                axis=-1)
        wl1 = jnp.ones((1,) * (dimN + 2) + (self.M + nimp,), dtype) \
            * user_wl1
        wl1 = wl1.at[..., self.M:].set(0.0)

        self.cbpdn = cbpdnclass(Daug, S, *args, wl1=wl1, dtype=dtype,
                                **kwargs)
        # enable the AMS branch of the y-step
        from dataclasses import replace as _dc_replace
        self.cbpdn.cfg = _dc_replace(self.cbpdn.cfg, ams_nimp=nimp)
        self.cbpdn.params["Wams"] = self.Wams
        self.timer = self.cbpdn.timer

    def solve(self):
        X = self.cbpdn.solve()
        return X[..., :self.M]

    def getcoef(self):
        return self.cbpdn.getcoef()[..., :self.M]

    def getitstat(self):
        return self.cbpdn.getitstat()

    @property
    def itstat(self):
        return self.cbpdn.itstat

    def reconstruct(self, X=None):
        """Reconstruction from the primary (non-impulse) maps only."""
        if X is None:
            X = self.getcoef()
        full = jnp.concatenate(
            [jnp.asarray(X),
             jnp.zeros(X.shape[:-1] + (self.cri.Cd,), X.dtype)], axis=-1)
        return self.cbpdn.reconstruct(full)


class MultiDictConvBPDN:
    """Joint sparse coding of multiple signals against multiple
    dictionaries with shared coefficient maps (capability of
    ``sporco/admm/cbpdn.py:2779``): the dictionaries are stacked on the
    channel axis, so ``argmin_x sum_b (1/2)||D_b x - s_b||^2 +
    lmbda ||x||_1`` becomes one multi-channel ConvBPDN problem.

    Usage: ``MultiDictConvBPDN(ConvBPDN, [D0, D1], [S0, S1], lmbda,
    opt=...)``.
    """

    def __init__(self, cbpdnclass, D, S, *args, dtype=jnp.float32,
                 **kwargs):
        dimN = kwargs.get("dimN", 2)
        dimC = np.asarray(D[0]).ndim - dimN - 1
        M = np.asarray(D[0]).shape[-1]
        chn = [1] * len(D) if dimC == 0 else \
            [np.asarray(D[b]).shape[dimN] for b in range(len(D))]
        C = int(np.sum(chn))
        dsz = np.zeros(dimN, dtype=int)
        for b in range(len(D)):
            dsz = np.maximum(dsz, np.asarray(D[b]).shape[:dimN])
        Dm = np.zeros(tuple(dsz.tolist()) + (C, M))
        chncs = np.cumsum(np.asarray([0] + chn))
        slc0 = (slice(None),) * dimN + (np.newaxis,) * (1 - dimC)
        for b in range(len(D)):
            Db = np.asarray(D[b])
            slc1 = tuple([slice(0, n) for n in Db.shape[:dimN]]
                         + [slice(chncs[b], chncs[b + 1])])
            Dm[slc1] = Db[slc0]
        Sm = np.concatenate([np.asarray(S[b])[slc0]
                             for b in range(len(S))], axis=dimN + dimC)
        self.cbpdn = cbpdnclass(Dm, Sm, *args, dtype=dtype, **kwargs)
        self.dimN = dimN
        self.chn = chn
        self.chncs = chncs
        self.C = C
        self.timer = self.cbpdn.timer

    def solve(self):
        return self.cbpdn.solve()

    def getcoef(self):
        return self.cbpdn.getcoef()

    def getitstat(self):
        return self.cbpdn.getitstat()

    @property
    def itstat(self):
        return self.cbpdn.itstat

    def reconstruct(self, b=None, X=None):
        """Reconstruct against dictionary ``b`` (or all, stacked on the
        channel axis, if ``b`` is None)."""
        full = self.cbpdn.reconstruct(X)
        if b is None:
            return full
        sl_ = (slice(None),) * self.dimN + \
            (slice(int(self.chncs[b]), int(self.chncs[b + 1])),)
        return full[sl_]
