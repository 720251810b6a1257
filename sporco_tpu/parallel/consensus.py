"""Sharded consensus convolutional dictionary learning.

Re-design of the reference's multiprocessing consensus CDL
(``ConvBPDNDictLearn_Consensus``, ``sporco/dictlrn/prlcnscdl.py:275-652``
and its masked variant ``:821-1218``) as a single fused, jit-compiled,
device-sharded training loop -- the BASELINE.json north-star path.

Mapping (SURVEY.md §3.3):

- the reference's shared-memory arrays with the K axis swapped to axis 0
  (``prlcnscdl.py:69-130``) become device arrays sharded over the mesh
  ``"data"`` axis on their (leading) K axis;
- the per-image fused iteration ``step_group(k)``
  (``prlcnscdl.py:256-271``: cbpdn x/relax/y/u steps + ccmod
  setcoef/x/relax) is embarrassingly parallel over K and runs as one
  batched program per device;
- the two serial synchronisation points per outer iteration --
  ``ccmod_ystep``'s consensus mean over K + dictionary projection
  (``prlcnscdl.py:235-243``) and ``cbpdn_setdict``'s recomputation of
  the DFT-domain dictionary (``prlcnscdl.py:134-148``) -- become a
  single ``jnp.mean`` over the sharded K axis, which XLA lowers to an
  all-reduce over ICI, followed by replicated elementwise work;
- like the reference, there is no residual-based stopping and no
  adaptive rho in this path (``prlcnscdl.py:319-323``): the whole solve
  is one ``lax.fori_loop``.

The same class runs unchanged on 1 device (no collectives) or on an
N-device mesh; the dictionary (small) is replicated, signals and
coefficients are sharded.
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec

from sporco_tpu import cnvrep as cr
from sporco_tpu.ops import fft as sf
from sporco_tpu.ops import linalg as sl
from sporco_tpu.ops import prox as sp
from sporco_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from sporco_tpu.utils.timer import Timer
from sporco_tpu.models.common import device_sync

__all__ = ["ConvBPDNDictLearn_Consensus",
           "ConvBPDNMaskDcplDictLearn_Consensus"]


@dataclass(frozen=True)
class _CnsConfig:
    cri: cr.CDUIndex
    dsz: tuple
    zero_mean: bool = False
    masked: bool = False
    relax_x: float = 1.8
    relax_d: float = 1.8
    fused_x: bool = False   # spatial-Woodbury CSC x-step (ops/fused_csc)
    kernel_x: bool = False  # one-pass Pallas CSC stage; the coefficient
                            # state then stays in the packed polyphase
                            # layout across iterations


def _fftaxes(cri):
    return tuple(range(-cri.dimN, 0))


@partial(jax.jit, static_argnums=(0, 3), donate_argnums=(2,))
def _consensus_solve(cfg, params, state, n_iter):
    """Run ``n_iter`` fused consensus-CDL outer iterations
    (the jitted equivalent of ``prlcnscdl.py:496-513`` x ``n_iter``)."""
    cri = cfg.cri
    axes = _fftaxes(cri)
    Nv = cri.Nv
    S = params["S"]
    W = params.get("W")
    lmbda = params["lmbda"]
    rho_x = params["rho_x"]
    rho_d = params["rho_d"]
    ax_ = cfg.relax_x
    ad_ = cfg.relax_d
    Sf = sf.rfftn(S, axes=axes)

    def pcn(V):
        return cr.Pcn(V, cfg.dsz, Nv, dimN=cri.dimN, zm=cfg.zero_mean)

    def body(i, st):
        # the dictionary dual lives in the DFT domain (planar
        # real/imag f32): its only consumers are frequency-domain
        # expressions, so keeping it there removes the two BIG
        # M-channel transforms per outer iteration (rfftn(DY - DU) and
        # irfftn(DXf)); only the small consensus-mean dictionary
        # round-trips to the spatial domain for the Pcn projection
        ZY, ZU, ZY0, ZU0, DY, DUfr, DUfi = st
        DUf = DUfr + 1j * DUfi
        # --- cbpdn_setdict (prlcnscdl.py:134-148) ---
        Df = sf.rfftn(DY, axes=axes)
        DSf = jnp.conj(Df) * Sf
        if cri.Cd > 1:
            DSf = jnp.sum(DSf, axis=1, keepdims=True)

        if cfg.masked:
            # masked variant (prlcnscdl.py:821-1218): two-block CSC
            # x-step with rho = 1 and blocks (y0 signal, y1 coef)
            YU0f = sf.rfftn(ZY0 - ZU0 + S, axes=axes)
            YU1f = sf.rfftn(ZY - ZU, axes=axes)
            if cri.Cd == 1:
                b = jnp.conj(Df) * YU0f + YU1f
            else:
                b = jnp.sum(jnp.conj(Df) * YU0f, axis=1,
                            keepdims=True) + YU1f
            Zxf = sl.solvedbi_sm(Df, 1.0, b, axis=2) if cri.Cd == 1 \
                else sl.solvemdbi_ism(Df, 1.0, b, axisM=2, axisK=1)
            Zx = sf.irfftn(Zxf, s=Nv, axes=axes)
            DZxf = jnp.sum(Df * Zxf, axis=2, keepdims=True)
            DZx = sf.irfftn(DZxf, s=Nv, axes=axes)
            AX0 = ax_ * DZx - (1 - ax_) * (-ZY0 - S)
            AX1 = ax_ * Zx + (1 - ax_) * ZY
            v0 = AX0 + ZU0 - S
            ZY0n = rho_x * v0 / (W ** 2 + rho_x)
            ZYn = sp.prox_l1(AX1 + ZU, (lmbda / rho_x) * params["wl1"])
            ZU0n = ZU0 + AX0 - ZY0n - S
            ZUn = ZU + AX1 - ZYn
            ZY0, ZU0 = ZY0n, ZU0n
            ZY, ZU = ZYn, ZUn
        elif cfg.kernel_x:
            # --- CSC stage through the one-pass Pallas kernel
            # (ops/pallas_csc_iter.csc_iter): x-step combine, relax,
            # prox, dual update in a single pass over the PACKED
            # coefficient state (ZY/ZU are carried packed).  The
            # dictionary changes every outer iteration, so the forward
            # product is recomputed against the fresh polyphase
            # weights rather than reusing the kernel's R1. ---
            from sporco_tpu.ops import fused_csc as fc
            from sporco_tpu.ops import pallas_csc_iter as pki
            nd0, nd1 = cfg.dsz[0], cfg.dsz[1]
            K, M = cri.K, cri.M
            Cd = cri.Cd
            n0, n1 = Nv
            PS = fc.PS
            p0, p1 = n0 // PS, n1 // PS
            pos = K * p0 * p1
            C = PS * PS * M
            if Cd > 1:
                # rank-Cd Woodbury glue (ops/fused_csc mc helpers)
                Dsm = DY.reshape(Cd, M, n0, n1)[:, :, :nd0, :nd1]
                Wf_, Wa_, js_ = fc.xstep_kernels_mc(Dsm, nd0, nd1)
                jf0, jf1, ja0, ja1 = js_
                Dfm = Df.reshape(Cd, M, n0, Sf.shape[-1])
                DDHf = jnp.einsum(
                    "cmxy,dmxy->cdxy", Dfm, jnp.conj(Dfm),
                    precision=jax.lax.Precision.HIGHEST)
                Sfc = Sf.reshape(K, Cd, n0, -1)
                o = jnp.einsum("kpqc,cd->kpqd",
                               (ZY - ZU).reshape(K, p0, p1, C), Wf_,
                               precision=jax.lax.Precision.HIGH)
                R = fc._fwd_combine_mc(o, jf0, jf1, Cd, PS)
                rf = sf.rfftn(R, axes=(-2, -1))
                Gf = fc._herm_solve(DDHf, rho_x, Sfc - rf)
                G = sf.irfftn(Gf, s=Nv, axes=(-2, -1))
                G2 = fc._adj_rolls_mc(G, ja0, ja1, PS)
            else:
                Dsm = DY.reshape(M, n0, n1)[:, :nd0, :nd1]
                Wf_, Wa_, js_ = fc.xstep_kernels(Dsm, nd0, nd1)
                jf0, jf1, ja0, ja1 = js_
                DHD = jnp.sum((Df * jnp.conj(Df)).real,
                              axis=2).reshape(n0, Sf.shape[-1])
                Sf2 = Sf.reshape(K, n0, -1)
                o = jnp.einsum("kpqc,cd->kpqd",
                               (ZY - ZU).reshape(K, p0, p1, C), Wf_,
                               precision=jax.lax.Precision.HIGH)
                R = fc.poly_unpack(fc._fwd_combine(o, jf0, jf1, PS))
                rf = sf.rfftn(R, axes=(-2, -1))
                den = 1.0 / (DHD[None] + rho_x)
                gr = (jnp.real(Sf2) - jnp.real(rf)) * den
                gi = (jnp.imag(Sf2) - jnp.imag(rf)) * den
                G = sf.irfftn(gr + 1j * gi, s=Nv, axes=(-2, -1))
                G2 = fc._adj_rolls(fc.poly_pack(G), ja0, ja1)
            thr = (lmbda / rho_x) * params["wl1"]
            # emit_px/emit_fwd off: X is not consumed (the d-step uses
            # ZY), and the forward product is recomputed against the
            # NEXT outer iteration's fresh dictionary weights anyway --
            # skipping R1/R2 removes 9 of the kernel's 12 MXU passes
            _, ZYn2, ZUn2, _, _, _ = pki.csc_iter(
                G2.reshape(pos, -1), ZY.reshape(pos, C),
                ZU.reshape(pos, C), pki.split_bf16_3(Wa_),
                None, thr, 1.0, ax_, 1.0, 1.0,
                emit_px=False, emit_fwd=False)
            ZY = ZYn2.reshape(K, p0, p1, C)
            ZU = ZUn2.reshape(K, p0, p1, C)
        elif cfg.fused_x:
            # --- cbpdn x-step via the spatial Woodbury identity
            # (ops/fused_csc.spatial_xstep): replaces the M-channel FFT
            # pair with two polyphase MXU matmuls + one single-channel
            # FFT pair.  The dictionary iterate is support-limited
            # after Pcn, so its spatial kernel is just the cropped
            # leading block. ---
            from sporco_tpu.ops import fused_csc as fc
            nd0, nd1 = cfg.dsz[0], cfg.dsz[1]
            K, M = cri.K, cri.M
            Cd = cri.Cd
            n0, n1 = Nv
            Pyu = fc.pack_state((ZY - ZU).reshape(K, 1, M, n0, n1))
            if Cd > 1:
                Dsm = DY.reshape(Cd, M, n0, n1)[:, :, :nd0, :nd1]
                Wf_, Wa_, js_ = fc.xstep_kernels_mc(Dsm, nd0, nd1)
                Dfm = Df.reshape(Cd, M, n0, Sf.shape[-1])
                DDHf = jnp.einsum(
                    "cmxy,dmxy->cdxy", Dfm, jnp.conj(Dfm),
                    precision=jax.lax.Precision.HIGHEST)
                Sfc = Sf.reshape(K, Cd, n0, -1)
                Zxp, _, _ = fc.spatial_xstep_mc(
                    Pyu, Wf_, Wa_, js_, DDHf, Sfc, rho_x, 1.0, Nv, Cd)
            else:
                Dsm = DY.reshape(M, n0, n1)[:, :nd0, :nd1]
                Wf_, Wa_, js_ = fc.xstep_kernels(Dsm, nd0, nd1)
                DHD = jnp.sum((Df * jnp.conj(Df)).real,
                              axis=2).reshape(n0, Sf.shape[-1])
                Sf2 = Sf.reshape(K, n0, -1)
                Zxp, _, _, _, _ = fc.spatial_xstep(
                    Pyu, Wf_, Wa_, js_, DHD, jnp.real(Sf2),
                    jnp.imag(Sf2), rho_x, 1.0, Nv)
            Zx = fc.unpack_state(Zxp, M).reshape(ZY.shape)
            AX = ax_ * Zx + (1 - ax_) * ZY
            ZYn = sp.prox_l1(AX + ZU, (lmbda / rho_x) * params["wl1"])
            ZU = ZU + AX - ZYn
            ZY = ZYn
        else:
            # --- cbpdn x/relax/y/u steps (prlcnscdl.py:152-196) ---
            b = DSf + rho_x * sf.rfftn(ZY - ZU, axes=axes)
            if cri.Cd == 1:
                Zxf = sl.solvedbi_sm(Df, rho_x, b, axis=2)
            else:
                Zxf = sl.solvemdbi_ism(Df, rho_x, b, axisM=2, axisK=1)
            Zx = sf.irfftn(Zxf, s=Nv, axes=axes)
            AX = ax_ * Zx + (1 - ax_) * ZY
            ZYn = sp.prox_l1(AX + ZU, (lmbda / rho_x) * params["wl1"])
            ZU = ZU + AX - ZYn
            ZY = ZYn

        # --- ccmod setcoef (prlcnscdl.py:199-209) ---
        if cfg.kernel_x:
            from sporco_tpu.ops import fused_csc as _fcu
            Z_int = _fcu.unpack_state(ZY, cri.M)
        else:
            Z_int = ZY
        Zf = sf.rfftn(Z_int, axes=axes)
        if cfg.masked:
            # dictionary step fits y0 + s (the masked-consistent part)
            ZSf = jnp.conj(Zf) * sf.rfftn(ZY0 + S, axes=axes)
        else:
            ZSf = jnp.conj(Zf) * Sf

        # --- ccmod xstep + relax per signal (prlcnscdl.py:212-232),
        # entirely in the DFT domain (Df == rfftn(DY) from the top of
        # the body) ---
        bD = ZSf + rho_d * (Df - DUf)
        DXf = sl.solvedbi_sm(Zf, rho_d, bD, axis=2)
        DAXf = ad_ * DXf + (1 - ad_) * Df

        # --- the all-reduce: consensus mean + projection
        #     (prlcnscdl.py:235-243).  The mean commutes with the DFT,
        # so only the SMALL averaged dictionary is transformed back for
        # the (nonlinear) Pcn projection.  With a single-channel
        # dictionary and multi-channel signals the per-channel updates
        # are extra consensus blocks (the reference folds C onto K,
        # ccmod.py:270-280) ---
        blk_axes = (0, 1) if (cri.Cd == 1 and cri.C > 1) else (0,)
        Dmean = sf.irfftn(jnp.mean(DAXf + DUf, axis=blk_axes,
                                   keepdims=True), s=Nv, axes=axes)
        DYn = pcn(Dmean)
        DUfn = DUf + DAXf - sf.rfftn(DYn, axes=axes)
        return (ZY, ZU, ZY0, ZU0, DYn, jnp.real(DUfn),
                jnp.imag(DUfn))

    state = jax.lax.fori_loop(0, n_iter, body, state)
    return state


@jax.jit
def _cns_objective(cfg_dummy, D, ZY, S, lmbda, wl1):
    """Functional value over all signals (``prlcnscdl.py:623-652``)."""
    dimN = S.ndim - 3
    axes = tuple(range(-dimN, 0))
    Df = sf.rfftn(D, s=S.shape[-dimN:], axes=axes)
    Zf = sf.rfftn(ZY, axes=axes)
    Ef = jnp.sum(Df * Zf, axis=2, keepdims=True) - sf.rfftn(S, axes=axes)
    dfd = 0.5 * sf.rfl2norm2(Ef, S.shape[-dimN:], axis=axes)
    reg = jnp.sum(jnp.abs(wl1 * ZY))
    return dfd + lmbda * reg, dfd, reg


class ConvBPDNDictLearn_Consensus:
    r"""Fused, device-sharded consensus convolutional dictionary
    learning (``sporco/dictlrn/prlcnscdl.py:275``).

    ``solve()`` runs ``max_iter`` fused outer iterations as a single
    jitted ``fori_loop``.  With a multi-device ``mesh``, the signal
    axis K is sharded over the mesh "data" axis and the dictionary
    consensus mean becomes an ICI all-reduce.
    """

    MASKED = False

    def __init__(self, D0, S, lmbda, W=None, opt=None, max_iter=100,
                 dimK=None, dimN=2, zero_mean=False, rho_x=None,
                 rho_d=None, relax=1.8, wl1=1.0, mesh=None,
                 dtype=jnp.float32, fused="auto",
                 process_local_batch=False):
        self.timer = Timer(["init", "solve"])
        self.timer.start("init")
        D0 = jnp.asarray(D0, dtype)
        dsz = D0.shape
        nproc = jax.process_count()
        if process_local_batch and nproc > 1:
            # multi-host: each controller passes only its own chunk of
            # the signal batch; the global K axis is the concatenation
            # over processes, sharded host-major over the mesh "data"
            # axis (cf. the per-worker shared-memory K slices of
            # sporco/dictlrn/prlcnscdl.py:69-130)
            if mesh is None:
                raise ValueError(
                    "process_local_batch requires a global mesh")
            import dataclasses as _dc
            S_loc = jnp.asarray(S, dtype)
            cri_loc = cr.cdu_index(tuple(dsz), S_loc.shape, dimK=dimK,
                                   dimN=dimN)
            if cri_loc.dimK == 0:
                raise ValueError(
                    "process-local batching requires an explicit K "
                    "axis in S")
            cri = _dc.replace(cri_loc, K=cri_loc.K * nproc)
            Si_loc = np.asarray(cr.to_internal_S(S_loc, cri_loc))
            Si = jax.make_array_from_process_local_data(
                data_sharding(mesh, 0, Si_loc.ndim), Si_loc)
        else:
            S = jnp.asarray(S, dtype)
            cri = cr.cdu_index(tuple(dsz), S.shape, dimK=dimK,
                               dimN=dimN)
            Si = cr.to_internal_S(S, cri)
        self.cri = cri
        self.max_iter = max_iter
        self.dtype = dtype
        csc_like = cr.CSCIndex(dimN=cri.dimN, dimC=cri.dimC,
                               dimK=cri.dimK, dimCd=cri.dimCd, C=cri.C,
                               Cd=cri.Cd, Cx=cri.Cx, K=cri.K, M=cri.M,
                               Nv=cri.Nv, dsz=tuple(dsz[:dimN]))
        D0i = cr.Pcn(cr.to_internal_D(D0, csc_like), tuple(dsz),
                     cri.Nv, dimN=dimN, zm=zero_mean)
        from sporco_tpu.ops import fused_csc as _fc
        from sporco_tpu.ops import pallas_csc_iter as _pki
        # auto mode picks the spatial x-step for single-channel
        # dictionaries only: the colour (rank-C) form is supported and
        # trajectory-identical, but measured SLOWER than the
        # freq-domain stage at CDL sizes (the 3x larger polyphase taps
        # outweigh the rank-3 solvemdbi solve; 137 vs 109 outer it/s
        # on the 128x128x3 benchmark) -- request it with fused=True
        fx = (_fc.consensus_eligible(cri, dsz, dtype, self.MASKED)
              and (fused is True
                   or (fused is not False and cri.Cd == 1)))
        PSx = _fc.PS
        posx = cri.K * (cri.Nv[0] // PSx) * (cri.Nv[1] // PSx) \
            if fx else 0
        Jd = -(-(dsz[0] - 1) // PSx)
        Tax = ((Jd + 1) * (-(-(dsz[1] - 1) // PSx) + 1)
               * cri.Cd * PSx * PSx if fx else 0)
        kx = (fx and jnp.ndim(jnp.asarray(wl1)) == 0
              and _pki.enabled
              and (_pki.interpret
                   or jax.default_backend() in ("tpu", "axon"))
              and _pki.iter_supported(posx, PSx * PSx * cri.M, Tax))
        self.cfg = _CnsConfig(cri=cri, dsz=tuple(dsz),
                              zero_mean=zero_mean, masked=self.MASKED,
                              relax_x=relax, relax_d=relax, fused_x=fx,
                              kernel_x=bool(kx))
        wl1a = jnp.asarray(wl1, dtype)
        if wl1a.ndim > 0:
            wl1a = cr.l1_weight(wl1a, csc_like)
        self.params = {
            "S": Si,
            "lmbda": jnp.asarray(lmbda, dtype),
            "wl1": wl1a,
            "rho_x": jnp.asarray(
                50.0 * lmbda + 1.0 if rho_x is None else rho_x, dtype),
            "rho_d": jnp.asarray(
                float(cri.K) if rho_d is None else rho_d, dtype),
        }
        if self.MASKED:
            if W is None:
                W = jnp.ones((1,) * (3 + dimN), dtype)
            else:
                W = cr.fidelity_mask(jnp.asarray(W, dtype), cri)
            self.params["W"] = W
            self.params["rho_x"] = jnp.asarray(
                1.0 if rho_x is None else rho_x, dtype)

        K, Cx, M = cri.K, cri.Cx, cri.M
        if self.cfg.kernel_x:
            # coefficient state carried in the packed polyphase layout
            shpX = (K, cri.Nv[0] // PSx, cri.Nv[1] // PSx,
                    PSx * PSx * M)
        else:
            shpX = (K, Cx, M) + tuple(cri.Nv)
        shpS = (K, cri.C, 1) + tuple(cri.Nv)
        # D consensus blocks: per signal, plus per channel when the
        # dictionary is single-channel but signals are multi-channel
        Cb = cri.C if cri.Cd == 1 else cri.Cd
        shpDb = (K, Cb, M) + tuple(cri.Nv)
        if mesh is None:
            z = lambda shp: jnp.zeros(shp, dtype)
        else:
            # create batch state directly sharded: no host-side global
            # materialisation, works identically under one or many
            # controller processes
            z = lambda shp: jnp.zeros(
                shp, dtype, device=data_sharding(mesh, 0, len(shp)))
        # the dictionary dual is carried in the DFT domain as planar
        # real/imag f32 (complex arrays cannot cross jit boundaries on
        # every backend; see _consensus_solve)
        shpDbf = shpDb[:-1] + (cri.Nv[-1] // 2 + 1,)
        self.state = (z(shpX), z(shpX),      # ZY, ZU
                      z(shpS), z(shpS),      # ZY0, ZU0
                      D0i, z(shpDbf), z(shpDbf))   # DY, Re/Im DUf

        # device placement: K-sharded batch arrays, replicated dict
        self.mesh = mesh
        if mesh is not None:
            multi = jax.process_count() > 1

            def shard(x):
                sh = data_sharding(mesh, 0, x.ndim)
                if isinstance(x, jax.Array) and x.sharding == sh:
                    return x
                # host-identical data -> global scatter (multi-process
                # device_put requires a host array)
                return jax.device_put(np.asarray(x) if multi else x, sh)

            def rep(x):
                return jax.device_put(np.asarray(x) if multi else x,
                                      replicated(mesh))

            ZY, ZU, ZY0, ZU0, DY, DUfr, DUfi = self.state
            self.state = (ZY, ZU, ZY0, ZU0, rep(DY), DUfr, DUfi)
            self.params = jax.tree_util.tree_map(
                lambda x: rep(x) if x.shape[:1] != (K,) else shard(x),
                self.params)
        self.j = 0
        self.timer.stop("init")

    def step(self, n=1):
        """Run ``n`` fused outer iterations."""
        self.state = _consensus_solve(self.cfg, self.params, self.state,
                                      n)
        self.j += n
        return self

    def solve(self):
        self.timer.start("solve")
        self.step(self.max_iter)
        device_sync(self.state)
        self.timer.stop("solve")
        return self.getdict()

    def getdict(self, crop=True):
        D = self.state[4]
        if crop:
            D = cr.bcrop(D, self.cfg.dsz, self.cri.dimN)
        return cr.from_internal_D(D, self.cri)

    def _coef_internal(self):
        Z = self.state[0]
        if self.cfg.kernel_x:
            from sporco_tpu.ops import fused_csc as _fc
            Z = _fc.unpack_state(Z, self.cri.M)
        return Z

    def getcoef(self):
        csc_like = cr.CSCIndex(dimN=self.cri.dimN, dimC=self.cri.dimC,
                               dimK=self.cri.dimK, dimCd=self.cri.dimCd,
                               C=self.cri.C, Cd=self.cri.Cd,
                               Cx=self.cri.Cx, K=self.cri.K,
                               M=self.cri.M, Nv=self.cri.Nv,
                               dsz=self.cfg.dsz)
        return cr.from_internal_X(self._coef_internal(), csc_like)

    def evaluate(self):
        """Objective over all signals (an all-reduce when sharded)."""
        obj, dfd, reg = _cns_objective(None, self.state[4],
                                       self._coef_internal(),
                                       self.params["S"],
                                       self.params["lmbda"],
                                       self.params["wl1"])
        return (float(obj), float(dfd), float(reg))


class ConvBPDNMaskDcplDictLearn_Consensus(ConvBPDNDictLearn_Consensus):
    r"""Masked consensus CDL (``sporco/dictlrn/prlcnscdl.py:821``): the
    CSC step uses mask decoupling (two-block), fused into the same
    sharded loop."""
    MASKED = True
