"""Spatial (N-axis) domain decomposition: the framework's
sequence-parallel analogue (SURVEY.md §5).

The reference never shards the pixel axes -- its images fit one host --
but every DFT-diagonalised solver here is per-frequency-bin independent
between transforms (``sporco/linalg.py:232-273``), so an image larger
than one device decomposes naturally:

- real-space arrays are sharded by ROWS (axis -2) over the mesh
  ``"data"`` axis;
- the 2-D real FFT becomes *local* rffts along the contiguous columns,
  one ``all_to_all`` transpose over ICI, and local c2c ffts along the
  now-contiguous rows (the classic slab-decomposed distributed FFT);
- the resulting half-spectra are sharded by FREQUENCY COLUMNS
  (axis -1, zero-padded to a multiple of the mesh size), where all
  per-bin solves stay local;
- reductions (residual norms, inner products) are ``psum``s.

:func:`tvl2deconv_nsharded` applies this to the TVL2 deconvolution
solver (``sporco/admm/tvl2.py:377``; pointwise-DFT x-step
``tvl2.py:594-610``) with the exact semantics of the generic driver
(:mod:`sporco_tpu.solvers.admm`): normalised residuals, adaptive rho
with dual rescaling, early stopping.  The per-iteration trajectory
matches the single-device :class:`~sporco_tpu.models.tv.TVL2Deconv` to
floating-point rounding.
"""

import math


import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec
from jax import shard_map

from sporco_tpu.ops import prox as sp

__all__ = ["dist_rfft2", "dist_irfft2", "tvl2deconv_nsharded",
           "cbpdn_nsharded"]


def _a2a(x, axis_name, split_axis, concat_axis):
    """all_to_all of a complex array as two real collectives (complex
    collectives are not supported on every backend)."""
    f = lambda v: lax.all_to_all(v, axis_name, split_axis=split_axis,
                                 concat_axis=concat_axis, tiled=True)
    if jnp.iscomplexobj(x):
        return f(jnp.real(x)) + 1j * f(jnp.imag(x))
    return f(x)


def dist_rfft2(x, n_shards, axis_name="data"):
    """Distributed 2-D real FFT over the LAST TWO axes.  Call inside
    ``shard_map``: ``x`` is this shard's row block ``(..., N0/P, N1)``;
    returns the frequency-column block ``(..., N0, K1p/P)`` where
    ``K1p = ceil((N1//2+1)/P)*P`` (zero-padded).
    """
    P = n_shards
    xf = jnp.fft.rfft(x, axis=-1)               # local columns
    K1 = xf.shape[-1]
    K1p = -(-K1 // P) * P
    pad = [(0, 0)] * (xf.ndim - 1) + [(0, K1p - K1)]
    xf = jnp.pad(xf, pad)
    xf = _a2a(xf, axis_name, xf.ndim - 1, xf.ndim - 2)
    return jnp.fft.fft(xf, axis=-2)             # local full rows


def dist_irfft2(xf, n1, n_shards, axis_name="data"):
    """Inverse of :func:`dist_rfft2`: frequency-column block
    ``(..., N0, K1p/P)`` -> real row block ``(..., N0/P, n1)``."""
    P = n_shards
    K1 = n1 // 2 + 1
    v = jnp.fft.ifft(xf, axis=-2)
    v = _a2a(v, axis_name, v.ndim - 2, v.ndim - 1)
    v = v[..., :K1]
    return jnp.fft.irfft(v, n=n1, axis=-1)


def _freq_mask(K1, K1p, P, axis_name):
    """True on real frequency bins of this shard's column block, False
    on the zero-pad columns."""
    idx = lax.axis_index(axis_name)
    cols = idx * (K1p // P) + jnp.arange(K1p // P)
    return (cols < K1)[None, :]


def _default_dtype(dtype):
    """None -> the runtime's widest float (f64 under jax_enable_x64,
    else f32) rather than requesting f64 on a non-x64 runtime (which
    JAX silently truncates with a warning)."""
    if dtype is not None:
        return dtype
    import jax
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def tvl2deconv_nsharded(A, S, lmbda, mesh, opt=None, Wtv=1.0,
                        dtype=None):
    """l2-TV deconvolution with the image rows sharded over the mesh
    ``"data"`` axis (see module docstring).  Returns ``(X, k, r, s)``:
    the deconvolved image (global array, row-sharded), iterations run,
    and final normalised residuals.

    Semantics: identical to ``TVL2Deconv(A, S, lmbda, opt)`` with
    scalar ``Wtv`` on a 2-D single-channel image.
    """
    from sporco_tpu.models.tv import TVL2Deconv
    if opt is None:
        opt = TVL2Deconv.options()
    dtype = _default_dtype(dtype)
    S = jnp.asarray(S, dtype)
    A = jnp.asarray(A, dtype)
    if S.ndim != 2:
        raise ValueError("prototype supports 2-D single-channel S")
    N0, N1 = S.shape
    P = mesh.shape["data"]
    if N0 % P != 0:
        raise ValueError(f"N0 ({N0}) must divide the mesh data axis "
                         f"({P})")
    K1 = N1 // 2 + 1
    K1p = -(-K1 // P) * P
    ar = opt.auto_rho
    rho0 = opt.rho if opt.rho is not None else \
        2.0 * float(lmbda) + 0.1   # reference default (tvl2.py:484)
    rlx = opt.relax_param
    lmbda = float(lmbda)
    Wtv = float(Wtv)
    nc = math.sqrt(N0 * N1 * 2)    # size of Y
    nx = math.sqrt(N0 * N1)

    # full (small) filter spectra, replicated; sliced per shard inside
    Af_full = jnp.fft.rfft2(A, s=(N0, N1))
    g0 = np.zeros((2, 1)); g0[:, 0] = [1.0, -1.0]
    g1 = np.zeros((1, 2)); g1[0, :] = [1.0, -1.0]
    Gf_full = jnp.stack([jnp.fft.rfft2(jnp.asarray(g), s=(N0, N1))
                         for g in (g0, g1)])            # (2, N0, K1)
    padc = [(0, 0), (0, K1p - K1)]
    Af_full = jnp.pad(Af_full, padc)
    Gf_full = jnp.pad(Gf_full, [(0, 0)] + padc)

    def run(S_loc, Afr, Afi, Gfr, Gfi):
        idx = lax.axis_index("data")
        c0 = idx * jnp.asarray(K1p // P, idx.dtype)
        z0 = jnp.zeros((), idx.dtype)
        Af = lax.dynamic_slice(Afr, (z0, c0), (N0, K1p // P)) \
            + 1j * lax.dynamic_slice(Afi, (z0, c0), (N0, K1p // P))
        Gf = lax.dynamic_slice(Gfr, (z0, z0, c0),
                               (2, N0, K1p // P)) \
            + 1j * lax.dynamic_slice(Gfi, (z0, z0, c0),
                                     (2, N0, K1p // P))
        mask = _freq_mask(K1, K1p, P, "data")
        AHAf = (jnp.conj(Af) * Af).real
        GHGf = jnp.sum((jnp.conj(Gf) * Gf).real, axis=0)
        Sf = dist_rfft2(S_loc, P)
        AHSf = jnp.conj(Af) * Sf

        def pnorm(v):
            return jnp.sqrt(lax.psum(jnp.sum(v * v), "data"))

        def cnst_a(Xf):
            # circular gradient stack from the spectrum: (2, n0loc, N1)
            return dist_irfft2(Gf * Xf[None], N1, P)

        def cnst_at_f(Vf):
            return jnp.sum(jnp.conj(Gf) * Vf, axis=0)

        def cond(st):
            k, r, s, epri, edua = st[3], st[5], st[6], st[7], st[8]
            return jnp.logical_and(
                k < opt.max_iter,
                jnp.logical_not(jnp.logical_and(r <= epri,
                                                s <= edua)))

        def body(st):
            X, Y, U, k, rho, _, _, _, _ = st
            Yprev = Y
            # x-step (tvl2.py:594-610): pointwise in the local
            # frequency-column block
            YUf = dist_rfft2(Y - U, P)          # (2, N0, K1p/P)
            b = AHSf + rho * cnst_at_f(YUf)
            den = AHAf + rho * GHGf
            Xf = jnp.where(mask, b / jnp.where(mask, den, 1.0), 0.0)
            Xl = dist_irfft2(Xf[None], N1, P)[0]     # (n0loc, N1)
            AXnr = cnst_a(Xf)
            AX = rlx * AXnr + (1 - rlx) * Y
            AXU = AX + U
            Yn = sp.prox_l2(AXU, (lmbda / rho) * Wtv, axis=(0,))
            Un = U + AX - Yn
            # residuals (generic-driver semantics)
            rv = AXnr - Yn
            dYf = dist_rfft2(Yn - Yprev, P)
            sv = dist_irfft2(cnst_at_f(dYf)[None], N1, P)[0]
            rnrm = pnorm(rv)
            snrm = rho * pnorm(sv)
            rn = jnp.maximum(pnorm(AXnr), pnorm(Yn))
            Uf = dist_rfft2(Un, P)
            sn = rho * pnorm(dist_irfft2(cnst_at_f(Uf)[None],
                                         N1, P)[0])
            if ar.std_residuals:
                r, s = rnrm, snrm
                epri = nc * opt.abs_stop_tol + rn * opt.rel_stop_tol
                edua = nx * opt.abs_stop_tol + sn * opt.rel_stop_tol
            else:
                rn_ = jnp.where(rn == 0.0, 1.0, rn)
                sn_ = jnp.where(sn == 0.0, 1.0, sn)
                r = rnrm / rn_
                s = snrm / sn_
                epri = nc * opt.abs_stop_tol / rn_ + opt.rel_stop_tol
                edua = nx * opt.abs_stop_tol / sn_ + opt.rel_stop_tol
            # adaptive rho with dual rescale (admm.py analogue)
            from sporco_tpu.solvers.admm import _update_rho
            rho_n, Un = _update_rho(ar, k, r, s, rho, 1.0, Un)
            return (Xl, Yn, Un, k + 1, rho_n, r, s, epri, edua)

        rdt = S_loc.dtype
        st0 = (jnp.zeros_like(S_loc),
               lax.pcast(jnp.zeros((2,) + S_loc.shape, rdt), "data", to="varying"),
               lax.pcast(jnp.zeros((2,) + S_loc.shape, rdt), "data", to="varying"),
               jnp.asarray(0, jnp.int32),
               jnp.asarray(rho0, rdt),
               jnp.asarray(jnp.inf, rdt), jnp.asarray(jnp.inf, rdt),
               jnp.asarray(0.0, rdt), jnp.asarray(0.0, rdt))
        X, Y, U, k, rho, r, s, epri, edua = lax.while_loop(cond, body,
                                                           st0)
        return X, k, r, s

    rowspec = PartitionSpec("data", None)
    rep = PartitionSpec()
    run_sharded = jax.jit(shard_map(
        run, mesh=mesh,
        in_specs=(rowspec, rep, rep, rep, rep),
        out_specs=(rowspec, rep, rep, rep)))
    S_sh = jax.device_put(S, NamedSharding(mesh, rowspec))
    X, k, r, s = run_sharded(S_sh, jnp.real(Af_full), jnp.imag(Af_full),
                             jnp.real(Gf_full), jnp.imag(Gf_full))
    return X, int(k), float(r), float(s)


def cbpdn_nsharded(D, S, lmbda, mesh, opt=None, wl1=1.0,
                   dtype=None):
    """ConvBPDN (single-channel 2-D l1 CSC) with the IMAGE ROWS sharded
    over the mesh ``"data"`` axis -- the sequence-parallel analogue for
    images exceeding one device, applied to the flagship solver.

    Real-space state ``(M, N0, N1)`` is row-sharded; each iteration is
    an M-channel distributed FFT pair (:func:`dist_rfft2`), a per-bin
    rank-1 Sherman-Morrison solve (local in the frequency-column
    blocks; ``sporco/linalg.py:232-273`` is per-bin independent), a
    local prox tail, and psum'd residual norms.  Semantics are
    identical to ``ConvBPDN(D, S, lmbda, opt, fused=False)``: default
    rho/rho_xi heuristics, AutoRho with dual rescaling, normalised
    residuals, early stopping, per-iteration stats.

    Returns ``(X_user, stats, k)``: coefficient maps in the user layout
    ``(N0, N1, M)`` (a global row-sharded array), the stats buffer
    (columns ``Iter/ObjFun/DFid/RegL1/PrimalRsdl/DualRsdl/EPrimal/
    EDual/Rho`` plus one always-zero padding column that keeps the row
    width even), and the iterations run.
    """
    from sporco_tpu.models.cbpdn import ConvBPDN
    from sporco_tpu.models.common import default_rho_xi
    from sporco_tpu.solvers.admm import _update_rho
    if opt is None:
        opt = ConvBPDN.options()
    dtype = _default_dtype(dtype)
    S = jnp.asarray(S, dtype)
    D = jnp.asarray(D, dtype)
    if S.ndim != 2 or D.ndim != 3:
        raise ValueError("prototype supports 2-D single-channel S and "
                         "a (Nd0, Nd1, M) dictionary")
    N0, N1 = S.shape
    M = D.shape[-1]
    P = mesh.shape["data"]
    if N0 % P != 0:
        raise ValueError(f"N0 ({N0}) must divide the mesh data axis "
                         f"({P})")
    K1 = N1 // 2 + 1
    K1p = -(-K1 // P) * P
    ar = opt.auto_rho
    lmbda = float(lmbda)
    rho0 = opt.rho if opt.rho is not None else 50.0 * lmbda + 1.0
    rho_xi = (ar.rsdl_target if ar.rsdl_target is not None
              else default_rho_xi(lmbda))
    rlx = opt.relax_param
    wl1 = float(wl1)
    nc = math.sqrt(M * N0 * N1)
    nx = nc
    n_stat = 10

    Dm = jnp.moveaxis(D, -1, 0)                     # (M, Nd0, Nd1)
    Df_full = jnp.fft.rfft2(Dm, s=(N0, N1))
    Df_full = jnp.pad(Df_full, [(0, 0), (0, 0), (0, K1p - K1)])

    def run(S_loc, Dfr, Dfi):
        idx = lax.axis_index("data")
        c0 = idx * jnp.asarray(K1p // P, idx.dtype)
        z0 = jnp.zeros((), idx.dtype)
        Df = lax.dynamic_slice(Dfr, (z0, z0, c0), (M, N0, K1p // P)) \
            + 1j * lax.dynamic_slice(Dfi, (z0, z0, c0),
                                     (M, N0, K1p // P))
        cols = idx * (K1p // P) + jnp.arange(K1p // P)
        mask = (cols < K1)[None, :]
        # Parseval weights for the half-spectrum (rfl2norm2): double
        # every bin except the first and (even N1) last columns
        pw = jnp.where(mask, 2.0, 0.0)
        pw = jnp.where((cols == 0)[None, :], 1.0, pw)
        if N1 % 2 == 0:
            pw = jnp.where((cols == K1 - 1)[None, :], 1.0, pw)
        DHD = jnp.sum((Df * jnp.conj(Df)).real, axis=0)
        Sf = dist_rfft2(S_loc, P)                   # (N0, K1p/P)
        DSf = jnp.conj(Df) * Sf[None]

        def pnorm2(v):
            return lax.psum(jnp.sum(v * v), "data")

        def cond(st):
            k, r, s, epri, edua = st[3], st[4], st[5], st[6], st[7]
            return jnp.logical_and(
                k < opt.max_iter,
                jnp.logical_not(jnp.logical_and(r <= epri,
                                                s <= edua)))

        def body(st):
            X, Y, U, k, _, _, _, _, rho, stats = st
            Yprev = Y
            # x-step: per-bin rank-1 Sherman-Morrison in the local
            # frequency-column block (sporco/admm/cbpdn.py:267-293)
            YUf = dist_rfft2(Y - U, P)              # (M, N0, K1p/P)
            b = DSf + rho * YUf
            ahb = jnp.sum(Df * b, axis=0)
            Xf = (b - jnp.conj(Df) * (ahb / (rho + DHD))[None]) / rho
            Xl = dist_irfft2(Xf, N1, P)             # (M, n0loc, N1)
            AX = rlx * Xl + (1 - rlx) * Y
            AXU = AX + U
            thr = (lmbda / rho) * wl1
            Yn = jnp.sign(AXU) * jnp.maximum(jnp.abs(AXU) - thr, 0.0)
            Un = U + AX - Yn
            # normalised residuals (generic ADMMEqual semantics)
            rnrm = jnp.sqrt(pnorm2(Xl - Yn))
            snrm = rho * jnp.sqrt(pnorm2(Yn - Yprev))
            rn = jnp.sqrt(jnp.maximum(pnorm2(Xl), pnorm2(Yn)))
            sn = rho * jnp.sqrt(pnorm2(Un))
            if ar.std_residuals:
                r, s = rnrm, snrm
                epri = nc * opt.abs_stop_tol + rn * opt.rel_stop_tol
                edua = nx * opt.abs_stop_tol + sn * opt.rel_stop_tol
            else:
                rn_ = jnp.where(rn == 0.0, 1.0, rn)
                sn_ = jnp.where(sn == 0.0, 1.0, sn)
                r = rnrm / rn_
                s = snrm / sn_
                epri = nc * opt.abs_stop_tol / rn_ + opt.rel_stop_tol
                edua = nx * opt.abs_stop_tol / sn_ + opt.rel_stop_tol
            # objective (fEvalX): dfd from the half-spectrum with the
            # Parseval weights, l1 term over X
            if opt.fast_solve:
                obj = dfd = rl1 = jnp.nan
            else:
                Ef = jnp.sum(Df * Xf, axis=0) - Sf
                dfd = 0.5 * lax.psum(
                    jnp.sum(pw * (Ef * jnp.conj(Ef)).real), "data") \
                    / (N0 * N1)
                rl1 = wl1 * lax.psum(jnp.sum(jnp.abs(Xl)), "data")
                obj = dfd + lmbda * rl1
            row = jnp.stack([jnp.float32(k), jnp.float32(obj),
                             jnp.float32(dfd), jnp.float32(rl1),
                             jnp.float32(r), jnp.float32(s),
                             jnp.float32(epri), jnp.float32(edua),
                             jnp.float32(rho), jnp.float32(0.0)])
            stats = lax.dynamic_update_slice(
                stats, row[None, :], (k, jnp.zeros_like(k)))
            rho_n, Un = _update_rho(ar, k, r, s, rho, rho_xi, Un)
            return (Xl, Yn, Un, k + 1, r, s, epri, edua, rho_n, stats)

        rdt = S_loc.dtype
        zb = lambda: lax.pcast(
            jnp.zeros((M, S_loc.shape[0], N1), rdt), "data",
            to="varying")
        st0 = (zb(), zb(), zb(),
               jnp.asarray(0, jnp.int32),
               jnp.asarray(jnp.inf, rdt), jnp.asarray(jnp.inf, rdt),
               jnp.asarray(0.0, rdt), jnp.asarray(0.0, rdt),
               jnp.asarray(rho0, rdt),
               jnp.full((opt.max_iter, n_stat), jnp.nan, jnp.float32))
        X, Y, U, k, r, s, epri, edua, rho, stats = lax.while_loop(
            cond, body, st0)
        return Y, stats, k

    rowspec = PartitionSpec(None, "data", None)
    srow = PartitionSpec("data", None)
    rep = PartitionSpec()
    run_sharded = jax.jit(shard_map(
        run, mesh=mesh, in_specs=(srow, rep, rep),
        out_specs=(rowspec, rep, rep)))
    S_sh = jax.device_put(S, NamedSharding(mesh, srow))
    Y, stats, k = run_sharded(S_sh, jnp.real(Df_full),
                              jnp.imag(Df_full))
    X_user = jnp.moveaxis(Y, 0, -1)
    return X_user, np.asarray(stats)[:int(k)], int(k)
