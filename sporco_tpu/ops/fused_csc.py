"""Fast fused ConvBPDN ADMM driver (TPU-first spatial formulation).

This is the framework's analogue of the reference's native CUDA
extension (``sporco.cuda.cbpdn``, binding ``sporco/cuda/__init__.py:6-18``):
a specialised implementation of the single-channel CSC hot loop
(``sporco/admm/cbpdn.py:267-311``) that replaces the reference's
FFT-domain Sherman-Morrison x-step with an exactly equivalent *spatial*
Woodbury form engineered for the MXU and the HBM roofline.

The reference (and this package's generic path) solves the x-step per
DFT bin: ``Xf = solvedbi_sm(Df, rho, DSf + rho fft(Y-U))``
(``sporco/admm/cbpdn.py:275``, ``sporco/linalg.py:232``), which needs a
forward+inverse M-channel 2D FFT per iteration -- the dominant cost.
For dictionaries with small support (the common case: e.g. 8x8 filters)
the Woodbury identity

    x = yu + D^H G,   G = irfft( (Sf - rfft(D yu)) / (DHD + rho) )

turns the M-channel FFT pair into two *small-kernel spatial
convolutions* (``D yu = sum_m d_m * yu_m`` and the per-filter
correlation ``D^H G``) plus one *single-channel* FFT pair -- a ~25x FLOP
reduction, with the convolutions mapping onto the MXU.  ``DHD =
sum_m |Df_m|^2`` is loop-invariant.  The objective inner product is
free: ``DXf = rfft(D x) = rf + DHD g``.

To keep the convolutions MXU-shaped (a sum over M into ONE output
channel starves the systolic array), the whole ADMM state lives in a
**polyphase (space-to-depth) layout** inside the loop: spatial axes are
folded by a factor ``PS=8`` into channels, making ``D``'s action a
2-tap-per-axis convolution with ``PS^2 M`` input channels -- dense MXU
contractions.  The prox / dual-update / residual tail is elementwise
and layout-free, so pack/unpack happens once per ``solve()`` call, not
per iteration.

The driver reproduces the generic ``admm_solve`` semantics exactly
(normalised residuals, adaptive rho with dual rescaling, identical
per-iteration stats rows, re-entrant state) and returns the same
:class:`~sporco_tpu.solvers.admm.ADMMState` in the standard layout.
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sporco_tpu.ops import fft as sf
from sporco_tpu.solvers.admm import ADMMState, _update_rho

__all__ = ["cbpdn_solve", "eligible", "consensus_eligible",
           "xstep_kernels", "spatial_xstep"]

PS = 8            # polyphase factor (spatial fold per axis)
UNROLL = 8        # iterations per while_loop step (overhead amortisation;
                  # converged iterations inside a step are cond-skipped;
                  # 16 was measured SLOWER: 0.90 vs 0.75 ms/iter)
MAX_SUPPORT = 24  # largest filter support the spatial form beats FFT at

# Matmul precision for the polyphase x-step convolutions.
#   "high"  (default): f32-faithful.  On the Pallas kernel path the
#           accuracy-critical forward product (which feeds the
#           cancellation-prone x-step residual) runs as a 6-pass bf16
#           split (~1e-7 relative); the adjoint and rescale-correction
#           products run 3-pass (~5e-6).  Ground-truth recovery matches
#           the exact-f32 XLA path (rrs 2.4e-4 on the verify config).
#   "mixed": forward product single-pass bf16 -- slightly faster with
#           small objective drift; kept as an opt-in.  Single-pass bf16
#           for BOTH products stalls at residual ~3e-3 and never
#           converges (measured; do not lower the adjoint below
#           3-pass).
_MATMUL_PRECISION = "high"


def set_matmul_precision(mode):
    """Select the fused x-step matmul precision: "high" (default,
    f32-faithful) or "mixed" (~5% faster, small objective drift)."""
    global _MATMUL_PRECISION
    if mode not in ("high", "mixed"):
        raise ValueError("mode must be 'high' or 'mixed'")
    _MATMUL_PRECISION = mode


def get_matmul_precision():
    return _MATMUL_PRECISION


# ---------------------------------------------------------------------------
# Polyphase packing

def poly_pack(A, ps=PS):
    """(..., N0, N1) -> (..., N0/ps, N1/ps, ps*ps) with channel order
    (w0, w1): A[..., w0 + ps p, w1 + ps q] = P[..., p, q, w0*ps + w1]."""
    lead = A.shape[:-2]
    n0, n1 = A.shape[-2:]
    P = A.reshape(lead + (n0 // ps, ps, n1 // ps, ps))
    nl = len(lead)
    perm = tuple(range(nl)) + (nl, nl + 2, nl + 1, nl + 3)
    return P.transpose(perm).reshape(lead + (n0 // ps, n1 // ps, ps * ps))


def poly_unpack(P, ps=PS):
    """Inverse of :func:`poly_pack`."""
    lead = P.shape[:-3]
    p0, p1 = P.shape[-3:-1]
    nl = len(lead)
    A = P.reshape(lead + (p0, p1, ps, ps))
    perm = tuple(range(nl)) + (nl, nl + 2, nl + 1, nl + 3)
    return A.transpose(perm).reshape(lead + (p0 * ps, p1 * ps))


def pack_state(A, ps=PS):
    """Internal CSC layout (K, 1, M, N0, N1) -> polyphase NHWC
    (K, N0/ps, N1/ps, ps*ps*M) with channel order (w0, w1, m)."""
    K, _, M, n0, n1 = A.shape
    P = poly_pack(A.reshape(K, M, n0, n1), ps)     # (K, M, p0, p1, ps*ps)
    P = P.transpose(0, 2, 3, 4, 1)                 # (K, p0, p1, ps*ps, M)
    return P.reshape(K, n0 // ps, n1 // ps, ps * ps * M)


def unpack_state(P, M, ps=PS):
    """Inverse of :func:`pack_state`."""
    K, p0, p1, _ = P.shape
    A = P.reshape(K, p0, p1, ps * ps, M).transpose(0, 4, 1, 2, 3)
    return poly_unpack(A, ps).reshape(K, 1, M, p0 * ps, p1 * ps)


# ---------------------------------------------------------------------------
# Polyphase convolution kernels built from the dictionary

def _sel_fwd(nd, ps):
    """Selector S[a, k, w, u] = 1 iff the forward-convolution tap
    ``yu[x - u]`` at output phase ``a`` reads input phase
    ``w = (a - u) mod ps`` at polyphase shift ``j = (w - (a-u))/ps``,
    mapped to padded-conv tap ``k = J - j`` (input pre-padded by J at
    the front with wrap)."""
    J = -(-(nd - 1) // ps)
    S = np.zeros((ps, J + 1, ps, nd), np.float32)
    for a in range(ps):
        for u in range(nd):
            w = (a - u) % ps
            j = (w - (a - u)) // ps
            S[a, J - j, w, u] = 1.0
    return S, J


def _sel_adj(nd, ps):
    """Selector for the adjoint (correlation) ``G[x + u]``: output phase
    ``a`` reads phase ``w = (a + u) mod ps`` at shift ``j = (a+u-w)/ps``,
    tap ``k = j`` (input post-padded by J with wrap)."""
    J = -(-(nd - 1) // ps)
    S = np.zeros((ps, J + 1, ps, nd), np.float32)
    for a in range(ps):
        for u in range(nd):
            w = (a + u) % ps
            j = (a + u - w) // ps
            S[a, j, w, u] = 1.0
    return S, J


def _fwd_kernel(D, nd0, nd1, ps):
    """HWIO conv kernel for ``R = sum_m d_m (*) yu_m`` in polyphase:
    input channels (w0, w1, m), output channels (a0, a1)."""
    M = D.shape[0]
    S0, J0 = _sel_fwd(nd0, ps)
    S1, J1 = _sel_fwd(nd1, ps)
    # ker[kx, ky, (w0 w1 m), (a0 a1)]
    # the selectors are 0/1 so this is pure data movement -- HIGHEST
    # keeps the kernel weights f32-exact (TPU default would round to bf16)
    ker = jnp.einsum("muv,akwu,blzv->klwzmab", D,
                     jnp.asarray(S0), jnp.asarray(S1),
                     precision=lax.Precision.HIGHEST)
    ker = ker.reshape(J0 + 1, J1 + 1, ps * ps * M, ps * ps)
    return ker, J0, J1


def _adj_kernel(D, nd0, nd1, ps):
    """HWIO conv kernel for ``(D^H G)_m = corr(G, d_m)`` in polyphase:
    input channels (w0, w1), output channels (a0, a1, m)."""
    M = D.shape[0]
    S0, J0 = _sel_adj(nd0, ps)
    S1, J1 = _sel_adj(nd1, ps)
    ker = jnp.einsum("muv,akwu,blzv->klwzabm", D,
                     jnp.asarray(S0), jnp.asarray(S1),
                     precision=lax.Precision.HIGHEST)
    ker = ker.reshape(J0 + 1, J1 + 1, ps * ps, ps * ps * M)
    return ker, J0, J1


def _wrap_pad(P, j0, j1, front):
    """Circular pad of the polyphase spatial dims: by (j0, j1) at the
    front (forward conv) or back (adjoint conv)."""
    if front:
        pad = ((0, 0), (j0, 0), (j1, 0), (0, 0))
    else:
        pad = ((0, 0), (0, j0), (0, j1), (0, 0))
    return jnp.pad(P, pad, mode="wrap")


def _conv(P, ker, prec):
    return lax.conv_general_dilated(
        P, ker, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=prec)


def _fwd_combine(o, J0, J1, ps):
    """Epilogue of the forward polyphase conv: roll-and-sum the small
    per-tap matmul outputs ``o`` of shape (K, p0, p1, T*ps*ps)."""
    K, p0, p1, _ = o.shape
    T = (J0 + 1) * (J1 + 1)
    o = o.reshape(K, p0, p1, T, ps * ps)
    out = 0.0
    for kx in range(J0 + 1):
        for ky in range(J1 + 1):
            t = kx * (J1 + 1) + ky
            out = out + jnp.roll(o[:, :, :, t], (J0 - kx, J1 - ky),
                                 axis=(1, 2))
    return out


def _conv_fwd_mm(Pyu, Wf, J0, J1, ps, prec):
    """Forward polyphase conv as ONE dense matmul plus circular rolls of
    the small per-tap outputs.  ``out[p] = sum_k ker_k P[p + k - J]``
    becomes ``sum_k roll(P @ W_k, J - k)``; the big operand ``Pyu`` is
    read exactly once (the tap-structured ``lax.conv`` re-reads it per
    tap, measured ~3x slower)."""
    o = jnp.einsum("kpqc,cd->kpqd", Pyu, Wf, precision=prec)
    return _fwd_combine(o, J0, J1, ps)


def _adj_rolls(Gp, J0, J1):
    """Prologue of the adjoint polyphase conv: concat of the rolled
    single-channel operand (small)."""
    gs = []
    for kx in range(J0 + 1):
        for ky in range(J1 + 1):
            gs.append(jnp.roll(Gp, (-kx, -ky), axis=(1, 2)))
    return jnp.concatenate(gs, axis=-1)


def _conv_adj_mm(Gp, Wa, J0, J1, prec):
    """Adjoint polyphase conv as rolled-input concat + ONE dense matmul:
    ``out[p] = sum_k ker_k G[p + k]`` = ``concat_k roll(G, -k) @ W``;
    the big output is written exactly once."""
    gc = _adj_rolls(Gp, J0, J1)
    return jnp.einsum("kpqc,cd->kpqd", gc, Wa, precision=prec)


# ---------------------------------------------------------------------------
# Multi-channel (colour) dictionary variants: D has Cd > 1 channels and
# the coefficient maps are SHARED across channels (sporco/cnvrep.py:
# 60-84, Cx == 1), so the state arrays keep the single-channel size and
# only the forward/adjoint products and the per-bin solve grow by Cd.
# The per-pixel DFT-bin system (rho I + D^H D) x = b is solved by the
# rank-Cd Woodbury identity: x = scale yu + D^H G with
# (rho I_C + D D^H) G = Sf - rfft(D yu) -- a Cd x Cd Hermitian solve
# per frequency bin (closed-form cofactors for Cd <= 3), the
# multi-channel analogue of solvemdbi_ism (sporco/linalg.py:370).

def _fwd_kernel_mc(D, nd0, nd1, ps):
    """Forward kernel for a (C, M, nd0, nd1) dictionary: input channels
    (w0, w1, m), output channels (c, a0, a1)."""
    C, M = D.shape[0], D.shape[1]
    S0, J0 = _sel_fwd(nd0, ps)
    S1, J1 = _sel_fwd(nd1, ps)
    ker = jnp.einsum("cmuv,akwu,blzv->klwzmcab", D,
                     jnp.asarray(S0), jnp.asarray(S1),
                     precision=lax.Precision.HIGHEST)
    ker = ker.reshape(J0 + 1, J1 + 1, ps * ps * M, C * ps * ps)
    return ker, J0, J1


def _adj_kernel_mc(D, nd0, nd1, ps):
    """Adjoint kernel: input channels (c, w0, w1), output (a0, a1, m);
    sums the per-channel correlations over c."""
    C, M = D.shape[0], D.shape[1]
    S0, J0 = _sel_adj(nd0, ps)
    S1, J1 = _sel_adj(nd1, ps)
    ker = jnp.einsum("cmuv,akwu,blzv->klcwzabm", D,
                     jnp.asarray(S0), jnp.asarray(S1),
                     precision=lax.Precision.HIGHEST)
    ker = ker.reshape(J0 + 1, J1 + 1, C * ps * ps, ps * ps * M)
    return ker, J0, J1


def xstep_kernels_mc(Dsm, nd0, nd1, ps=PS):
    """Packed matmul weights for the multi-channel x-step.  ``Dsm`` is
    ``(C, M, nd0, nd1)``; returns ``(Wf, Wa, (jf0, jf1, ja0, ja1))``
    with ``Wf: (ps^2 M, (Jf0+1)(Jf1+1) C ps^2)`` and
    ``Wa: ((Ja0+1)(Ja1+1) C ps^2, ps^2 M)``."""
    C, M = Dsm.shape[0], Dsm.shape[1]
    kf, jf0, jf1 = _fwd_kernel_mc(Dsm, nd0, nd1, ps)
    ka, ja0, ja1 = _adj_kernel_mc(Dsm, nd0, nd1, ps)
    Cs = ps * ps * M
    Wf = jnp.transpose(kf, (2, 0, 1, 3)).reshape(
        Cs, (jf0 + 1) * (jf1 + 1) * C * ps * ps)
    Wa = ka.reshape((ja0 + 1) * (ja1 + 1) * C * ps * ps, Cs)
    return Wf, Wa, (jf0, jf1, ja0, ja1)


def _fwd_combine_ch(o, J0, J1, C, ps):
    """Channel-aware epilogue in the channel-packed layout: ``o`` is
    (K, p0, p1, T*C*ps^2); returns (K, p0, p1, C*ps^2) with channel
    order (c, w0, w1) -- the layout ``_adj_rolls`` /
    ``xstep_kernels_mc``'s ``Wa`` consume directly."""
    K, p0, p1, _ = o.shape
    T = (J0 + 1) * (J1 + 1)
    o = o.reshape(K, p0, p1, T, C * ps * ps)
    out = 0.0
    for kx in range(J0 + 1):
        for ky in range(J1 + 1):
            t = kx * (J1 + 1) + ky
            out = out + jnp.roll(o[:, :, :, t], (J0 - kx, J1 - ky),
                                 axis=(1, 2))
    return out


def _pack_ch(A, ps=PS):
    """(K, C, n0, n1) -> channel-packed (K, p0, p1, C*ps^2)."""
    K, C = A.shape[0], A.shape[1]
    P = poly_pack(A, ps)                           # (K, C, p0, p1, ps^2)
    return P.transpose(0, 2, 3, 1, 4).reshape(
        K, P.shape[2], P.shape[3], C * ps * ps)


def _fwd_combine_mc(o, J0, J1, C, ps):
    """Channel-aware epilogue: ``o`` is (K, p0, p1, T*C*ps^2); returns
    the C-channel image (K, C, n0, n1)."""
    K, p0, p1, _ = o.shape
    out = _fwd_combine_ch(o, J0, J1, C, ps)
    out = out.reshape(K, p0, p1, C, ps * ps).transpose(0, 3, 1, 2, 4)
    return poly_unpack(out, ps)                    # (K, C, n0, n1)


def _adj_rolls_mc(G, J0, J1, ps=PS):
    """Channel-aware prologue: pack each channel of ``G`` (K, C, n0,
    n1), concatenate per-tap rolls with channel order (t, c, w0, w1)
    matching ``xstep_kernels_mc``'s ``Wa``."""
    K, C = G.shape[0], G.shape[1]
    Gp = poly_pack(G, ps)                          # (K, C, p0, p1, ps^2)
    Gp = Gp.transpose(0, 2, 3, 1, 4).reshape(
        K, Gp.shape[2], Gp.shape[3], C * ps * ps)
    gs = []
    for kx in range(J0 + 1):
        for ky in range(J1 + 1):
            gs.append(jnp.roll(Gp, (-kx, -ky), axis=(1, 2)))
    return jnp.concatenate(gs, axis=-1)


def _herm_solve(A, beta, B):
    """Solve ``(A + beta I) g = B`` per frequency bin for Hermitian
    ``A`` of size C x C, C in (1, 2, 3), by closed-form cofactors
    (exact FLOP count; no batched LU).  ``A``: (C, C, n0, k1) complex,
    ``B``: (K, C, n0, k1) complex, ``beta`` scalar (dynamic)."""
    C = A.shape[0]
    if C == 1:
        return B / (A[0, 0] + beta)
    if C == 2:
        a = A[0, 0] + beta
        b = A[0, 1]
        c = A[1, 0]
        d = A[1, 1] + beta
        det = a * d - b * c
        g0 = (d * B[:, 0] - b * B[:, 1]) / det
        g1 = (a * B[:, 1] - c * B[:, 0]) / det
        return jnp.stack([g0, g1], axis=1)
    if C == 3:
        a = A[0, 0] + beta
        b = A[0, 1]
        c = A[0, 2]
        d = A[1, 0]
        e = A[1, 1] + beta
        f = A[1, 2]
        g = A[2, 0]
        h = A[2, 1]
        i = A[2, 2] + beta
        co00 = e * i - f * h
        co01 = c * h - b * i
        co02 = b * f - c * e
        co10 = f * g - d * i
        co11 = a * i - c * g
        co12 = c * d - a * f
        co20 = d * h - e * g
        co21 = b * g - a * h
        co22 = a * e - b * d
        det = a * co00 + b * co10 + c * co20
        B0, B1, B2 = B[:, 0], B[:, 1], B[:, 2]
        g0 = (co00 * B0 + co01 * B1 + co02 * B2) / det
        g1 = (co10 * B0 + co11 * B1 + co12 * B2) / det
        g2 = (co20 * B0 + co21 * B1 + co22 * B2) / det
        return jnp.stack([g0, g1, g2], axis=1)
    raise ValueError(f"unsupported channel count {C}")


def spatial_xstep_mc(Pyu, Wf, Wa, js, DDHf, Sf, beta, scale, Nv, C,
                     prec=lax.Precision.HIGH, prec_fwd=None):
    """Multi-channel spatial-Woodbury x-step.  ``DDHf`` is the per-bin
    Hermitian Gram ``(C, C, n0, k1)`` complex; ``Sf`` the C-channel
    signal spectrum ``(K, C, n0, k1)``.  Returns ``(PX, rf, Gf)`` (the
    spectral intermediates make the data-fidelity term free:
    ``DXf = scale rf + DDHf Gf``)."""
    jf0, jf1, ja0, ja1 = js
    axes = (-2, -1)
    o = jnp.einsum("kpqc,cd->kpqd", Pyu, Wf,
                   precision=prec if prec_fwd is None else prec_fwd)
    R = _fwd_combine_mc(o, jf0, jf1, C, PS)        # (K, C, n0, n1)
    rf = sf.rfftn(R, axes=axes)
    Gf = _herm_solve(DDHf, beta, Sf - scale * rf)
    G = sf.irfftn(Gf, s=Nv, axes=axes)
    G2 = _adj_rolls_mc(G, ja0, ja1, PS)
    PX = scale * Pyu + jnp.einsum("kpqc,cd->kpqd", G2, Wa,
                                  precision=prec)
    return PX, rf, Gf


# ---------------------------------------------------------------------------
# Shared x-step building blocks (used by this driver, the fused PGM
# problem below, and the sharded consensus-CDL loop in
# parallel/consensus.py -- one implementation, no drift)

def xstep_kernels(Dsm, nd0, nd1, ps=PS):
    """Packed single-matmul weights for the spatial-Woodbury x-step.

    ``Dsm`` is the spatial dictionary block ``(M, nd0, nd1)``.  Returns
    ``(Wf, Wa, (jf0, jf1, ja0, ja1))``: the forward/adjoint polyphase
    matmul weights and their circular-roll tap radii.
    """
    M = Dsm.shape[0]
    kf, jf0, jf1 = _fwd_kernel(Dsm, nd0, nd1, ps)
    ka, ja0, ja1 = _adj_kernel(Dsm, nd0, nd1, ps)
    C = ps * ps * M
    Wf = jnp.transpose(kf, (2, 0, 1, 3)).reshape(
        C, (jf0 + 1) * (jf1 + 1) * ps * ps)
    Wa = ka.reshape((ja0 + 1) * (ja1 + 1) * ps * ps, C)
    return Wf, Wa, (jf0, jf1, ja0, ja1)


def spatial_xstep(Pyu, Wf, Wa, js, DHD, sfr, sfi, beta, scale, Nv,
                  prec=lax.Precision.HIGH, prec_fwd=None):
    """The spatial-Woodbury CSC x-step in the packed polyphase layout.

    Solves ``(beta I + D^H D) x = beta yu + D^H s`` (the ConvBPDN
    x-step, ``sporco/admm/cbpdn.py:267-293``; ``scale = rho/beta``
    handles the elastic-net variant) as::

        x = scale * yu + D^H irfft((Sf - scale * rfft(D yu)) / (DHD + beta))

    Returns ``(PX, rfr, rfi, gr, gi)``; the spectral intermediates make
    the data-fidelity term free for callers that report it
    (``DXf - Sf = scale*rf + DHD*g - Sf``).
    """
    jf0, jf1, ja0, ja1 = js
    axes = (-2, -1)
    R = poly_unpack(_conv_fwd_mm(Pyu, Wf, jf0, jf1, PS,
                                 prec if prec_fwd is None else
                                 prec_fwd))
    rf = sf.rfftn(R, axes=axes)
    rfr, rfi = scale * jnp.real(rf), scale * jnp.imag(rf)
    den = 1.0 / (DHD[None] + beta)
    gr = (sfr - rfr) * den
    gi = (sfi - rfi) * den
    G = sf.irfftn(gr + 1j * gi, s=Nv, axes=axes)
    PX = scale * Pyu + _conv_adj_mm(poly_pack(G), Wa, ja0, ja1, prec)
    return PX, rfr, rfi, gr, gi


# ---------------------------------------------------------------------------
# Eligibility

def _layout_ok(cri, nd0, nd1, dtype, force=False, allow_mc=False):
    """Structural layout constraints shared by every fused entry point:
    2D, single-channel (or, with ``allow_mc``, a C-channel dictionary
    with shared coefficient maps, C <= 3 -- the rank-C Woodbury path),
    PS-aligned even spatial dims, f32.  The small-support heuristic
    (``MAX_SUPPORT``: beyond ~24^2 supports the O(N^2 M nd^2) spatial
    form loses to the FFT path) is a performance choice only and can be
    bypassed with ``force``."""
    single = cri.Cd == 1 and cri.C == 1
    mc = (allow_mc and cri.Cd == cri.C and cri.Cd in (2, 3)
          and cri.Cx == 1)
    if not (cri.dimN == 2 and (single or mc)):
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    n0, n1 = cri.Nv
    if n0 % PS != 0 or n1 % PS != 0 or n1 % 2 != 0:
        return False
    if not force and (nd0 > MAX_SUPPORT or nd1 > MAX_SUPPORT):
        return False
    return True


def eligible(cfg, params, opts, force=False):
    """Whether the fused spatial driver handles this ConvBPDN
    configuration: single-channel 2D real l1/elastic/gradreg CSC
    (optionally weighted, non-negative, or AMS-masked -- the scope of
    the reference's native CUDA ``cbpdn``/``cbpdngrd``/``cbpdnmsk``/
    ``cbpdngrdmsk`` solvers).

    With ``force=True`` (from ``ConvBPDN(..., fused=True)``) the
    small-support performance heuristic is bypassed, and a structurally
    unsupported configuration raises instead of silently falling back.
    """
    cri = cfg.cri
    # colour dictionaries (rank-C Woodbury): l1/elastic, no AMS
    mc_ok = (cri.Cd > 1 and cfg.variant in ("l1", "elastic")
             and not cfg.ams_nimp)
    structural = (cfg.real and cfg.variant in ("l1", "elastic", "gradreg")
                  and not cfg.no_bndry and not cfg.lin_check
                  and cfg.obj_from_x and cfg.ams_nimp in (0, 1)
                  and (cri.Cd == 1 or mc_ok)
                  and _layout_ok(cri, cri.dsz[0], cri.dsz[1],
                                 opts.dtype, force=force,
                                 allow_mc=mc_ok))
    if structural and cfg.variant == "gradreg":
        # per-bin solve supports scalar or per-filter gradient weights
        # only (the reference's GradWeight w_m, sporco/admm/cbpdn.py:
        # 1064-1143; spatially-varying weights do not exist there)
        w = jnp.asarray(params["wgrd"])
        structural = (w.ndim == 0
                      or all(d == 1 for i, d in enumerate(w.shape)
                             if i != 2))
    if not structural:
        if force:
            raise ValueError(
                "fused=True requested, but this ConvBPDN configuration "
                "is not supported by the fused spatial driver (needs "
                "real single-channel 2D l1/elastic/gradreg CSC, "
                f"PS={PS}-aligned even spatial dims, float32)")
        return False
    return True


# ---------------------------------------------------------------------------
# Channel folding: with a single-channel dictionary (Cd == 1) and a
# multi-channel signal (C > 1), the CSC problem decomposes into C
# independent per-channel problems sharing D (sporco/cnvrep.py:60-84:
# each channel gets its own coefficient maps).  Folding the C axis into
# the batch axis K is EXACT -- the aggregate residual norms, AutoRho
# decisions, and objective sums are identical -- and lets colour-image
# problems run on the fused spatial-Woodbury driver instead of the
# generic FFT path.

def _cfold(cfg, params):
    import dataclasses
    cri = cfg.cri
    K2 = cri.K * cri.C
    cri2 = dataclasses.replace(cri, K=K2, C=1, Cx=1)
    S = params["S"]
    S2 = S.reshape((K2, 1, 1) + tuple(cri.Nv))
    return dataclasses.replace(cfg, cri=cri2), {**params, "S": S2}


def cfold_eligible(cfg, params, opts, force=False):
    """Whether the C>1 (single-channel dictionary) configuration can
    run on the fused driver by folding channels into the batch axis."""
    cri = cfg.cri
    if cri.C <= 1 or cri.Cd != 1 or cri.Cx != cri.C:
        return False
    if cfg.ams_nimp:
        # the AMS mask addresses per-channel impulse maps; folding it
        # needs a matching Wams reshape -- not implemented
        return False
    wl1 = jnp.asarray(params["wl1"])
    if wl1.ndim not in (0, 5):
        return False
    if wl1.ndim == 5 and any(d != 1 for i, d in enumerate(wl1.shape)
                             if i != 2):
        # K- or C-dependent l1 weights would need their own fold;
        # scalar and per-filter weights fold trivially
        return False
    cfg2, params2 = _cfold(cfg, params)
    return eligible(cfg2, params2, opts, force=force)


def cbpdn_solve_cfold(cfg, params, opts, state):
    """Fused solve of a C-foldable configuration: fold channels into
    K, run the fused driver, unfold the state."""
    cri = cfg.cri
    K2 = cri.K * cri.C
    cfg2, params2 = _cfold(cfg, params)

    def fold(a):
        return a.reshape((K2, 1) + a.shape[2:])

    def unfold(a):
        return a.reshape((cri.K, cri.Cx) + a.shape[2:])

    st2 = state._replace(X=fold(state.X), Y=fold(state.Y),
                         U=fold(state.U))
    out = cbpdn_solve(cfg2, params2, opts, st2)
    return out._replace(X=unfold(out.X), Y=unfold(out.Y),
                        U=unfold(out.U))


def consensus_eligible(cri, dsz, dtype, masked):
    """Whether the sharded consensus-CDL loop may use the fused
    spatial x-step for its CSC stage (parallel/consensus.py); derives
    every constraint from this module's constants.  Colour
    dictionaries (Cd == C <= 3, shared coefficient maps) use the
    rank-C Woodbury form."""
    return (not masked
            and _layout_ok(cri, dsz[0], dsz[1], dtype,
                           allow_mc=True))


# ---------------------------------------------------------------------------
# The fused driver

@partial(jax.jit, static_argnums=(0, 1, 4, 5))
def _cbpdn_fused_run(cfg, opts, params, state, prec_mode="high",
                     kern_mode=(False, False, True, False)):
    """Jitted fused solve call: identical iteration semantics to the
    generic driver (``solvers/admm.py:_admm_run``) specialised to the
    single-channel l1 CSC problem, with the spatial Woodbury x-step."""
    cri = cfg.cri
    n0, n1 = cri.Nv
    K, M = cri.K, cri.M
    nd0, nd1 = cri.dsz[0], cri.dsz[1]
    axes = (-2, -1)
    ar = opts.auto_rho
    rlx = opts.relax_param
    lmbda = params["lmbda"]
    mu = (params["mu"] if cfg.variant in ("elastic", "gradreg")
          else None)
    prec = lax.Precision.HIGH
    # "mixed": single-pass bf16 forward conv (see _MATMUL_PRECISION)
    prec_fwd = (lax.Precision.DEFAULT if prec_mode == "mixed"
                else prec)

    # l1 weights in the packed layout: scalar, per-filter channel
    # vector, or (general case) a fully packed field
    wl1 = jnp.asarray(params["wl1"])
    if wl1.ndim == 0:
        wl1p = wl1
    elif wl1.ndim == 5 and all(d == 1 for i, d in enumerate(wl1.shape)
                               if i != 2):
        wl1p = jnp.tile(wl1.reshape(-1), PS * PS)
    else:
        wl1p = pack_state(jnp.broadcast_to(
            wl1, (cfg.cri.K, 1, cfg.cri.M) + tuple(cfg.cri.Nv)))

    # AMS (wohlberg-2016-boundary): the last filter is the impulse; its
    # coefficient map takes the unshrunk value (1-W)(AX+U)
    if cfg.ams_nimp:
        K_, M_ = cfg.cri.K, cfg.cri.M
        Wp = pack_state(jnp.broadcast_to(
            params["Wams"], (K_, 1, M_) + tuple(cfg.cri.Nv)))
        sel = np.zeros((PS * PS, M_), bool)
        sel[:, -cfg.ams_nimp:] = True
        imp_sel = jnp.asarray(sel.reshape(-1))

    Cd = cri.Cd
    if Cd > 1:
        # multi-channel dictionary (rank-Cd Woodbury; eligibility
        # restricts to l1/elastic, no AMS)
        D = params["D"].reshape(Cd, M, nd0, nd1)
        S = params["S"].reshape(K, Cd, n0, n1)
        Df = sf.rfftn(D, s=cri.Nv, axes=axes)      # (Cd, M, n0, k1)
        DDHf = jnp.einsum("cmxy,dmxy->cdxy", Df, jnp.conj(Df),
                         precision=lax.Precision.HIGHEST)
        Sfc = sf.rfftn(S, axes=axes)               # (K, Cd, n0, k1)
        Wf, Wa, js = xstep_kernels_mc(D, nd0, nd1, PS)
        DHD = sfr = sfi = None
    else:
        D = params["D"].reshape(M, nd0, nd1)
        S = params["S"].reshape(K, n0, n1)

        # loop-invariant pieces
        Df = sf.rfftn(D, s=cri.Nv, axes=axes)
        DHD = jnp.sum((Df * jnp.conj(Df)).real, axis=0)    # (n0, k1)
        Sf = sf.rfftn(S, axes=axes)                        # (K, n0, k1)
        sfr, sfi = jnp.real(Sf), jnp.imag(Sf)
        if cfg.variant == "gradreg":
            # per-bin diagonal (sporco/admm/cbpdn.py:1173-1201): the
            # identity's I-part becomes bin-dependent, so the x-step
            # runs per-bin on the M-channel half-spectrum (see body)
            from sporco_tpu.utils.signal import gradient_filters
            _, GHGf = gradient_filters(2, cri.Nv, dtype=S.dtype)
            wg = params["wgrd"]
            GHGfW = (wg * GHGf if jnp.ndim(wg) == 0
                     else wg.reshape(-1, 1, 1) * GHGf)
            Wf = Wa = None
            js = (0, 0, 0, 0)
        else:
            Wf, Wa, js = xstep_kernels(D, nd0, nd1, PS)

    # Kernel selection.  ``kern_mode`` is the static tuple
    # (ptail.enabled, ptail.interpret, pkiter.enabled,
    # pkiter.interpret) so that toggling any flag invalidates the jit
    # cache (they would otherwise be silently baked into the first
    # trace).
    #
    # Preferred: the one-pass Pallas ITERATION kernel
    # (ops/pallas_csc_iter.py) -- adjoint matmul + x-step combine +
    # relax/prox/dual + reductions + next forward matmul in a single
    # pass over the state (measured 1.9 -> ~1.0 ms/iteration on the
    # 512x512x64 benchmark).  Falls back to the XLA op sequence (with
    # the optional legacy Pallas tail) for configurations the kernel
    # does not cover.
    from sporco_tpu.ops import pallas_csc_tail as ptail
    from sporco_tpu.ops import pallas_csc_iter as pki
    pos = K * (n0 // PS) * (n1 // PS)
    C = PS * PS * M
    Ta = (js[2] + 1) * (js[3] + 1) * Cd * PS * PS
    use_pk = (kern_mode[2]
              and (kern_mode[3] or jax.default_backend()
                   in ("tpu", "axon"))
              and cfg.variant in ("l1", "elastic")
              and not cfg.ams_nimp and jnp.ndim(wl1p) <= 1
              and pki.iter_supported(pos, C, Ta))
    use_ptail = (kern_mode[0] and not use_pk
                 and not cfg.ams_nimp and jnp.ndim(wl1p) <= 1
                 and ptail.tail_eligible(K * (n0 // PS) * (n1 // PS),
                                         PS * PS * M))
    if use_pk:
        Wa_sp = pki.split_bf16_3(Wa)
        Wf_sp = pki.split_bf16_3(Wf)
        # Per-dot precision (pass counts of the bf16-split matmuls):
        # R1 feeds the x-step residual ``Sf - rfft(D yu)``, whose
        # cancellation near convergence amplifies relative error, so it
        # gets a second-order split (4-pass, ~5e-7 relative -- measured
        # trajectory-identical to the f32-faithful 6-pass on the
        # benchmark config, where 3-pass at ~2e-5 was not: recovery rrs
        # degraded 2.4e-4 -> 1.4e-3); the adjoint is fine at 3-pass and
        # the rescale-correction R2 needs 3-pass (1-pass was measured
        # to shift the trajectory ~3e-3 under period-1 AutoRho
        # rescaling, where its ``1 - us`` factor is not small).
        # "mixed" drops R1 to single-pass.
        fwd_passes = 1 if prec_mode == "mixed" else 4
        adj_passes = 3
        r2_passes = 3

    k0 = state.k
    nc = math.sqrt(K * M * n0 * n1)
    nx = nc

    def converged(st):
        return jnp.logical_or(
            jnp.logical_and(st.r <= st.epri, st.s <= st.edua),
            st.k - k0 >= opts.max_iter)

    def cond(st):
        return jnp.logical_not(converged(st))

    def body(carry):
        st, us = carry
        # ``us`` is the deferred AutoRho dual-rescale factor: the true
        # dual is ``us * st.U`` -- folding the (per-iteration, period-1)
        # ``U /= rsf`` of sporco/admm/admm.py:572-573 into the adjacent
        # elementwise passes instead of a dedicated 134 MB read+write
        PY = st.Y
        rho = st.rho
        PU = us * st.U
        Pyu = PY - PU
        if cfg.variant == "gradreg":
            # ---- x-step with per-bin diagonal Lam = rho + mu w GHGf
            # (== solvedbd_sm of the FFT path): the rank-1 Woodbury
            # still applies per bin, but the diagonal inverse acts on
            # the full M-channel half-spectrum, so this variant pays
            # the M-channel DFT pair the spatial form otherwise
            # eliminates; the prox/dual/residual tail stays packed.
            yu = unpack_state(Pyu, M).reshape(K, M, n0, n1)
            yuf = sf.rfftn(yu, axes=axes)                 # (K,M,n0,k1)
            Lam = rho + mu * GHGfW
            e = 1.0 / Lam
            bg = rho * yuf + jnp.conj(Df)[None] * Sf[:, None]
            tg = e * bg
            alpha = jnp.sum(Df[None] * tg, axis=1)        # (K,n0,k1)
            betaS = jnp.sum((Df * jnp.conj(Df)).real * e, axis=-3)
            Xfg = tg - (alpha / (1.0 + betaS))[:, None] \
                * (e * jnp.conj(Df)[None])
            Xg = sf.irfftn(Xfg, s=cri.Nv, axes=axes)
            PX = pack_state(Xg.reshape(K, 1, M, n0, n1))
        else:
            # ---- x-step (spatial Woodbury; == solvedbi_sm of the FFT
            # path).  elastic-net adds (mu/2)||x||^2: the system matrix
            # becomes (rho+mu)I + D^H D, so with beta = rho+mu the same
            # identity holds with yu scaled by rho/beta
            # (sporco/admm/cbpdn.py:948-975)
            if mu is None:
                beta, scale = rho, 1.0
            else:
                beta = rho + mu
                scale = rho / beta
            if Cd > 1:
                PX, rf_mc, Gf_mc = spatial_xstep_mc(
                    Pyu, Wf, Wa, js, DDHf, Sfc, beta, scale, cri.Nv,
                    Cd, prec, prec_fwd)
            else:
                PX, rfr, rfi, gr, gi = spatial_xstep(
                    Pyu, Wf, Wa, js, DHD, sfr, sfi, beta, scale,
                    cri.Nv, prec, prec_fwd)

        # ---- relax, prox y-step, dual update, residual reductions
        thr = (lmbda / rho) * wl1p
        rl1_pt = None
        if use_ptail:
            # single fused pass: read PX/PY/U once, write PYn/PUn once
            PYn, PUn, ts = ptail.admm_tail(PX, PY, st.U, thr, wl1p,
                                           rlx, nonneg=cfg.non_neg,
                                           us=us)
            rnrm = jnp.sqrt(ts[0])
            snrm = rho * jnp.sqrt(ts[1])
            rn = jnp.sqrt(jnp.maximum(ts[2], ts[3]))
            sn = rho * jnp.sqrt(ts[4])
            rl1_pt = ts[5]
        else:
            AX = rlx * PX + (1.0 - rlx) * PY
            AXU = AX + PU
            PYn = jnp.sign(AXU) * jnp.maximum(jnp.abs(AXU) - thr, 0.0)
            if cfg.non_neg:
                PYn = jnp.maximum(PYn, 0.0)
            if cfg.ams_nimp:
                PYn = jnp.where(imp_sel, (1.0 - Wp) * AXU, PYn)
            PUn = PU + AX - PYn

            # ---- residuals (sporco/admm/admm.py:462-486, normalised)
            rnrm = jnp.linalg.norm((PX - PYn).ravel())
            snrm = rho * jnp.linalg.norm((PYn - PY).ravel())
            rn = jnp.maximum(jnp.linalg.norm(PX.ravel()),
                             jnp.linalg.norm(PYn.ravel()))
            sn = rho * jnp.linalg.norm(PUn.ravel())
        if ar.std_residuals:
            r = rnrm
            s = snrm
            epri = nc * opts.abs_stop_tol + rn * opts.rel_stop_tol
            edua = nx * opts.abs_stop_tol + sn * opts.rel_stop_tol
        else:
            rn_ = jnp.where(rn == 0.0, 1.0, rn)
            sn_ = jnp.where(sn == 0.0, 1.0, sn)
            r = rnrm / rn_
            s = snrm / sn_
            epri = nc * opts.abs_stop_tol / rn_ + opts.rel_stop_tol
            edua = nx * opts.abs_stop_tol / sn_ + opts.rel_stop_tol

        # ---- objective (fEvalX semantics, sporco/admm/cbpdn.py:325-345)
        # DXf - Sf = scale rf + DHD g - Sf  (free: no extra FFT or pass)
        nobj = 4 if mu is None else 5
        if opts.fast_solve:
            objv = (jnp.nan,) * nobj
        else:
            rl1 = rl1_pt if rl1_pt is not None \
                else jnp.sum(jnp.abs(wl1p * PX))
            if cfg.variant == "gradreg":
                DXf = jnp.sum(Df[None] * Xfg, axis=1)
                er = jnp.real(DXf) - sfr
                ei = jnp.imag(DXf) - sfi
                dfd = 0.5 * _rfl2norm2_planar(er, ei, n1)
                sqg = (Xfg * jnp.conj(Xfg)).real * GHGfW
                rgr = 0.5 * _rfl2norm2_sq(sqg, n1)
                objv = (dfd + lmbda * rl1 + mu * rgr, dfd, rl1, rgr,
                        jnp.nan)
            elif Cd > 1:
                # DXf = scale rf + DDHf Gf (free spectral identity)
                DXf = scale * rf_mc + jnp.einsum(
                    "cdxy,kdxy->kcxy", DDHf, Gf_mc,
                    precision=lax.Precision.HIGHEST)
                er = DXf - Sfc
                dfd = 0.5 * _rfl2norm2_sq((er * jnp.conj(er)).real,
                                          n1)
                if mu is None:
                    objv = (dfd + lmbda * rl1, dfd, rl1, jnp.nan)
                else:
                    rl2 = 0.5 * jnp.sum(PX ** 2)
                    objv = (dfd + lmbda * rl1 + mu * rl2, dfd, rl1,
                            rl2, jnp.nan)
            else:
                er = rfr + DHD[None] * gr - sfr
                ei = rfi + DHD[None] * gi - sfi
                dfd = 0.5 * _rfl2norm2_planar(er, ei, n1)
                if mu is None:
                    objv = (dfd + lmbda * rl1, dfd, rl1, jnp.nan)
                else:
                    rl2 = 0.5 * (ts[2] if rl1_pt is not None
                                 else jnp.sum(PX ** 2))
                    objv = (dfd + lmbda * rl1 + mu * rl2, dfd, rl1,
                            rl2, jnp.nan)

        row_idx = st.k - k0
        row = jnp.stack([jnp.float32(st.k)]
                        + [jnp.float32(o) for o in objv]
                        + [jnp.float32(r), jnp.float32(s),
                           jnp.float32(epri), jnp.float32(edua),
                           jnp.float32(st.rho)])
        stats = lax.dynamic_update_slice(
            st.stats, row[None, :], (row_idx, jnp.zeros_like(row_idx)))

        if opts.verbose:
            jax.debug.print(
                "it {k}  obj {o:.4e}  r {r:.3e}  s {s:.3e}  rho {rho:.3e}",
                k=st.k, o=row[1], r=r, s=s, rho=st.rho)

        rho_new, usn = _update_rho(ar, st.k, r, s, rho, st.rho_xi,
                                   jnp.float32(1.0))
        st2 = ADMMState(X=PX, Y=PYn, U=PUn, rho=rho_new,
                        rho_xi=st.rho_xi, k=st.k + 1, r=r, s=s,
                        epri=epri, edua=edua, stats=stats,
                        extra=st.extra)
        return (st2, usn)

    def _norm_residuals(rnrm, snrm, rn, sn):
        """Normalised (or std) residuals + tolerances
        (sporco/admm/admm.py:462-486)."""
        if ar.std_residuals:
            r, s = rnrm, snrm
            epri = nc * opts.abs_stop_tol + rn * opts.rel_stop_tol
            edua = nx * opts.abs_stop_tol + sn * opts.rel_stop_tol
        else:
            rn_ = jnp.where(rn == 0.0, 1.0, rn)
            sn_ = jnp.where(sn == 0.0, 1.0, sn)
            r = rnrm / rn_
            s = snrm / sn_
            epri = nc * opts.abs_stop_tol / rn_ + opts.rel_stop_tol
            edua = nx * opts.abs_stop_tol / sn_ + opts.rel_stop_tol
        return r, s, epri, edua

    def body_pk(carry):
        # Restructured iteration around the one-pass Pallas kernel
        # (ops/pallas_csc_iter.py): the small spectral glue (FFT pair,
        # per-bin solve, rolls) runs in XLA; everything touching the
        # packed state arrays happens inside the kernel, including the
        # NEXT iteration's forward matmul product ``R1``.
        st, us, R1 = carry
        PY, PUr = st.Y, st.U          # true dual = us * PUr
        rho = st.rho
        if mu is None:
            beta, scale = rho, jnp.float32(1.0)
        else:
            beta = rho + mu
            scale = rho / beta
        jf0, jf1, ja0, ja1 = js
        # forward product, rescale-corrected by linearity:
        # (Y - us*U) @ Wf = R1 + (1-us)*R2 -- small-tensor math only
        # (see pallas_csc_iter docstring for why not a lax.cond)
        R1p, R2p = R1
        o2 = R1p + (1.0 - us) * R2p
        o4 = o2.reshape(K, n0 // PS, n1 // PS, -1)
        if Cd > 1:
            Rm = _fwd_combine_mc(o4, jf0, jf1, Cd, PS)  # (K,Cd,n0,n1)
            rf_mc = sf.rfftn(Rm, axes=axes)
            Gf_mc = _herm_solve(DDHf, beta, Sfc - scale * rf_mc)
            G = sf.irfftn(Gf_mc, s=cri.Nv, axes=axes)
            G2 = _adj_rolls_mc(G, ja0, ja1, PS)
        else:
            R = poly_unpack(_fwd_combine(o4, jf0, jf1, PS))
            rf = sf.rfftn(R, axes=axes)
            rfr, rfi = scale * jnp.real(rf), scale * jnp.imag(rf)
            den = 1.0 / (DHD[None] + beta)
            gr = (sfr - rfr) * den
            gi = (sfi - rfi) * den
            G = sf.irfftn(gr + 1j * gi, s=cri.Nv, axes=axes)
            G2 = _adj_rolls(poly_pack(G), ja0, ja1)
        thr = (lmbda / rho) * wl1p
        # emit_px=False: X is only consumed through the kernel's fused
        # reduction sums inside the loop; skipping its 67 MB/iter store
        # cuts ~20% of the kernel's HBM traffic.  The final X is
        # materialised once after the loop (see below).
        _, PY2, PU2, R1n, R2n, sums = pki.csc_iter(
            G2.reshape(pos, Ta), PY.reshape(pos, C),
            PUr.reshape(pos, C), Wa_sp, Wf_sp, thr, wl1p, rlx, us,
            scale, nonneg=cfg.non_neg, fwd_passes=fwd_passes,
            adj_passes=adj_passes, r2_passes=r2_passes, emit_px=False)
        pshape = PY.shape
        PX = st.X                      # carried through unchanged
        PYn = PY2.reshape(pshape)
        PUn = PU2.reshape(pshape)
        rnrm = jnp.sqrt(sums[0])
        snrm = rho * jnp.sqrt(sums[1])
        rn = jnp.sqrt(jnp.maximum(sums[2], sums[3]))
        sn = rho * jnp.sqrt(sums[4])
        r, s, epri, edua = _norm_residuals(rnrm, snrm, rn, sn)

        # objective (fEvalX): dfd from the free spectral identity
        # DXf - Sf = scale*rf + DHD*g - Sf; l1/l2 terms from the
        # kernel's fused sums
        nobj = 4 if mu is None else 5
        if opts.fast_solve:
            objv = (jnp.nan,) * nobj
        else:
            rl1 = sums[5]
            if Cd > 1:
                DXf = scale * rf_mc + jnp.einsum(
                    "cdxy,kdxy->kcxy", DDHf, Gf_mc,
                    precision=lax.Precision.HIGHEST)
                erc = DXf - Sfc
                dfd = 0.5 * _rfl2norm2_sq((erc * jnp.conj(erc)).real,
                                          n1)
            else:
                er = rfr + DHD[None] * gr - sfr
                ei = rfi + DHD[None] * gi - sfi
                dfd = 0.5 * _rfl2norm2_planar(er, ei, n1)
            if mu is None:
                objv = (dfd + lmbda * rl1, dfd, rl1, jnp.nan)
            else:
                rl2 = 0.5 * sums[2]
                objv = (dfd + lmbda * rl1 + mu * rl2, dfd, rl1, rl2,
                        jnp.nan)

        row_idx = st.k - k0
        row = jnp.stack([jnp.float32(st.k)]
                        + [jnp.float32(o) for o in objv]
                        + [jnp.float32(r), jnp.float32(s),
                           jnp.float32(epri), jnp.float32(edua),
                           jnp.float32(st.rho)])
        stats = lax.dynamic_update_slice(
            st.stats, row[None, :], (row_idx, jnp.zeros_like(row_idx)))

        if opts.verbose:
            jax.debug.print(
                "it {k}  obj {o:.4e}  r {r:.3e}  s {s:.3e}  rho {rho:.3e}",
                k=st.k, o=row[1], r=r, s=s, rho=st.rho)

        rho_new, usn = _update_rho(ar, st.k, r, s, rho, st.rho_xi,
                                   jnp.float32(1.0))
        st2 = ADMMState(X=PX, Y=PYn, U=PUn, rho=rho_new,
                        rho_xi=st.rho_xi, k=st.k + 1, r=r, s=s,
                        epri=epri, edua=edua, stats=stats,
                        extra=st.extra)
        return (st2, usn, (R1n, R2n))

    def body_unrolled(carry):
        # amortise the per-step while_loop overhead (~0.3 ms on the
        # relay backend) over UNROLL exactly-guarded iterations: each
        # inner iteration is skipped via lax.cond once converged, so
        # semantics are identical to a per-iteration loop
        step = body_pk if use_pk else body
        carry = step(carry)
        for _ in range(UNROLL - 1):
            carry = lax.cond(converged(carry[0]), lambda c: c, step,
                             carry)
        return carry

    st0 = state._replace(X=pack_state(state.X), Y=pack_state(state.Y),
                         U=pack_state(state.U))
    if use_pk:
        R10 = jnp.einsum("kpqc,cd->kpqd", st0.Y - st0.U, Wf,
                         precision=prec_fwd).reshape(pos, -1)
        R20 = jnp.einsum("kpqc,cd->kpqd", st0.U, Wf,
                         precision=prec_fwd).reshape(pos, -1)
        stf, usf, _ = lax.while_loop(lambda c: cond(c[0]),
                                     body_unrolled,
                                     (st0, jnp.float32(1.0),
                                      (R10, R20)))
        # The loop body never stores X (emit_px=False saves a 67 MB
        # write per iteration); materialise it once here as the x-step
        # at the final (Y, U, rho) -- exactly what the next iteration
        # (or a resumed solve) would compute.  It differs from the last
        # in-loop X by O(stopping tolerance); all per-iteration X
        # statistics were computed exactly inside the kernel.
        if mu is None:
            beta_f, scale_f = stf.rho, jnp.float32(1.0)
        else:
            beta_f = stf.rho + mu
            scale_f = stf.rho / beta_f
        if Cd > 1:
            PXf, _, _ = spatial_xstep_mc(
                stf.Y - usf * stf.U, Wf, Wa, js, DDHf, Sfc, beta_f,
                scale_f, cri.Nv, Cd, prec, prec_fwd)
        else:
            PXf, _, _, _, _ = spatial_xstep(
                stf.Y - usf * stf.U, Wf, Wa, js, DHD, sfr, sfi,
                beta_f, scale_f, cri.Nv, prec, prec_fwd)
        stf = stf._replace(X=PXf)
    else:
        stf, usf = lax.while_loop(lambda c: cond(c[0]), body_unrolled,
                                  (st0, jnp.float32(1.0)))
    shp = state.Y.shape
    return stf._replace(X=unpack_state(stf.X, M).reshape(shp),
                        Y=unpack_state(stf.Y, M).reshape(shp),
                        U=(usf * unpack_state(stf.U, M)).reshape(shp))


def _rfl2norm2_sq(sq, n1):
    """Parseval correction given per-bin squared magnitudes ``sq`` of an
    rfft half-spectrum (cf. ``sporco/fft.py:449-484``): double all bins
    except the first (and, for even n1, the last) column, divide by
    n0*n1."""
    k1 = sq.shape[-1]
    total = 2.0 * jnp.sum(sq)
    edge = jnp.sum(sq[..., 0])
    if n1 % 2 == 0:
        edge = edge + jnp.sum(sq[..., k1 - 1])
    n = sq.shape[-2] * n1
    return (total - edge) / n


def _rfl2norm2_planar(er, ei, n1):
    """Parseval-corrected squared l2 norm of an rfft half-spectrum given
    planar real/imaginary parts."""
    return _rfl2norm2_sq(er * er + ei * ei, n1)


def cbpdn_solve(cfg, params, opts, state):
    """Host wrapper mirroring :func:`sporco_tpu.solvers.admm.admm_solve`
    for the fused driver."""
    from sporco_tpu.ops import pallas_csc_tail as ptail
    from sporco_tpu.ops import pallas_csc_iter as pki
    return _cbpdn_fused_run(cfg, opts, params, state,
                            _MATMUL_PRECISION,
                            (ptail.enabled, ptail.interpret,
                             pki.enabled, pki.interpret))


# ---------------------------------------------------------------------------
# Fused PGM (FISTA) CSC problem: the same polyphase machinery applied to
# the proximal-gradient solver (``sporco/pgm/cbpdn.py:29,387``).  The
# reference's PGMDFT keeps state in the DFT domain and pays one
# M-channel FFT pair per iteration; in the packed spatial layout the
# gradient D^H(D y - s) is two MXU convolutions and the data term is an
# elementwise norm, so the whole FISTA iteration (including masked
# variants and backtracking f-evaluations) runs with ZERO FFTs.

def _pgm_aux(cfg, params):
    cri = cfg.cri
    n0, n1 = cri.Nv
    M = cri.M
    Cd = cri.Cd
    nd0, nd1 = cri.dsz[0], cri.dsz[1]
    if Cd > 1:
        # colour dictionary: channel-aware weights and channel-packed
        # signal/mask (the residual lives in (K, p0, p1, Cd*ps^2))
        D = params["D"].reshape(Cd, M, nd0, nd1)
        Wf, Wa, js = xstep_kernels_mc(D, nd0, nd1, PS)
        jf0, jf1, ja0, ja1 = js
        aux = {
            "Wf": Wf, "Wa": Wa, "j": js, "Cd": Cd,
            "Sp": _pack_ch(params["S"].reshape(cri.K, Cd, n0, n1)),
            "wl1p": _packed_l1_weight(params["wl1"], cri),
        }
        if cfg.masked:
            W = params["W"]
            Wm = jnp.broadcast_to(
                W.reshape(W.shape[0], W.shape[1], *W.shape[-2:]),
                (cri.K, Cd, n0, n1))
            aux["Wp2"] = _pack_ch(Wm) ** 2
        return aux
    D = params["D"].reshape(M, nd0, nd1)
    kf, jf0, jf1 = _fwd_kernel(D, nd0, nd1, PS)
    ka, ja0, ja1 = _adj_kernel(D, nd0, nd1, PS)
    C = PS * PS * M
    Tf = (jf0 + 1) * (jf1 + 1)
    aux = {
        "Wf": jnp.transpose(kf, (2, 0, 1, 3)).reshape(C, Tf * PS * PS),
        "Wa": ka.reshape((ja0 + 1) * (ja1 + 1) * PS * PS, C),
        "j": (jf0, jf1, ja0, ja1),
        "Cd": 1,
        "Sp": poly_pack(params["S"].reshape(cri.K, n0, n1)),
        "wl1p": _packed_l1_weight(params["wl1"], cri),
    }
    if cfg.masked:
        Wm = jnp.broadcast_to(params["W"].reshape(
            params["W"].shape[0], *params["W"].shape[-2:]),
            (cri.K, n0, n1))
        aux["Wp2"] = poly_pack(Wm) ** 2
    return aux


def _packed_l1_weight(wl1, cri):
    wl1 = jnp.asarray(wl1)
    if wl1.ndim == 0:
        return wl1
    if wl1.ndim == 5 and all(d == 1 for i, d in enumerate(wl1.shape)
                             if i != 2):
        return jnp.tile(wl1.reshape(-1), PS * PS)
    return pack_state(jnp.broadcast_to(
        wl1, (cri.K, 1, cri.M) + tuple(cri.Nv)))


def _pgm_resid(cfg, aux, Yp):
    jf0, jf1, _, _ = aux["j"]
    o = jnp.einsum("kpqc,cd->kpqd", Yp, aux["Wf"],
                   precision=lax.Precision.HIGH)
    return _fwd_combine_ch(o, jf0, jf1, aux["Cd"], PS) - aux["Sp"]


def _pgm_grad(cfg, aux, params, Yp):
    _, _, ja0, ja1 = aux["j"]
    Rp = _pgm_resid(cfg, aux, Yp)
    if cfg.masked:
        Rp = aux["Wp2"] * Rp
    return _conv_adj_mm(Rp, aux["Wa"], ja0, ja1, lax.Precision.HIGH)


def _pgm_prox(cfg, aux, params, Vp, L):
    thr = (params["lmbda"] / L) * aux["wl1p"]
    U = jnp.sign(Vp) * jnp.maximum(jnp.abs(Vp) - thr, 0.0)
    if cfg.non_neg:
        U = jnp.maximum(U, 0.0)
    return U


def _pgm_f(cfg, aux, params, Xp):
    Rp = _pgm_resid(cfg, aux, Xp)
    if cfg.masked:
        return 0.5 * jnp.sum(aux["Wp2"] * Rp ** 2)
    return 0.5 * jnp.sum(Rp ** 2)


def _pgm_g(cfg, aux, params, Xp):
    return params["lmbda"] * jnp.sum(jnp.abs(aux["wl1p"] * Xp))


def _pgm_obfn(cfg, aux, params, Xp):
    f = _pgm_f(cfg, aux, params, Xp)
    reg = jnp.sum(jnp.abs(aux["wl1p"] * Xp))
    return (f + params["lmbda"] * reg, f, reg)


def _pgm_hess(cfg, aux, params, Vp):
    jf0, jf1, ja0, ja1 = aux["j"]
    o = jnp.einsum("kpqc,cd->kpqd", Vp, aux["Wf"],
                   precision=lax.Precision.HIGH)
    Rp = _fwd_combine_ch(o, jf0, jf1, aux["Cd"], PS)
    return _conv_adj_mm(Rp, aux["Wa"], ja0, ja1, lax.Precision.HIGH)


def _pgm_xinit(cfg, params):
    cri = cfg.cri
    return jnp.zeros((cri.K, cri.Nv[0] // PS, cri.Nv[1] // PS,
                      PS * PS * cri.M), params["S"].dtype)


def pgm_eligible(cfg, params, opts, force=False):
    """Whether the fused packed-layout PGM problem handles this
    (possibly masked) ConvBPDN configuration (single-channel, or a
    colour dictionary with shared coefficient maps, C <= 3)."""
    cri = cfg.cri
    single = cri.Cd == 1 and cri.C == 1
    mc = (cri.Cd == cri.C and cri.Cd in (2, 3) and cri.Cx == 1)
    if not (cri.dimN == 2 and (single or mc) and not cfg.no_bndry):
        return False
    if jnp.dtype(opts.dtype) != jnp.dtype(jnp.float32):
        return False
    n0, n1 = cri.Nv
    if n0 % PS != 0 or n1 % PS != 0 or n1 % 2 != 0:
        return False
    nd0, nd1 = cri.dsz[0], cri.dsz[1]
    if nd0 > 24 or nd1 > 24:
        return False
    return True


def _pgm_cfold(cfg, params):
    """Fold the channel axis into the batch axis for the PGM problem
    (same exactness argument as :func:`_cfold`; the mask is broadcast
    and folded alongside the signal)."""
    import dataclasses
    cri = cfg.cri
    K2 = cri.K * cri.C
    Nv = tuple(cri.Nv)
    cri2 = dataclasses.replace(cri, K=K2, C=1, Cx=1)
    S2 = params["S"].reshape((K2, 1, 1) + Nv)
    W = params["W"]
    if W.ndim >= 2 and (W.shape[0] > 1 or W.shape[1] > 1):
        W = jnp.broadcast_to(
            W, (cri.K, cri.C, 1) + Nv).reshape((K2, 1, 1) + Nv)
    return (dataclasses.replace(cfg, cri=cri2),
            {**params, "S": S2, "W": W})


def pgm_cfold_eligible(cfg, params, opts, force=False):
    """Whether a C>1 (single-channel dictionary) PGM configuration can
    run the fused packed-layout problem by channel folding."""
    cri = cfg.cri
    if cri.C <= 1 or cri.Cd != 1 or cri.Cx != cri.C:
        return False
    wl1 = jnp.asarray(params["wl1"])
    if wl1.ndim not in (0, 5):
        return False
    if wl1.ndim == 5 and any(d != 1 for i, d in enumerate(wl1.shape)
                             if i != 2):
        return False
    cfg2, params2 = _pgm_cfold(cfg, params)
    return pgm_eligible(cfg2, params2, opts, force=force)


def pgm_cbpdn_solve_cfold(cfg, params, opts, state):
    """Fused FISTA solve of a C-foldable configuration."""
    cri = cfg.cri
    K2 = cri.K * cri.C
    cfg2, params2 = _pgm_cfold(cfg, params)

    def fold(a):
        return a.reshape((K2, 1) + a.shape[2:])

    def unfold(a):
        return a.reshape((cri.K, cri.Cx) + a.shape[2:])

    st2 = state._replace(X=fold(state.X), Y=fold(state.Y),
                         Xprv=fold(state.Xprv),
                         Gprv=fold(state.Gprv), Zrb=fold(state.Zrb))
    out = pgm_cbpdn_solve(cfg2, params2, opts, st2)
    return out._replace(X=unfold(out.X), Y=unfold(out.Y),
                        Xprv=unfold(out.Xprv),
                        Gprv=unfold(out.Gprv), Zrb=unfold(out.Zrb))


@partial(jax.jit, static_argnums=(0, 1, 4, 5))
def _pgm_fused_kernel_run(cfg, opts, params, state, prec_mode,
                          interpret=False):
    """FISTA CSC loop around the one-pass Pallas kernel
    (:func:`sporco_tpu.ops.pallas_csc_iter.pgm_iter`): gradient adjoint
    matmul + prox + momentum extrapolation + next forward product in a
    single pass over the packed state, ZERO FFTs per iteration (the
    residual/objective live entirely on the small roll-combined
    forward products)."""
    from sporco_tpu.ops import pallas_csc_iter as pki
    from sporco_tpu.solvers.pgm import _momentum_update
    cri = cfg.cri
    n0, n1 = cri.Nv
    K, M = cri.K, cri.M
    nd0, nd1 = cri.dsz[0], cri.dsz[1]
    p0, p1 = n0 // PS, n1 // PS
    pos = K * p0 * p1
    C = PS * PS * M
    lmbda = params["lmbda"]
    prec_fwd = (lax.Precision.DEFAULT if prec_mode == "mixed"
                else lax.Precision.HIGH)
    # second-order 4-pass split for the gradient's forward product
    # (same accuracy reasoning as the ADMM kernel above)
    fwd_passes = 1 if prec_mode == "mixed" else 4

    Cd = cri.Cd
    if Cd > 1:
        D = params["D"].reshape(Cd, M, nd0, nd1)
        Wf, Wa, js = xstep_kernels_mc(D, nd0, nd1, PS)
        Sp = _pack_ch(params["S"].reshape(K, Cd, n0, n1))
    else:
        D = params["D"].reshape(M, nd0, nd1)
        Wf, Wa, js = xstep_kernels(D, nd0, nd1, PS)
        Sp = poly_pack(params["S"].reshape(K, n0, n1))
    jf0, jf1, ja0, ja1 = js
    Ta = (ja0 + 1) * (ja1 + 1) * Cd * PS * PS
    Wa_sp = pki.split_bf16_3(Wa)
    Wf_sp = pki.split_bf16_3(Wf)
    wl1p = _packed_l1_weight(params["wl1"], cri)
    if cfg.masked:
        if Cd > 1:
            W = params["W"]
            Wm = jnp.broadcast_to(
                W.reshape(W.shape[0], W.shape[1], *W.shape[-2:]),
                (K, Cd, n0, n1))
            Wp2 = _pack_ch(Wm) ** 2
        else:
            Wm = jnp.broadcast_to(params["W"].reshape(
                params["W"].shape[0], *params["W"].shape[-2:]),
                (K, n0, n1))
            Wp2 = poly_pack(Wm) ** 2
    k0 = state.k

    def cond(c):
        st = c[0]
        tol = opts.rel_stop_tol
        if opts.auto_stop:
            tol = opts.auto_stop_tau0 / (1.0
                                         + st.k.astype(st.rsdl.dtype))
        return jnp.logical_and(st.k - k0 < opts.max_iter,
                               st.rsdl >= tol)

    def body(c):
        st, R1 = c
        L = st.L
        # gradient operand: roll-combine the forward product, subtract
        # S, (mask), and build the adjoint rolls -- all small tensors
        o4 = R1.reshape(K, p0, p1, -1)
        Rp = _fwd_combine_ch(o4, jf0, jf1, Cd, PS) - Sp
        Rg = Wp2 * Rp if cfg.masked else Rp
        G2 = _adj_rolls(Rg, ja0, ja1)
        tprv = st.t
        t = _momentum_update(opts, st.t, st.k)
        beta = (tprv - 1.0) / t
        thr = (lmbda / L) * wl1p
        X2, Y2, R1n, RX, sums = pki.pgm_iter(
            G2.reshape(pos, Ta), st.Y.reshape(pos, C),
            st.X.reshape(pos, C), Wa_sp, Wf_sp, thr, wl1p, 1.0 / L,
            beta, nonneg=cfg.non_neg, fwd_passes=fwd_passes)
        pshape = st.Y.shape
        X = X2.reshape(pshape)
        Yn = Y2.reshape(pshape)
        rsdl = jnp.sqrt(sums[0])

        if opts.fast_solve:
            objv = (jnp.nan,) * 3
        else:
            RpX = _fwd_combine_ch(RX.reshape(K, p0, p1, -1), jf0, jf1,
                                  Cd, PS) - Sp
            if cfg.masked:
                f = 0.5 * jnp.sum(Wp2 * RpX ** 2)
            else:
                f = 0.5 * jnp.sum(RpX ** 2)
            objv = (f + lmbda * sums[1], f, sums[1])

        row_idx = st.k - k0
        nanv = jnp.float32(jnp.nan)
        row = jnp.stack([jnp.float32(st.k)]
                        + [jnp.float32(o) for o in objv]
                        + [jnp.float32(rsdl), nanv, nanv,
                           jnp.float32(0.0), jnp.float32(L)])
        stats = lax.dynamic_update_slice(
            st.stats, row[None, :], (row_idx, jnp.zeros_like(row_idx)))
        if opts.verbose:
            jax.debug.print(
                "it {k}  obj {o:.4e}  rsdl {r:.3e}  L {L:.3e}",
                k=st.k, o=row[1], r=rsdl, L=L)
        st2 = st._replace(X=X, Y=Yn, Xprv=X, t=t, k=st.k + 1,
                          rsdl=rsdl, stats=stats)
        return (st2, R1n)

    st0 = state._replace(
        X=pack_state(state.X), Y=pack_state(state.Y),
        Xprv=pack_state(state.Xprv), Gprv=pack_state(state.Gprv),
        Zrb=pack_state(state.Zrb))
    R10 = jnp.einsum("kpqc,cd->kpqd",
                     st0.Y.reshape(K, p0, p1, C), Wf,
                     precision=prec_fwd).reshape(pos, -1)
    stf, _ = lax.while_loop(cond, body, (st0, R10))
    shp = state.X.shape
    unp = lambda P: unpack_state(P, M).reshape(shp)
    return stf._replace(X=unp(stf.X), Y=unp(stf.Y), Xprv=unp(stf.Xprv),
                        Gprv=unp(stf.Gprv), Zrb=unp(stf.Zrb))


def _pgm_kernel_eligible(cfg, params, opts):
    """Whether the Pallas FISTA kernel covers this configuration:
    plain momentum step (no backtracking/stepsize policy/monotone),
    scalar or per-channel l1 weights, supported packed geometry."""
    from sporco_tpu.ops import pallas_csc_iter as pki
    if not (pki.enabled
            and (pki.interpret
                 or jax.default_backend() in ("tpu", "axon"))):
        return False
    if (opts.backtrack != "none" or opts.stepsize != "none"
            or opts.monotone):
        return False
    cri = cfg.cri
    wl1p = _packed_l1_weight(params["wl1"], cfg.cri)
    pos = cri.K * (cri.Nv[0] // PS) * (cri.Nv[1] // PS)
    C = PS * PS * cri.M
    J = -(-(cri.dsz[0] - 1) // PS)
    Ta = ((J + 1) * (-(-(cri.dsz[1] - 1) // PS) + 1)
          * cri.Cd * PS * PS)
    return (jnp.ndim(wl1p) <= 1
            and pki.iter_supported(pos, C, Ta))


def pgm_cbpdn_solve(cfg, params, opts, state):
    """Pack the PGM state into the polyphase layout, run the jitted
    FISTA loop over the fused problem (through the one-pass Pallas
    kernel when the configuration allows), and unpack.  Pure layout
    permutation: residual norms, inner products, and stats are
    identical to the generic path."""
    from sporco_tpu.solvers import pgm as _pgm
    if _pgm_kernel_eligible(cfg, params, opts):
        from sporco_tpu.ops import pallas_csc_iter as pki
        # interpret is part of the static key so tests toggling it
        # retrace rather than hitting a stale cache entry
        return _pgm_fused_kernel_run(cfg, opts, params, state,
                                     _MATMUL_PRECISION, pki.interpret)
    shp = state.X.shape
    M = cfg.cri.M
    packed = state._replace(
        X=pack_state(state.X), Y=pack_state(state.Y),
        Xprv=pack_state(state.Xprv), Gprv=pack_state(state.Gprv),
        Zrb=pack_state(state.Zrb))
    out = _pgm._pgm_run(_CBPDN_PGM_FUSED, cfg, params, opts, packed)
    unp = lambda P: unpack_state(P, M).reshape(shp)
    return out._replace(X=unp(out.X), Y=unp(out.Y), Xprv=unp(out.Xprv),
                        Gprv=unp(out.Gprv), Zrb=unp(out.Zrb))


def _make_pgm_problem():
    from sporco_tpu.solvers.pgm import PGMProblem
    return PGMProblem(setup=_pgm_aux, grad_f=_pgm_grad,
                      prox_g=_pgm_prox, obfn_f=_pgm_f, obfn_g=_pgm_g,
                      hessian_f=_pgm_hess, xinit=_pgm_xinit,
                      obfn=_pgm_obfn,
                      stat_names=("ObjFun", "DFid", "RegL1"))


_CBPDN_PGM_FUSED = _make_pgm_problem()
