"""Fused Pallas 2D real-FFT kernels (TPU).

The generic MXU DFT path (:mod:`sporco_tpu.ops.mxufft`) expresses each
axis transform as one dense matmul; between the two axis stages the
half-spectrum intermediate makes a full HBM round trip, and the
full-length c2c stage pays O(N^2) MACs.  This module fuses the whole
2D transform of each batch element into one Pallas program so that

- both DFT stages (and the radix split below) stay in VMEM;
- the row-axis c2c stage uses a radix-R Cooley-Tukey split
  ``N0 = R * 128``: the radix-R butterflies are free VPU adds
  (W_4 twiddle factors are {1, -i, -1, i}), the twiddle multiply is
  elementwise, and the length-128 sub-DFTs are batched full-MXU
  (128, 128) x (128, K) matmuls -- an Rx MAC reduction over the dense
  (N0, N0) factor with no underfilled contractions;
- everything is planar (separate real/imag f32 planes), so no
  interleaved-complex layout conversions touch HBM inside the kernel.

Precision follows :func:`sporco_tpu.ops.mxufft.set_precision`:
``highest`` uses f32-exact MXU passes; ``high`` implements the 3-pass
bf16 scheme manually (hi/lo split of data on the VPU; factor matrices
are pre-split on the host) since Mosaic only lowers DEFAULT/HIGHEST
dot precisions.

Role in the reference: this is the TPU-native replacement for the
pyFFTW planning layer (``sporco/fft.py:33-41``) at the framework's hot
sizes (the 2D CSC solves of ``sporco/admm/cbpdn.py:267-293``).
"""

import math
from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rfft2_planar", "irfft2_planar", "supported"]

# radix-128 sub-transform length: one full MXU contraction
_L = 128
_RADICES = (1, 2, 4)        # N0 in {128, 256, 512}
_MAX_N1 = 2048

# set True in tests to run kernels through the Pallas interpreter on CPU
interpret = False


def supported(n0, n1, dtype):
    """Whether the fused kernel handles a (n0, n1) f32 2D transform."""
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if n1 % 2 != 0 or n1 < 2 or n1 > _MAX_N1:
        return False
    return n0 % _L == 0 and n0 // _L in _RADICES


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _np_split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


# ---------------------------------------------------------------------------
# Host-side factor tables (cached per (N0, N1, precision))

@lru_cache(maxsize=None)
def _fwd_factors(n0, n1, prec):
    """Factor pytree for the forward (N0, N1) rfft2 kernel."""
    k1 = n1 // 2 + 1
    j = np.arange(n1)
    k = np.arange(k1)
    ang = 2.0 * np.pi * np.outer(j, k) / n1
    Cr = np.cos(ang).astype(np.float32)          # (N1, K1) r2c factors
    Ci = (-np.sin(ang)).astype(np.float32)
    # pad the spectrum dim to a lane-aligned width: the MXU pads to a
    # multiple of 128 internally anyway, and aligned lanes keep every
    # in-kernel reshape legal for Mosaic
    k1p = -(-k1 // _L) * _L
    Cr = np.pad(Cr, ((0, 0), (0, k1p - k1)))
    Ci = np.pad(Ci, ((0, 0), (0, k1p - k1)))

    r = n0 // _L
    n2 = np.arange(_L)
    k2 = np.arange(_L)
    ang2 = 2.0 * np.pi * np.outer(n2, k2) / _L   # symmetric DFT-128
    Fr = np.cos(ang2).astype(np.float32)
    Fi = (-np.sin(ang2)).astype(np.float32)

    # twiddle W_N0^{k1*n2}, shape (R, L)
    kk1 = np.arange(r)[:, None]
    tw = 2.0 * np.pi * kk1 * n2[None, :] / n0
    Tr = np.cos(tw).astype(np.float32)
    Ti = (-np.sin(tw)).astype(np.float32)

    if prec == "high":
        out = {}
        for nm, m in (("Cr", Cr), ("Ci", Ci), ("Fr", Fr), ("Fi", Fi),
                      ("Frpi", Fr + Fi)):
            out[nm + "h"], out[nm + "l"] = _np_split_bf16(m)
        out["Tr"], out["Ti"] = Tr, Ti
        return out
    return {"Cr": Cr, "Ci": Ci, "Fr": Fr, "Fi": Fi, "Frpi": Fr + Fi,
            "Tr": Tr, "Ti": Ti}


@lru_cache(maxsize=None)
def _inv_factors(n0, n1, prec):
    """Factor pytree for the inverse (N0, N1) irfft2 kernel."""
    k1 = n1 // 2 + 1
    # c2r factors (K1, N1), hermitian weights folded in
    kk = np.arange(k1)
    j = np.arange(n1)
    w = np.full(k1, 2.0 / n1)
    w[0] = 1.0 / n1
    if n1 % 2 == 0:
        w[-1] = 1.0 / n1
    ang = 2.0 * np.pi * np.outer(kk, j) / n1
    Ar = (w[:, None] * np.cos(ang)).astype(np.float32)
    Ai = (-w[:, None] * np.sin(ang)).astype(np.float32)
    # pad the (zero-weighted) spectrum rows to the lane-aligned width
    # matching the forward kernel's padded carry
    k1p = -(-k1 // _L) * _L
    Ar = np.pad(Ar, ((0, k1p - k1), (0, 0)))
    Ai = np.pad(Ai, ((0, k1p - k1), (0, 0)))

    r = n0 // _L
    n2 = np.arange(_L)
    k2 = np.arange(_L)
    # inverse length-128 DFT with the full 1/N0 scale folded in
    ang2 = 2.0 * np.pi * np.outer(n2, k2) / _L
    Gr = (np.cos(ang2) / n0).astype(np.float32)
    Gi = (np.sin(ang2) / n0).astype(np.float32)

    # inverse twiddle V^{n2*k1} = e^{+2i pi n2 k1 / N0}, shape (R, L)
    kk1 = np.arange(r)[:, None]
    tw = 2.0 * np.pi * kk1 * n2[None, :] / n0
    Tr = np.cos(tw).astype(np.float32)
    Ti = np.sin(tw).astype(np.float32)

    if prec == "high":
        out = {}
        for nm, m in (("Ar", Ar), ("Ai", Ai), ("Gr", Gr), ("Gi", Gi),
                      ("Grpi", Gr + Gi)):
            out[nm + "h"], out[nm + "l"] = _np_split_bf16(m)
        out["Tr"], out["Ti"] = Tr, Ti
        return out
    return {"Ar": Ar, "Ai": Ai, "Gr": Gr, "Gi": Gi, "Grpi": Gr + Gi,
            "Tr": Tr, "Ti": Ti}


# ---------------------------------------------------------------------------
# In-kernel matmul helpers

_DN = (((1,), (0,)), ((), ()))


def _mm_f32(a, b):
    return lax.dot_general(a, b, _DN, precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)


def _mm_3p(ah, al, bh, bl):
    """f32-accurate matmul from pre-split bf16 operands (3 bf16 passes,
    the hi*hi / lo*hi / hi*lo terms; error ~1e-5 like XLA's HIGH)."""
    acc = lax.dot_general(ah, bh, _DN, preferred_element_type=jnp.float32)
    acc += lax.dot_general(al, bh, _DN, preferred_element_type=jnp.float32)
    acc += lax.dot_general(ah, bl, _DN, preferred_element_type=jnp.float32)
    return acc


def _butterfly_fwd(ar, ai, r):
    """Radix-r DIT butterflies over leading axis (w = W_r^{n1 k1}).

    a: (r, L, K) planar complex; returns same shape indexed by k1."""
    if r == 1:
        return ar, ai
    if r == 2:
        return (jnp.stack([ar[0] + ar[1], ar[0] - ar[1]]),
                jnp.stack([ai[0] + ai[1], ai[0] - ai[1]]))
    # r == 4: W4^{n1 k1} in {1, -i, -1, i}
    s02r, s02i = ar[0] + ar[2], ai[0] + ai[2]
    d02r, d02i = ar[0] - ar[2], ai[0] - ai[2]
    s13r, s13i = ar[1] + ar[3], ai[1] + ai[3]
    d13r, d13i = ar[1] - ar[3], ai[1] - ai[3]
    # k1=0: s02+s13 ; k1=1: d02 - i*d13 ; k1=2: s02-s13 ; k1=3: d02 + i*d13
    br = jnp.stack([s02r + s13r, d02r + d13i, s02r - s13r, d02r - d13i])
    bi = jnp.stack([s02i + s13i, d02i - d13r, s02i - s13i, d02i + d13r])
    return br, bi


def _butterfly_inv(ar, ai, r):
    """Radix-r butterflies with conjugate twiddles (w = V_r^{n1 k1})."""
    if r == 1:
        return ar, ai
    if r == 2:
        return (jnp.stack([ar[0] + ar[1], ar[0] - ar[1]]),
                jnp.stack([ai[0] + ai[1], ai[0] - ai[1]]))
    # r == 4: V4^{n1 k1} in {1, i, -1, -i}
    s02r, s02i = ar[0] + ar[2], ai[0] + ai[2]
    d02r, d02i = ar[0] - ar[2], ai[0] - ai[2]
    s13r, s13i = ar[1] + ar[3], ai[1] + ai[3]
    d13r, d13i = ar[1] - ar[3], ai[1] - ai[3]
    # n1=0: s02+s13 ; n1=1: d02 + i*d13 ; n1=2: s02-s13 ; n1=3: d02 - i*d13
    br = jnp.stack([s02r + s13r, d02r - d13i, s02r - s13r, d02r + d13i])
    bi = jnp.stack([s02i + s13i, d02i + d13r, s02i - s13i, d02i - d13r])
    return br, bi


# ---------------------------------------------------------------------------
# Kernels
def _fwd_kernel_high(x_ref, Crh, Crl, Cih, Cil, Frh, Frl, Fih, Fil,
                     Frpih, Frpil, Tr, Ti, yr_ref, yi_ref, *, n0, k1):
    r = n0 // _L
    k1p = -(-k1 // _L) * _L
    x = x_ref[0]
    xh, xl = _split_bf16(x)
    # stage A: r2c along the last axis (factors pre-padded to K1p)
    ur = _mm_3p(xh, xl, Crh[:], Crl[:])          # (N0, K1p)
    ui = _mm_3p(xh, xl, Cih[:], Cil[:])
    # stage B: CT c2c along axis 0
    ar = ur.reshape(r, _L, k1p)
    ai = ui.reshape(r, _L, k1p)
    br, bi = _butterfly_fwd(ar, ai, r)
    tr = Tr[:][:, :, None]
    ti = Ti[:][:, :, None]
    cr = br * tr - bi * ti
    ci = br * ti + bi * tr
    # radix blocks concatenated along (aligned) lanes: one wide
    # full-MXU matmul per Karatsuba pass, and the (k2, k1)-major
    # output makes the radix reorder a plain reshape
    crw = jnp.transpose(cr, (1, 0, 2)).reshape(_L, r * k1p)
    ciw = jnp.transpose(ci, (1, 0, 2)).reshape(_L, r * k1p)
    crh_, crl_ = _split_bf16(crw)
    cih_, cil_ = _split_bf16(ciw)
    csh_, csl_ = _split_bf16(crw + ciw)
    m1 = _mm_3p(Frh[:], Frl[:], crh_, crl_)
    m2 = _mm_3p(Fih[:], Fil[:], cih_, cil_)
    m3 = _mm_3p(Frpih[:], Frpil[:], csh_, csl_)
    # rows are k2, columns (k1, k): (L, r, k1) flattens to the
    # k = k1 + R*k2 output row order directly
    yr_ref[0] = (m1 - m2).reshape(_L, r, k1p)[:, :, :k1].reshape(n0, k1)
    yi_ref[0] = (m3 - m1 - m2).reshape(_L, r, k1p)[:, :, :k1] \
        .reshape(n0, k1)


def _fwd_kernel_exact(x_ref, Cr, Ci, Fr, Fi, Frpi, Tr, Ti,
                      yr_ref, yi_ref, *, n0, k1, prec):
    r = n0 // _L
    k1p = -(-k1 // _L) * _L
    mm = _mm_f32 if prec == "highest" else partial(
        lax.dot_general, dimension_numbers=_DN,
        preferred_element_type=jnp.float32)
    x = x_ref[0]
    ur = mm(x, Cr[:])
    ui = mm(x, Ci[:])
    ar = ur.reshape(r, _L, k1p)
    ai = ui.reshape(r, _L, k1p)
    br, bi = _butterfly_fwd(ar, ai, r)
    tr = Tr[:][:, :, None]
    ti = Ti[:][:, :, None]
    cr = br * tr - bi * ti
    ci = br * ti + bi * tr
    crw = jnp.transpose(cr, (1, 0, 2)).reshape(_L, r * k1p)
    ciw = jnp.transpose(ci, (1, 0, 2)).reshape(_L, r * k1p)
    m1 = mm(Fr[:], crw)
    m2 = mm(Fi[:], ciw)
    m3 = mm(Frpi[:], crw + ciw)
    yr_ref[0] = (m1 - m2).reshape(_L, r, k1p)[:, :, :k1].reshape(n0, k1)
    yi_ref[0] = (m3 - m1 - m2).reshape(_L, r, k1p)[:, :, :k1] \
        .reshape(n0, k1)


def _butterfly_inv_ax1(ar, ai, r):
    """Radix-r inverse butterflies over axis 1 of (L, r, K) planes."""
    if r == 1:
        return ar, ai
    if r == 2:
        return (jnp.stack([ar[:, 0] + ar[:, 1], ar[:, 0] - ar[:, 1]], 1),
                jnp.stack([ai[:, 0] + ai[:, 1], ai[:, 0] - ai[:, 1]], 1))
    s02r, s02i = ar[:, 0] + ar[:, 2], ai[:, 0] + ai[:, 2]
    d02r, d02i = ar[:, 0] - ar[:, 2], ai[:, 0] - ai[:, 2]
    s13r, s13i = ar[:, 1] + ar[:, 3], ai[:, 1] + ai[:, 3]
    d13r, d13i = ar[:, 1] - ar[:, 3], ai[:, 1] - ai[:, 3]
    br = jnp.stack([s02r + s13r, d02r - d13i, s02r - s13r, d02r + d13i], 1)
    bi = jnp.stack([s02i + s13i, d02i + d13r, s02i - s13i, d02i - d13r], 1)
    return br, bi


def _inv_load_padded(yr_ref, yi_ref, r, k1, k1p):
    """(N0, K1) spectrum -> lane-padded (L, r*K1p) planar pair, laid
    out (k2)x(k1, k)."""
    X2r = yr_ref[0].reshape(_L, r, k1)
    X2i = yi_ref[0].reshape(_L, r, k1)
    pad = ((0, 0), (0, 0), (0, k1p - k1))
    X2r = jnp.pad(X2r, pad).reshape(_L, r * k1p)
    X2i = jnp.pad(X2i, pad).reshape(_L, r * k1p)
    return X2r, X2i


def _inv_kernel_high(yr_ref, yi_ref, Arh, Arl, Aih, Ail, Grh, Grl,
                     Gih, Gil, Grpih, Grpil, Tr, Ti, x_ref, *, n0, n1):
    r = n0 // _L
    k1 = n1 // 2 + 1
    k1p = -(-k1 // _L) * _L
    # stage A: inverse sub-DFTs over k2, all radix blocks in one wide
    # matmul (padded lanes stay zero through the linear stages)
    X2r, X2i = _inv_load_padded(yr_ref, yi_ref, r, k1, k1p)
    xrh, xrl = _split_bf16(X2r)
    xih, xil = _split_bf16(X2i)
    xsh, xsl = _split_bf16(X2r + X2i)
    m1 = _mm_3p(Grh[:], Grl[:], xrh, xrl)
    m2 = _mm_3p(Gih[:], Gil[:], xih, xil)
    m3 = _mm_3p(Grpih[:], Grpil[:], xsh, xsl)
    er = (m1 - m2).reshape(_L, r, k1p)           # [n2, k1, k]
    ei = (m3 - m1 - m2).reshape(_L, r, k1p)
    # twiddle V^{n2 k1}: factors stored (R, L), transposed to (L, R)
    tr = jnp.transpose(Tr[:])[:, :, None]
    ti = jnp.transpose(Ti[:])[:, :, None]
    cr = er * tr - ei * ti
    ci = er * ti + ei * tr
    # butterflies over k1 -> n1 blocks; reorder to n = 128*n1 + n2
    br, bi = _butterfly_inv_ax1(cr, ci, r)
    vr = jnp.transpose(br, (1, 0, 2)).reshape(n0, k1p)
    vi = jnp.transpose(bi, (1, 0, 2)).reshape(n0, k1p)
    # stage C: c2r along the last axis (factor rows past K1 are zero)
    vrh, vrl = _split_bf16(vr)
    vih, vil = _split_bf16(vi)
    x_ref[0] = _mm_3p(vrh, vrl, Arh[:], Arl[:]) + \
        _mm_3p(vih, vil, Aih[:], Ail[:])


def _inv_kernel_exact(yr_ref, yi_ref, Ar, Ai, Gr, Gi, Grpi, Tr, Ti,
                      x_ref, *, n0, n1, prec):
    r = n0 // _L
    k1 = n1 // 2 + 1
    k1p = -(-k1 // _L) * _L
    mm = _mm_f32 if prec == "highest" else partial(
        lax.dot_general, dimension_numbers=_DN,
        preferred_element_type=jnp.float32)
    X2r, X2i = _inv_load_padded(yr_ref, yi_ref, r, k1, k1p)
    m1 = mm(Gr[:], X2r)
    m2 = mm(Gi[:], X2i)
    m3 = mm(Grpi[:], X2r + X2i)
    er = (m1 - m2).reshape(_L, r, k1p)
    ei = (m3 - m1 - m2).reshape(_L, r, k1p)
    tr = jnp.transpose(Tr[:])[:, :, None]
    ti = jnp.transpose(Ti[:])[:, :, None]
    cr = er * tr - ei * ti
    ci = er * ti + ei * tr
    br, bi = _butterfly_inv_ax1(cr, ci, r)
    vr = jnp.transpose(br, (1, 0, 2)).reshape(n0, k1p)
    vi = jnp.transpose(bi, (1, 0, 2)).reshape(n0, k1p)
    x_ref[0] = mm(vr, Ar[:]) + mm(vi, Ai[:])


# ---------------------------------------------------------------------------
# pallas_call wrappers

def _const_specs(n):
    # grid-invariant factor blocks (whole array, same block every step)
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


def _factor_args(fac, names):
    return tuple(jnp.asarray(fac[nm]) for nm in names)


_FWD_HIGH = ("Crh", "Crl", "Cih", "Cil", "Frh", "Frl", "Fih", "Fil",
             "Frpih", "Frpil", "Tr", "Ti")
_FWD_EXACT = ("Cr", "Ci", "Fr", "Fi", "Frpi", "Tr", "Ti")
_INV_HIGH = ("Arh", "Arl", "Aih", "Ail", "Grh", "Grl", "Gih", "Gil",
             "Grpih", "Grpil", "Tr", "Ti")
_INV_EXACT = ("Ar", "Ai", "Gr", "Gi", "Grpi", "Tr", "Ti")


def rfft2_planar(x, precision="high"):
    """Forward 2D real DFT of the last two axes of f32 ``x``; returns
    (yr, yi) planar halves of shape ``x.shape[:-1] + (N1//2+1,)``."""
    n0, n1 = x.shape[-2], x.shape[-1]
    k1 = n1 // 2 + 1
    lead = x.shape[:-2]
    b = int(np.prod(lead, dtype=np.int64)) if lead else 1
    xb = x.reshape((b, n0, n1))
    fac = _fwd_factors(n0, n1, "high" if precision == "high" else "f32")
    if precision == "high":
        kern = partial(_fwd_kernel_high, n0=n0, k1=k1)
        names = _FWD_HIGH
    else:
        kern = partial(_fwd_kernel_exact, n0=n0, k1=k1, prec=precision)
        names = _FWD_EXACT
    args = _factor_args(fac, names)
    out_shape = [jax.ShapeDtypeStruct((b, n0, k1), jnp.float32)] * 2
    yr, yi = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n0, n1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + _const_specs(len(args)),
        out_specs=[pl.BlockSpec((1, n0, k1), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=out_shape,
        interpret=interpret,
    )(xb, *args)
    return yr.reshape(lead + (n0, k1)), yi.reshape(lead + (n0, k1))


def irfft2_planar(yr, yi, n1, precision="high"):
    """Inverse of :func:`rfft2_planar`: planar (yr, yi) with last-axis
    length ``n1//2+1`` -> real f32 array with last axis ``n1``."""
    n0 = yr.shape[-2]
    k1 = yr.shape[-1]
    lead = yr.shape[:-2]
    b = int(np.prod(lead, dtype=np.int64)) if lead else 1
    yrb = yr.reshape((b, n0, k1))
    yib = yi.reshape((b, n0, k1))
    fac = _inv_factors(n0, n1, "high" if precision == "high" else "f32")
    if precision == "high":
        kern = partial(_inv_kernel_high, n0=n0, n1=n1)
        names = _INV_HIGH
    else:
        kern = partial(_inv_kernel_exact, n0=n0, n1=n1, prec=precision)
        names = _INV_EXACT
    args = _factor_args(fac, names)
    x = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n0, k1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2
        + _const_specs(len(args)),
        out_specs=pl.BlockSpec((1, n0, n1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n0, n1), jnp.float32),
        interpret=interpret,
    )(yrb, yib, *args)
    return x.reshape(lead + (n0, n1))
