"""One-pass Pallas kernel for the fused ConvBPDN ADMM iteration core.

The fused CSC driver's iteration (:mod:`sporco_tpu.ops.fused_csc`),
expressed as separate XLA ops, touches the packed state arrays (67 MB
each at the 512x512x64 benchmark size) many times: the adjoint
polyphase matmul writes its output, the x-step combine re-reads
``Pyu``, the relax/prox/dual tail re-reads everything, and XLA emits
the six residual/objective reductions as a second full pass.  Measured
on a v5e chip that is ~1.6 ms of the 1.9 ms iteration.

This kernel performs the ENTIRE state-array portion of one iteration in
a single pass over HBM:

    inputs  : G2 (rolled adjoint operand, small), Y, U (67 MB each)
    compute : A   = G2 @ Wa                       (adjoint MXU matmul)
              PX  = scale*(Y - us*U) + A          (x-step combine)
              AX  = rlx*PX + (1-rlx)*Y            (over-relaxation)
              Yn  = soft(AX + us*U, thr)          (prox y-step)
              Un  = us*U + AX - Yn                (dual update)
              R1  = (Yn - Un) @ Wf                (NEXT x-step's forward
                                                   MXU matmul, operand
                                                   still in registers)
    outputs : Yn, Un (67 MB; aliased in-place onto Y/U), optionally PX
              (``emit_px``; the ADMM driver skips it -- X is only ever
              consumed through the fused sums), R1 and R2 = Un @ Wf
              (small), and per-lane partial sums of the six reductions
              (||PX-Yn||^2, ||Yn-Y||^2, ||PX||^2, ||Yn||^2, ||Un||^2,
              sum|wl1*PX|).

With the one-pass structure in place the kernel is MXU-pass-bound, not
HBM-bound (measured ~84% MXU / ~69% HBM utilisation at the benchmark
size; see the roofline in ``docs/performance.md``): per-iteration cost
tracks the bf16 split pass count (adjoint 3 + forward 4 + R2 3), and
removing the PX store changes nothing while removing MXU passes
recovers exactly the predicted time.

    ``R2`` exists to keep AutoRho's dual rescale OFF the state arrays:
    the next x-step needs ``(Yn - us*Un) @ Wf`` for a rescale factor
    ``us`` that is only known after this kernel's reductions, and
    ``(Yn - us*Un)@Wf = R1 + (1-us)*R2`` by linearity.  The driver
    combines the two small products with the scalar -- a ``lax.cond``
    re-reading the state instead measured +0.34 ms/iteration because
    the potential read blocks the in-place aliasing.

The matmuls run as manual bf16 multi-pass splits (Mosaic does not
lower f32 dot precisions) with f32 accumulation; weights arrive
pre-split.  ``input_output_aliases`` for Yn/Un is what makes the
kernel fast (measured 1.05 -> 0.64 ms/iter at the benchmark size):
Mosaic updates the state buffers in place instead of streaming to
fresh allocations.

Measured on one v5e chip (512x512x64 ConvBPDN, in-loop): this kernel
0.52 ms vs 1.6 ms for the XLA op sequence it replaces; whole solver
0.75 ms/iteration vs 1.9 ms (see ``docs/performance.md``).

Covers the l1/elastic variants with scalar or per-channel weights and
optional non-negativity; AMS masking and fully spatially-varying
weights use the XLA path (``fused_csc`` falls back automatically).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["csc_iter", "pgm_iter", "iter_supported",
           "split_bf16", "split_bf16_3", "enabled"]

# on-by-default on TPU backends; tests exercise it via interpret=True
enabled = True

# set True to run through the Pallas interpreter (CPU tests)
interpret = False

_NSUM = 6
_LANE = 128
_BLOCK_BYTES = 2 << 20      # 2 MB state blocks measured fastest (v5e)


def _pick_block_rows(R, C):
    for br in (128, 64, 32, 16, 8):
        if R % br == 0 and br * C * 4 <= _BLOCK_BYTES:
            return br
    return None


def iter_supported(pos, C, T):
    """Whether the one-pass iteration kernel supports this packed
    geometry (``pos`` rows, ``C`` state channels, ``T`` tap channels)."""
    return (C % _LANE == 0 and T % _LANE == 0
            and _pick_block_rows(pos, C) is not None)


def _round_bf16(w):
    """Round f32 to the nearest bf16-representable value, staying f32.

    ``lax.reduce_precision`` rather than a cast round-trip: under
    ``--xla_allow_excess_precision`` (set on this backend) XLA may
    legally elide ``bf16(w).astype(f32)`` back to ``w``, which silently
    zeroes the residual terms of the splits below (observed: the
    "6-pass" weight split collapsed to single-pass bf16 accuracy).
    Inside the Mosaic kernel the plain casts are honored, so the
    activation-side splits in :func:`_dot3` are safe."""
    return jax.lax.reduce_precision(w, exponent_bits=8, mantissa_bits=7)


def split_bf16(w):
    """Split an f32 array into (hi, lo) bf16 parts with
    ``hi + lo ~= w`` (the operand decomposition of a bf16 3-pass
    ``Precision.HIGH`` matmul)."""
    hi = _round_bf16(w)
    lo = w - hi
    return hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def split_bf16_3(w):
    """Three-term bf16 split ``w ~= w1 + w2 + w3`` (~f32-exact when the
    terms are recombined in a 6-pass product)."""
    w1 = _round_bf16(w)
    r1 = w - w1
    w2 = _round_bf16(r1)
    w3 = r1 - w2
    return (w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
            w3.astype(jnp.bfloat16))


def _split_bf16_kernel(x):
    """In-kernel (Mosaic) two-term split via casts, which Mosaic
    honors."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split_bf16_3_kernel(x):
    x1 = x.astype(jnp.bfloat16)
    r1 = x - x1.astype(jnp.float32)
    x2 = r1.astype(jnp.bfloat16)
    x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)
    return x1, x2, x3


def _dot3(x, w_hi, w_lo, passes):
    """Matmul of f32 ``x`` against a pre-split bf16 weight pair with
    f32 accumulation.  ``passes=6`` is f32-faithful (3-term operand
    splits, 6 MXU passes -- what XLA's einsum delivers on this backend
    via ``--xla_allow_excess_precision``); ``passes=4`` keeps both
    second-order terms (~5e-7 relative, the driver default for the
    cancellation-sensitive forward product since round 5);
    ``passes=3`` is the nominal ``Precision.HIGH`` bf16 3-pass (~2e-5
    relative error); ``passes=1`` single-pass bf16 (the driver's
    "mixed" mode)."""
    dims = (((1,), (0,)), ((), ()))
    d = lambda a, b: jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32)
    if passes == 1:
        return d(x.astype(jnp.bfloat16), w_hi)
    if passes == 6:
        x1, x2, x3 = _split_bf16_3_kernel(x)
        w1, w2, w3 = w_hi
        return (d(x1, w1) + (d(x1, w2) + d(x2, w1))
                + (d(x1, w3) + d(x2, w2) + d(x3, w1)))
    if passes == 4:
        x1, x2 = _split_bf16_kernel(x)
        w1, w2 = w_hi[0], w_hi[1]
        return (d(x1, w1) + (d(x1, w2) + d(x2, w1)) + d(x2, w2))
    x_hi, x_lo = _split_bf16_kernel(x)
    return d(x_hi, w_hi) + d(x_hi, w_lo) + d(x_lo, w_hi)


def _iter_kernel(nonneg, fwd_passes, adj_passes, r2_passes, emit_px,
                 emit_fwd, *refs):
    g_ref, y_ref, u_ref = refs[0:3]
    wa_hi_ref, wa_lo_ref, wa_3_ref = refs[3:6]
    i = 6
    if emit_fwd:
        wf_hi_ref, wf_lo_ref, wf_3_ref = refs[i:i + 3]
        i += 3
    thr_ref, wl1_ref, scal_ref = refs[i:i + 3]
    out_refs = refs[i + 3:]
    j = 0
    if emit_px:
        px_ref = out_refs[j]
        j += 1
    yn_ref, un_ref = out_refs[j:j + 2]
    j += 2
    if emit_fwd:
        r1_ref, r2_ref = out_refs[j:j + 2]
        j += 2
    acc_ref = out_refs[j]
    rlx = scal_ref[0, 0]
    us = scal_ref[0, 1]
    scale = scal_ref[0, 2]
    def wdot(x, hi_ref, lo_ref, w3_ref, passes):
        if passes >= 4:
            return _dot3(x, (hi_ref[:], lo_ref[:], w3_ref[:]), None,
                         passes)
        return _dot3(x, hi_ref[:], lo_ref[:], passes)

    a = wdot(g_ref[:], wa_hi_ref, wa_lo_ref, wa_3_ref, adj_passes)
    y = y_ref[:]
    u = us * u_ref[:]
    px = scale * (y - u) + a
    ax = rlx * px + (1.0 - rlx) * y
    axu = ax + u
    t = jnp.abs(axu) - thr_ref[:]
    yn = jnp.sign(axu) * jnp.maximum(t, 0.0)
    if nonneg:
        yn = jnp.maximum(yn, 0.0)
    un = u + ax - yn
    if emit_px:
        px_ref[:] = px
    yn_ref[:] = yn
    un_ref[:] = un
    if emit_fwd:
        r1_ref[:] = wdot(yn - un, wf_hi_ref, wf_lo_ref, wf_3_ref,
                         fwd_passes)
        r2_ref[:] = wdot(un, wf_hi_ref, wf_lo_ref, wf_3_ref, r2_passes)
    d = px - yn
    e = yn - y
    # sublane-only (axis 0) partial sums; the cross-lane reduction of
    # the (G*8, C) accumulator happens outside (negligible size)
    acc_ref[:] = jnp.stack(
        [jnp.sum(d * d, axis=0), jnp.sum(e * e, axis=0),
         jnp.sum(px * px, axis=0), jnp.sum(yn * yn, axis=0),
         jnp.sum(un * un, axis=0),
         jnp.sum(jnp.abs(px) * wl1_ref[:], axis=0),
         jnp.zeros_like(px[0]), jnp.zeros_like(px[0])])


@functools.partial(jax.jit,
                   static_argnames=("nonneg", "fwd_passes",
                                    "adj_passes", "r2_passes",
                                    "emit_px", "emit_fwd"))
def _iter_call(G2, Y, U, Wa, Wf, thr, wl1, scal, nonneg, fwd_passes,
               adj_passes, r2_passes, emit_px, emit_fwd):
    R, C = Y.shape
    T = G2.shape[1]
    BR = _pick_block_rows(R, C)
    Gn = R // BR
    row = pl.BlockSpec((BR, C), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    rowT = pl.BlockSpec((BR, T), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    w_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, C), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [rowT, row, row,
                w_spec((T, C)), w_spec((T, C)), w_spec((T, C))]
    args = [G2, Y, U, Wa[0], Wa[1], Wa[2]]
    if emit_fwd:
        in_specs += [w_spec((C, T))] * 3
        args += [Wf[0], Wf[1], Wf[2]]
    in_specs += [vec, vec,
                 pl.BlockSpec((1, 3), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)]
    args += [thr, wl1, scal]
    out_specs, out_shape = [], []
    if emit_px:
        out_specs.append(row)
        out_shape.append(jax.ShapeDtypeStruct((R, C), jnp.float32))
    out_specs += [row, row]
    out_shape += [jax.ShapeDtypeStruct((R, C), jnp.float32)] * 2
    if emit_fwd:
        out_specs += [rowT, rowT]
        out_shape += [jax.ShapeDtypeStruct((R, T), jnp.float32)] * 2
    out_specs.append(pl.BlockSpec((8, C), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((Gn * 8, C), jnp.float32))
    # in-place update of the state buffers: the measured 1.6x
    aliases = {1: 1, 2: 2} if emit_px else {1: 0, 2: 1}
    outs = pl.pallas_call(
        functools.partial(_iter_kernel, nonneg, fwd_passes,
                          adj_passes, r2_passes, emit_px, emit_fwd),
        grid=(Gn,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        name=f"csc_iter_f{fwd_passes}a{adj_passes}r{r2_passes}"
             f"{'' if emit_px else 'nx'}{'' if emit_fwd else 'nf'}",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.GridDimensionSemantics.ARBITRARY,),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    outs = list(outs)
    px = outs.pop(0) if emit_px else None
    yn, un = outs.pop(0), outs.pop(0)
    if emit_fwd:
        r1, r2 = outs.pop(0), outs.pop(0)
    else:
        r1 = r2 = None
    acc = outs.pop(0)
    part = acc.reshape(Gn, 8, C)
    return px, yn, un, r1, r2, jnp.sum(part, axis=(0, 2))[:_NSUM]


def csc_iter(G2, Y, U, Wa_split, Wf_split, thr, wl1, rlx, us, scale,
             nonneg=False, fwd_passes=6, adj_passes=3, r2_passes=3,
             emit_px=True, emit_fwd=True):
    """One fused CSC ADMM iteration over the packed 2-D state.

    ``G2`` is the rolled adjoint operand ``(pos, T)``; ``Y``/``U`` the
    packed state ``(pos, C)`` (U pre-rescale, true dual ``us * U``);
    ``Wa_split``/``Wf_split`` the bf16 hi/lo splits of the adjoint /
    forward polyphase weights; ``thr``/``wl1`` scalars or per-channel
    vectors.  Returns ``(PX, Yn, Un, R1, R2, sums)`` -- see module
    docstring.

    With ``emit_px=False`` the kernel skips the 67 MB/iteration ``PX``
    store (``PX`` is only ever consumed through the fused reduction
    sums inside the ADMM loop; the driver materialises the final X once
    after the loop) and returns ``PX = None``.  This removes ~20% of
    the kernel's HBM traffic (see the roofline in
    ``docs/performance.md``).

    With ``emit_fwd=False`` the R1/R2 forward products are neither
    computed nor returned, skipping ``fwd_passes + r2_passes`` MXU
    passes (the kernel's dominant cost).  Callers that recompute the
    forward product against fresh weights anyway -- the consensus-CDL
    CSC stage, whose dictionary changes every outer iteration -- should
    pass False; ``Wf_split`` may then be ``None``.
    """
    R, C = Y.shape
    thr2 = jnp.broadcast_to(jnp.asarray(thr, Y.dtype), (1, C))
    wl12 = jnp.broadcast_to(jnp.asarray(wl1, Y.dtype), (1, C))
    scal = jnp.stack([jnp.asarray(rlx, jnp.float32),
                      jnp.asarray(us, jnp.float32),
                      jnp.asarray(scale, jnp.float32)]).reshape(1, 3)
    return _iter_call(G2, Y, U, Wa_split,
                      Wf_split if emit_fwd else None, thr2,
                      wl12, scal, bool(nonneg), int(fwd_passes),
                      int(adj_passes), int(r2_passes), bool(emit_px),
                      bool(emit_fwd))


# ---------------------------------------------------------------------------
# FISTA (PGM) iteration kernel: the same one-pass structure applied to
# the proximal-gradient CSC iteration (``sporco/pgm/cbpdn.py:29,387``,
# packed-layout formulation of ops/fused_csc).  Per iteration:
#
#     A  = G2 @ Wa                  (adjoint matmul of the gradient)
#     V  = Y - A / L
#     X  = soft(V, lmbda/L * wl1)   [optional non-negativity]
#     Yn = X + beta (X - Xprv)      (momentum extrapolation)
#     R1 = Yn @ Wf                  (next gradient's forward product)
#     RX = X @ Wf                   (objective's forward product)
#
# with X aliased onto Xprv and Yn onto Y, plus partial sums of
# ||X - Y||^2 (the fixed-point residual) and sum|wl1 X|.

def _pgm_kernel(nonneg, fwd_passes, adj_passes, g_ref, y_ref, xp_ref,
                wa_hi_ref, wa_lo_ref, wa_3_ref, wf_hi_ref, wf_lo_ref,
                wf_3_ref, thr_ref, wl1_ref, scal_ref,
                x_ref, yn_ref, r1_ref, rx_ref, acc_ref):
    rL = scal_ref[0, 0]          # 1 / L
    beta = scal_ref[0, 1]        # (t_prv - 1) / t

    def wdot(x, hi_ref, lo_ref, w3_ref, passes):
        if passes >= 4:
            return _dot3(x, (hi_ref[:], lo_ref[:], w3_ref[:]), None,
                         passes)
        return _dot3(x, hi_ref[:], lo_ref[:], passes)

    a = wdot(g_ref[:], wa_hi_ref, wa_lo_ref, wa_3_ref, adj_passes)
    y = y_ref[:]
    v = y - rL * a
    t = jnp.abs(v) - thr_ref[:]
    x = jnp.sign(v) * jnp.maximum(t, 0.0)
    if nonneg:
        x = jnp.maximum(x, 0.0)
    yn = x + beta * (x - xp_ref[:])
    x_ref[:] = x
    yn_ref[:] = yn
    r1_ref[:] = wdot(yn, wf_hi_ref, wf_lo_ref, wf_3_ref, fwd_passes)
    rx_ref[:] = wdot(x, wf_hi_ref, wf_lo_ref, wf_3_ref, 3)
    d = x - y
    acc_ref[:] = jnp.stack(
        [jnp.sum(d * d, axis=0),
         jnp.sum(jnp.abs(x) * wl1_ref[:], axis=0),
         jnp.zeros_like(x[0]), jnp.zeros_like(x[0]),
         jnp.zeros_like(x[0]), jnp.zeros_like(x[0]),
         jnp.zeros_like(x[0]), jnp.zeros_like(x[0])])


@functools.partial(jax.jit,
                   static_argnames=("nonneg", "fwd_passes",
                                    "adj_passes"))
def _pgm_call(G2, Y, Xprv, Wa_hi, Wa_lo, Wa_3, Wf_hi, Wf_lo, Wf_3,
              thr, wl1, scal, nonneg, fwd_passes, adj_passes):
    R, C = Y.shape
    T = G2.shape[1]
    BR = _pick_block_rows(R, C)
    Gn = R // BR
    row = pl.BlockSpec((BR, C), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    rowT = pl.BlockSpec((BR, T), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    w_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, C), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    x, yn, r1, rx, acc = pl.pallas_call(
        functools.partial(_pgm_kernel, nonneg, fwd_passes, adj_passes),
        grid=(Gn,),
        in_specs=[rowT, row, row,
                  w_spec((T, C)), w_spec((T, C)), w_spec((T, C)),
                  w_spec((C, T)), w_spec((C, T)), w_spec((C, T)),
                  vec, vec,
                  pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=[row, row, rowT, rowT,
                   pl.BlockSpec((8, C), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((R, C), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((R, T), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((Gn * 8, C), jnp.float32)],
        input_output_aliases={2: 0, 1: 1},    # Xprv <- X, Y <- Yn
        name=f"pgm_iter_f{fwd_passes}a{adj_passes}",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.GridDimensionSemantics.ARBITRARY,),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(G2, Y, Xprv, Wa_hi, Wa_lo, Wa_3, Wf_hi, Wf_lo, Wf_3, thr, wl1,
      scal)
    part = acc.reshape(Gn, 8, C)
    return x, yn, r1, rx, jnp.sum(part, axis=(0, 2))[:2]


def pgm_iter(G2, Y, Xprv, Wa_split, Wf_split, thr, wl1, rL, beta,
             nonneg=False, fwd_passes=6, adj_passes=3):
    """One fused FISTA CSC iteration over the packed 2-D state; see the
    kernel comment above.  Returns ``(X, Yn, R1, RX, sums)`` with
    ``sums = [||X - Y||^2, sum|wl1 X|]``."""
    R, C = Y.shape
    thr2 = jnp.broadcast_to(jnp.asarray(thr, Y.dtype), (1, C))
    wl12 = jnp.broadcast_to(jnp.asarray(wl1, Y.dtype), (1, C))
    scal = jnp.stack([jnp.asarray(rL, jnp.float32),
                      jnp.asarray(beta, jnp.float32)]).reshape(1, 2)
    return _pgm_call(G2, Y, Xprv, Wa_split[0], Wa_split[1], Wa_split[2],
                     Wf_split[0], Wf_split[1], Wf_split[2], thr2, wl12,
                     scal, bool(nonneg), int(fwd_passes),
                     int(adj_passes))
