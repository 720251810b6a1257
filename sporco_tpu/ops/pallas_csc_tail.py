"""Fused Pallas kernel for the ADMM CSC iteration tail.

The fused ConvBPDN driver (:mod:`sporco_tpu.ops.fused_csc`) is
HBM-bandwidth-bound: after the x-step's MXU matmuls, the remaining work
-- relaxation, soft-threshold y-step, dual update, and SIX global
reductions (primal/dual residual norms, their normalisers, and the l1
regulariser) -- is all elementwise over the three packed state arrays
(67 MB each at the 512x512x64 benchmark size).  This kernel performs
ALL of them in a single pass: read PX/PY/PU once, write PYn/PUn once,
and emit per-lane partial sums that are reduced outside (335 MB per
iteration -- the information-theoretic minimum for this step).

**Measured result (v5e, 512x512x64 ConvBPDN, in-loop):** XLA's own
fusion of this op sequence runs at 0.72 ms/iteration vs 0.83 ms for
this kernel (best configuration: 1 MB blocks, sublane-only in-kernel
reductions; full-block scalar reductions and 4 MB blocks are both
slower) -- XLA already fuses the elementwise chain into near-minimal
passes and overlaps better with the surrounding program.  The kernel is
therefore OFF by default (``enabled = False``); it is kept as a tested,
working implementation for future hardware/toolchains where the
balance may differ.

Covers ``sporco/admm/admm.py:293-389``'s relax/ystep/ustep/residual
sequence for the l1 prox with scalar or per-channel weights; AMS
masking and fully spatially-varying weights fall back to the XLA tail.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["admm_tail", "tail_eligible", "enabled"]

# opt-in: measured slower than XLA's fusion on v5e (see module
# docstring), so the fused driver uses it only when this is True
enabled = False

# set True in tests to run the kernel through the Pallas interpreter
interpret = False

_NSUM = 6          # number of partial sums per block
_LANE = 128


_BLOCK_BYTES = 1 << 20


def _pick_block_rows(R, C=4096):
    # ~10 blocks live at once (3 in + 2 out, double-buffered): 1 MB
    # blocks measured fastest; 2 MB+ exceeds the 16 MB scoped VMEM
    for br in (512, 256, 128, 64, 32, 16, 8):
        if R % br == 0 and br * C * 4 <= _BLOCK_BYTES:
            return br
    return None


def tail_eligible(R, C):
    """Whether the fused tail kernel supports this packed layout."""
    return C % _LANE == 0 and _pick_block_rows(R, C) is not None


def _tail_kernel(nonneg, px_ref, py_ref, pu_ref, thr_ref, wl1_ref,
                 scal_ref, yn_ref, un_ref, acc_ref):
    px = px_ref[:]
    py = py_ref[:]
    rlx = scal_ref[0, 0]
    # the deferred AutoRho dual-rescale factor (see fused_csc) is
    # folded into the load: the true dual is us * U
    pu = scal_ref[0, 1] * pu_ref[:]
    ax = rlx * px + (1.0 - rlx) * py
    axu = ax + pu
    a = jnp.abs(axu) - thr_ref[:]
    yn = jnp.sign(axu) * jnp.maximum(a, 0.0)
    if nonneg:
        yn = jnp.maximum(yn, 0.0)
    un = pu + ax - yn
    yn_ref[:] = yn
    un_ref[:] = un
    d = px - yn
    e = yn - py
    # sublane-only (axis 0) reductions: cross-lane shuffles are slow on
    # the VPU, so per-lane partial sums are written out and the final
    # cross-lane reduction happens outside on (G*8, C) -- negligible
    acc_ref[:] = jnp.stack(
        [jnp.sum(d * d, axis=0), jnp.sum(e * e, axis=0),
         jnp.sum(px * px, axis=0), jnp.sum(yn * yn, axis=0),
         jnp.sum(un * un, axis=0),
         jnp.sum(jnp.abs(px) * wl1_ref[:], axis=0),
         jnp.zeros_like(px[0]), jnp.zeros_like(px[0])])


@functools.partial(jax.jit, static_argnums=(6,))
def _tail_call(PX, PY, PU, thr, wl1, scal, nonneg):
    R, C = PX.shape
    BR = _pick_block_rows(R, C)
    G = R // BR
    row_spec = pl.BlockSpec((BR, C), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, C), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    yn, un, acc = pl.pallas_call(
        functools.partial(_tail_kernel, nonneg),
        grid=(G,),
        in_specs=[row_spec, row_spec, row_spec, vec_spec, vec_spec,
                  pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=[row_spec, row_spec,
                   pl.BlockSpec((8, C), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((R, C), PX.dtype),
                   jax.ShapeDtypeStruct((R, C), PX.dtype),
                   jax.ShapeDtypeStruct((G * 8, C), jnp.float32)],
        interpret=interpret,
    )(PX, PY, PU, thr, wl1, scal)
    part = acc.reshape(G, 8, C)
    return yn, un, jnp.sum(part, axis=(0, 2))[:_NSUM]


def admm_tail(PX, PY, PU, thr, wl1, rlx, nonneg=False, us=1.0):
    """One-pass relax + prox-l1 y-step + dual update + reductions.

    Arguments are in the packed layout ``(..., C)`` (flattened to rows
    internally); ``thr``/``wl1`` are scalars or per-channel ``(C,)``
    vectors; ``us`` is a dual rescale factor folded into the load of
    ``PU`` (the true dual is ``us * PU``).  Returns ``(PYn, PUn,
    sums)`` with ``sums = [||PX - PYn||^2, ||PYn - PY||^2, ||PX||^2,
    ||PYn||^2, ||PUn||^2, sum|wl1 * PX|]``.
    """
    shp = PX.shape
    C = shp[-1]
    R = int(np.prod(shp[:-1]))
    thr2 = jnp.broadcast_to(jnp.asarray(thr, PX.dtype), (1, C))
    wl12 = jnp.broadcast_to(jnp.asarray(wl1, PX.dtype), (1, C))
    scal = jnp.stack([jnp.asarray(rlx, PX.dtype),
                      jnp.asarray(us, PX.dtype)]).reshape(1, 2)
    yn, un, sums = _tail_call(PX.reshape(R, C), PY.reshape(R, C),
                              PU.reshape(R, C), thr2, wl12, scal,
                              bool(nonneg))
    return yn.reshape(shp), un.reshape(shp), sums
