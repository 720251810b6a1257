"""Proximal / projection operators (jittable, TPU-friendly).

Capability parity with the reference prox layer (``sporco/prox/``):
l0/l1/l2/l2,1 norms and shrinkages, l1/l2-ball projections, compound and
difference shrinkages, and the nuclear norm prox.  All operators are pure
functions of jnp arrays, usable inside ``jit``/``vmap``/``lax.while_loop``;
data-dependent branches in the reference (e.g. the early-exit in
``proj_l1``, ``sporco/prox/_l1proj.py:110``) are expressed branchlessly so
XLA sees static control flow.

Unlike the reference, axis-reductions keep dims (broadcastable) and are
never collapsed to Python scalars; use ``float()`` on the result outside
jit if a scalar is wanted.
"""

import jax
import jax.numpy as jnp

__all__ = [
    "zdivide", "norm_l0", "prox_l0", "norm_l1", "prox_l1", "norm_2l2",
    "norm_l2", "prox_l2", "proj_l2", "norm_l21", "prox_sl1l2",
    "norm_dl1l2", "prox_dl1l2", "proj_l1", "norm_nuclear", "prox_nuclear",
    "ndto2d", "ndfrom2d",
]


def zdivide(a, b):
    """Element-wise division returning 0 where the denominator is 0
    (parity with ``sporco/array.py:119``)."""
    b_ok = b != 0
    return jnp.where(b_ok, a, 0) / jnp.where(b_ok, b, 1)


def _sign(v):
    """Sign for real input, unit phase ``v/|v|`` for complex input
    (the complex-aware shrinkage of ``sporco/prox/_lp.py:144``)."""
    if jnp.iscomplexobj(v):
        return zdivide(v, jnp.abs(v))
    return jnp.sign(v)


def norm_l0(x, axis=None, eps=0.0):
    """l0 "norm": count of entries with ``|x| > eps``."""
    return jnp.sum(jnp.abs(x) > eps, axis=axis, keepdims=axis is not None)


def prox_l0(v, alpha):
    """Hard thresholding: zero where ``|v| < sqrt(2 alpha)``."""
    return jnp.where(jnp.abs(v) >= jnp.sqrt(2.0 * alpha), v, 0)


def norm_l1(x, axis=None):
    """l1 norm, optionally per-slice over ``axis``."""
    return jnp.sum(jnp.abs(x), axis=axis, keepdims=axis is not None)


def prox_l1(v, alpha):
    """Soft thresholding (scalar shrinkage); complex-aware."""
    return _sign(v) * jnp.maximum(jnp.abs(v) - alpha, 0)


def norm_2l2(x, axis=None):
    """Squared l2 norm, optionally per-slice over ``axis``."""
    return jnp.sum(jnp.abs(x) ** 2 if jnp.iscomplexobj(x) else x ** 2,
                   axis=axis, keepdims=axis is not None)


def norm_l2(x, axis=None):
    """l2 norm, optionally per-slice over ``axis``."""
    return jnp.sqrt(norm_2l2(x, axis=axis))


def _group_norm(v, axis):
    if jnp.iscomplexobj(v):
        return jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=axis, keepdims=True))
    return jnp.sqrt(jnp.sum(v ** 2, axis=axis, keepdims=True))


def prox_l2(v, alpha, axis=None):
    """Vector (group) shrinkage; with ``axis`` this is the prox of the
    l2,1 norm over the remaining indices."""
    a = _group_norm(v, axis)
    b = jnp.maximum(0, a - alpha)
    return (zdivide(b, a) * v).astype(v.dtype)


def proj_l2(v, gamma, axis=None):
    """Projection onto the l2 ball of radius ``gamma`` (per group when
    ``axis`` is given)."""
    d = _group_norm(v, axis)
    return jnp.where(d <= gamma, v, gamma * zdivide(v, d)).astype(v.dtype)


def norm_l21(x, axis=-1):
    """l2,1 mixed norm: sum of per-group l2 norms."""
    return jnp.sum(norm_l2(x, axis=axis))


def prox_sl1l2(v, alpha, beta, axis=None):
    """Prox of ``alpha ||x||_1 + beta ||x||_2`` (compound shrinkage,
    S2 of S1; ``sporco/prox/_l21.py:51``)."""
    return prox_l2(prox_l1(v, alpha), beta, axis=axis)


def norm_dl1l2(x, beta=1.0, axis=None):
    """Difference of l1 and (scaled) l2 norms (nonconvex)."""
    return norm_l1(x, axis=axis) - beta * norm_l2(x, axis=axis)


def prox_dl1l2(v, alpha, beta=1.0, axis=None):
    """Prox of ``alpha (||x||_1 - beta ||x||_2)`` (lou-2018-fast;
    behavioural parity with ``sporco/prox/_dl1l2.py:49``).

    ``axis`` must be a single int or None (None treats ``v`` as one
    vector, implemented via the flattened single-axis case).
    """
    if axis is None:
        return prox_dl1l2(v.ravel(), alpha, beta, axis=0).reshape(v.shape)
    va = jnp.abs(v)
    vamx = jnp.max(va, axis=axis, keepdims=True)
    u1 = jnp.maximum(va - alpha, 0) * jnp.sign(v)
    u1l2 = norm_l2(u1, axis=axis)
    u1 = u1 * (1.0 + zdivide(alpha * beta, u1l2))
    # Single-spike solution used when alpha >= vamx > (1-beta) alpha.
    idx = jnp.expand_dims(jnp.argmax(va, axis=axis), axis=axis)
    vsgn = jnp.sign(jnp.take_along_axis(v, idx, axis=axis))
    spike = (vamx + (beta - 1.0) * alpha) * vsgn
    onehot = jnp.zeros(v.shape, dtype=v.dtype)
    onehot = jnp.put_along_axis(onehot, idx, 1.0, axis=axis,
                                inplace=False)
    u2 = onehot * spike
    return jnp.where(vamx > alpha, u1,
                     jnp.where(vamx > (1.0 - beta) * alpha, u2, 0.0))


def proj_l1(v, gamma, axis=None):
    """Projection onto the l1 ball of radius ``gamma``.

    Always uses the sort-cumsum method (duchi-2008-efficient,
    ``sporco/prox/_l1proj.py:110``), which is branchless and jittable;
    the root-finding variant of the reference is not needed since the
    clamped threshold already yields the identity inside the ball.
    ``axis`` may be None (whole array), an int, or a tuple of ints.
    """
    if axis is None:
        return _proj_l1_sortsum(v.ravel(), gamma, 0).reshape(v.shape)
    if isinstance(axis, tuple):
        vtr, rsi = ndto2d(v, axis)
        return ndfrom2d(_proj_l1_sortsum(vtr, gamma, 1), rsi)
    return _proj_l1_sortsum(v, gamma, axis)


def _proj_l1_sortsum(v, gamma, axis):
    axis = axis % v.ndim
    av = jnp.abs(v)
    # Descending sort along axis.
    vs = jnp.flip(jnp.sort(av, axis=axis), axis=axis)
    N = v.shape[axis]
    ns = [N if k == axis else 1 for k in range(v.ndim)]
    rdt = v.real.dtype if jnp.iscomplexobj(v) else v.dtype
    c = (1.0 / jnp.arange(1, N + 1, dtype=rdt)).reshape(ns)
    t = c * (jnp.cumsum(vs, axis=axis) - gamma)
    K = jnp.sum(vs >= t, axis=axis, keepdims=True)
    t = (jnp.sum(jnp.where(vs >= t, vs, 0), axis=axis, keepdims=True)
         - gamma) / K
    t = jnp.maximum(0, t).astype(rdt)
    return _sign(v) * jnp.where(av > t, av - t, 0)


def norm_nuclear(x):
    """Nuclear norm (sum of singular values) of a matrix (or batch of
    matrices over leading axes)."""
    return jnp.sum(jnp.linalg.svd(x, compute_uv=False))


def prox_nuclear(v, alpha, rank=None, n_iter=2, oversample=10):
    """Singular-value soft thresholding (cai-2010-singular).

    Returns ``(X, s)`` where ``s`` are the thresholded singular values
    (parity with ``sporco/prox/_nuclear.py:45``).  Batched over leading
    axes by jnp.linalg.svd.  With ``rank`` set, ``s`` has length
    ``min(rank + oversample, m, n)`` rather than the reference's full
    ``min(m, n)``: only the sketched spectrum is computed, so callers
    inspecting the spectrum (or summing ``s`` for the nuclear norm when
    the discarded tail exceeds ``alpha``) see a truncated vector.

    With ``rank`` set, uses a randomized rank-``rank + oversample``
    subspace-iteration SVD (halko-2011-finding, Alg. 4.4) instead of
    the full decomposition -- all matmuls, jittable, batched.  This is
    EXACT (to the accuracy of ``n_iter`` subspace iterations) whenever
    the singular values beyond the sketch rank are ``<= alpha``: those
    directions would be thresholded to zero anyway.  The natural fit is
    Robust PCA, whose x-step target is explicitly low-rank
    (SURVEY §7.4; full ``jnp.linalg.svd`` on TPU is the bottleneck of
    ``sporco/admm/rpca.py:23``'s iteration).
    """
    if rank is None:
        u, s, vt = jnp.linalg.svd(v, full_matrices=False)
        ss = jnp.maximum(0, s - alpha)
        return jnp.matmul(u * ss[..., None, :], vt), ss
    m, n = v.shape[-2], v.shape[-1]
    r = int(min(rank + oversample, min(m, n)))
    vh = jnp.conj(jnp.swapaxes(v, -1, -2))
    # fixed sketch (deterministic; fresh keys per call would retrace
    # under jit and are unnecessary -- subsequent subspace iterations
    # wash out any unlucky draw)
    om = jax.random.normal(jax.random.PRNGKey(0),
                           v.shape[:-2] + (n, r), v.real.dtype)
    if jnp.iscomplexobj(v):
        om = om.astype(v.dtype)
    y = jnp.matmul(v, om)
    for _ in range(int(n_iter)):
        q = jnp.linalg.qr(y)[0]
        z = jnp.linalg.qr(jnp.matmul(vh, q))[0]
        y = jnp.matmul(v, z)
    q = jnp.linalg.qr(y)[0]
    b = jnp.matmul(jnp.conj(jnp.swapaxes(q, -1, -2)), v)
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    ss = jnp.maximum(0, s - alpha)
    u = jnp.matmul(q, ub)
    return jnp.matmul(u * ss[..., None, :], vt), ss


def ndto2d(x, axis=-1):
    """Permute+reshape so the axes in ``axis`` form the columns of a 2D
    array; returns the array and restore info (``sporco/prox/_util.py:20``)."""
    if isinstance(axis, int):
        axis = (axis,)
    axis = tuple(k % x.ndim for k in axis)
    caxis = tuple(sorted(set(range(x.ndim)) - set(axis)))
    prm = caxis + axis
    xt = jnp.transpose(x, axes=prm)
    xts = xt.shape
    nrows = 1
    for k in range(len(caxis)):
        nrows *= xts[k]
    return xt.reshape((nrows, -1)), (xts, prm)


def ndfrom2d(xtr, rsi):
    """Inverse of :func:`ndto2d`."""
    xts, prm = rsi
    import numpy as _np
    return jnp.transpose(xtr.reshape(xts), _np.argsort(prm))
