"""Interpolation and regression utilities (capability parity with
``sporco/interp.py``): Bayer-pattern bilinear demosaicing, least
absolute deviations and minimax-error linear regression, and Lanczos
kernels/filters.

The LP-based regressions (``sporco/interp.py:106,152``) run host-side
via ``scipy.optimize.linprog``; jittable IRLS variants
(:func:`lstabsdev_irls`) are provided for on-device use.
"""

import warnings

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["bilinear_demosaic", "lstabsdev", "lstmaxdev",
           "lstabsdev_irls", "lanczos_kernel", "lanczos_filters"]


def bilinear_demosaic(img):
    """Demosaic a BGGR Bayer-pattern image by bilinear interpolation
    (pattern of ``sporco/interp.py:24``: B at [0::2, 0::2], R at
    [1::2, 1::2], G elsewhere).  Returns an RGB image."""
    img = np.asarray(img)
    H, W = img.shape
    from scipy.interpolate import RectBivariateSpline, griddata
    # red channel on the [1::2, 1::2] grid
    xr = np.arange(1, H, 2)
    yr = np.arange(1, W, 2)
    fr = RectBivariateSpline(xr, yr, img[1::2, 1::2], s=0,
                             kx=min(3, len(xr) - 1),
                             ky=min(3, len(yr) - 1))
    sr = fr(np.arange(H), np.arange(W))
    # blue channel on the [0::2, 0::2] grid
    xb = np.arange(0, H, 2)
    yb = np.arange(0, W, 2)
    fb = RectBivariateSpline(xb, yb, img[0::2, 0::2], s=0,
                             kx=min(3, len(xb) - 1),
                             ky=min(3, len(yb) - 1))
    sb = fb(np.arange(H), np.arange(W))
    # green channel on the union of two offset grids
    x0, y0 = np.mgrid[0:H:2, 1:W:2]
    x1, y1 = np.mgrid[1:H:2, 0:W:2]
    xy01 = np.vstack((np.hstack((x0.ravel(), x1.ravel())),
                      np.hstack((y0.ravel(), y1.ravel())))).T
    z = np.hstack((img[0::2, 1::2].ravel(), img[1::2, 0::2].ravel()))
    x2, y2 = np.mgrid[0:H, 0:W]
    xy2 = np.vstack((x2.ravel(), y2.ravel())).T
    sg = griddata(xy01, z, xy2, method="linear").reshape(H, W)
    for (i, j), nbrs in [((0, 0), [(0, 1), (1, 0)]),
                         ((0, W - 1), [(0, W - 2), (1, W - 1)]),
                         ((H - 1, 0), [(H - 2, 0), (H - 1, 1)]),
                         ((H - 1, W - 1), [(H - 2, W - 1),
                                           (H - 1, W - 2)])]:
        if np.isnan(sg[i, j]):
            sg[i, j] = np.mean([sg[a, b] for a, b in nbrs])
    return np.dstack((sr, sg, sb))


def lstabsdev(A, b):
    """Least absolute deviations regression ``argmin_x ||Ax - b||_1``
    via linear programming (``sporco/interp.py:106``)."""
    import scipy.optimize as sco
    A = np.asarray(A)
    b = np.asarray(b).ravel()
    M, N = A.shape
    c = np.zeros((M + N,))
    c[0:M] = 1.0
    I = np.identity(M)
    A_ub = np.hstack((np.vstack((-I, -I)), np.vstack((-A, A))))
    b_ub = np.hstack((-b, b))
    with warnings.catch_warnings():
        warnings.filterwarnings("ignore", category=sco.OptimizeWarning)
        res = sco.linprog(c, A_ub, b_ub, bounds=(None, None))
    if not res.success:
        raise ValueError("linprog failed with status %d" % res.status)
    return res.x[M:]


def lstmaxdev(A, b):
    """Minimax (Chebyshev) regression ``argmin_x ||Ax - b||_inf`` via
    linear programming (``sporco/interp.py:152``)."""
    import scipy.optimize as sco
    A = np.asarray(A)
    b = np.asarray(b).ravel()
    M, N = A.shape
    c = np.zeros((N + 1,))
    c[0] = 1.0
    one = np.ones((M, 1))
    A_ub = np.hstack((np.vstack((-one, -one)), np.vstack((-A, A))))
    b_ub = np.hstack((-b, b))
    with warnings.catch_warnings():
        warnings.filterwarnings("ignore", category=sco.OptimizeWarning)
        res = sco.linprog(c, A_ub, b_ub, bounds=(None, None))
    if not res.success:
        raise ValueError("linprog failed with status %d" % res.status)
    return res.x[1:]


def lstabsdev_irls(A, b, n_iter=50, eps=1e-6):
    """Jittable IRLS approximation to least absolute deviations
    (on-device alternative to the LP)."""
    A = jnp.asarray(A)
    b = jnp.asarray(b).ravel()

    def body(_, x):
        r = A @ x - b
        w = 1.0 / jnp.maximum(jnp.abs(r), eps)
        AW = A * w[:, None]
        return jnp.linalg.solve(A.T @ AW + 1e-10 * jnp.eye(A.shape[1]),
                                AW.T @ b)

    x0 = jnp.linalg.lstsq(A, b)[0]
    return jax.lax.fori_loop(0, n_iter, body, x0)


def lanczos_kernel(x, a=3):
    """Lanczos interpolation kernel (``sporco/interp.py:198``)."""
    x = jnp.asarray(x)
    return jnp.where(jnp.abs(x) < a,
                     jnp.sinc(x) * jnp.sinc(x / a), 0.0)


def lanczos_filters(sz, a=3, collapse_axes=True):
    """Multi-dimensional Lanczos filter bank for a grid of fractional
    shifts (``sporco/interp.py:255``).

    ``sz`` is a tuple of per-axis shift counts (or arrays of shifts);
    returns an array of shape ``(2a+1,)*ndim + shift_shape`` (the shift
    axes collapsed to one trailing axis if ``collapse_axes``).
    """
    if isinstance(sz, int):
        sz = (sz,)
    shifts = []
    for s in sz:
        if np.isscalar(s):
            shifts.append(np.linspace(0, 1, int(s), endpoint=False))
        else:
            shifts.append(np.asarray(s))
    ndim = len(shifts)
    n = np.arange(-a + 1, a + 1)
    banks = []
    for d, sh in enumerate(shifts):
        k = np.asarray(lanczos_kernel(n[:, None] - sh[None, :], a=a))
        k = k / k.sum(axis=0, keepdims=True)
        banks.append(k)
    # outer product over dimensions
    out = banks[0]
    for d in range(1, ndim):
        out = np.multiply.outer(out, banks[d])
    # multiply.outer gives (n0, s0, n1, s1, ...): reorder to
    # (n0, n1, ..., s0, s1, ...)
    perm = list(range(0, 2 * ndim, 2)) + list(range(1, 2 * ndim, 2))
    out = np.transpose(out, perm)
    if collapse_axes and ndim > 1:
        out = out.reshape(out.shape[:ndim] + (-1,))
    return jnp.asarray(out)
