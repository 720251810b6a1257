"""Array-manipulation utilities (parity with ``sporco/array.py``).

All functions are pure and jittable unless noted; shape arguments are
static Python values.
"""

import numpy as np
import jax.numpy as jnp

from sporco_tpu.ops.prox import zdivide  # noqa: F401  (re-export)

__all__ = [
    "zpad", "zdivide", "atleast_nd", "split", "promote16",
    "rolling_window", "subsample_array", "extract_blocks",
    "average_blocks", "combine_blocks", "transpose_ntpl",
]


def zpad(x, pd, ax):
    """Zero-pad array ``x`` with ``pd = (leading, trailing)`` zeros on
    axis ``ax`` (``sporco/array.py:95``)."""
    pad_width = [(0, 0)] * x.ndim
    if isinstance(ax, int):
        ax = (ax,)
        pd = (pd,)
    for a, p in zip(ax, pd):
        pad_width[a % x.ndim] = p
    return jnp.pad(x, pad_width)


def atleast_nd(n, u):
    """Append singleton axes so ``u`` has at least ``n`` dims
    (``sporco/array.py:189``)."""
    if u.ndim >= n:
        return u
    return u.reshape(u.shape + (1,) * (n - u.ndim))


def split(u, axis=0):
    """Split array into a list of slices along ``axis``
    (``sporco/array.py:216``)."""
    us = jnp.split(u, u.shape[axis], axis=axis)
    return [jnp.squeeze(s, axis=axis) for s in us]


def promote16(u, fn=None, *args, **kwargs):
    """Promote float16 input to float32 for computation
    (``sporco/array.py:140``).  With ``fn`` given, applies it to the
    promoted array and demotes the result(s)."""
    dtype = jnp.float32 if u.dtype == jnp.float16 else u.dtype
    up = jnp.asarray(u, dtype=dtype)
    if fn is None:
        return up
    v = fn(up, *args, **kwargs)
    if isinstance(v, tuple):
        return tuple(x.astype(u.dtype) if hasattr(x, "astype") else x
                     for x in v)
    return v.astype(u.dtype)


def rolling_window(x, wndsz, hopsz=None, pad="constant"):
    """Sliding windows of size ``wndsz`` (int or tuple over leading axes)
    with hop ``hopsz``; windows are stacked on new trailing axes
    (behavioural parity with ``sporco/array.py:247``)."""
    if isinstance(wndsz, int):
        wndsz = (wndsz,)
    if hopsz is None:
        hopsz = (1,) * len(wndsz)
    elif isinstance(hopsz, int):
        hopsz = (hopsz,)
    x = jnp.asarray(x)
    # number of windows per axis
    nwin = tuple((x.shape[k] - wndsz[k]) // hopsz[k] + 1
                 for k in range(len(wndsz)))
    # gather via advanced indexing on leading axes
    idx = [np.arange(nwin[k])[:, None] * hopsz[k] + np.arange(wndsz[k])[None]
           for k in range(len(wndsz))]
    out = x
    for k in range(len(wndsz)):
        # after k takes, original axis k sits at position 2k; taking with a
        # 2D index array replaces it with a (nwin_k, wnd_k) pair there
        out = jnp.take(out, jnp.asarray(idx[k]), axis=2 * k)
    # out has shape (nwin0, wnd0, nwin1, wnd1, ..., rest)
    nd = len(wndsz)
    perm = [2 * k for k in range(nd)] + \
        list(range(2 * nd, out.ndim)) + [2 * k + 1 for k in range(nd)]
    return jnp.transpose(out, perm)


def subsample_array(x, step, pad=False):
    """Subsample with step ``step`` (tuple over leading axes)
    (``sporco/array.py:293``)."""
    if isinstance(step, int):
        step = (step,)
    slc = tuple(slice(None, None, s) for s in step)
    return x[slc]


def extract_blocks(img, blksz, stpsz=None):
    """Extract (possibly overlapping) blocks; returns array of shape
    ``blksz + (nblocks,)`` (parity with ``sporco/array.py:338``)."""
    if stpsz is None:
        stpsz = (1,) * len(blksz)
    w = rolling_window(img, blksz, stpsz)
    # w: (nwin..., rest..., blk...) -> blocks as (blk..., rest..., nblocks)
    nd = len(blksz)
    nwin = w.shape[:nd]
    nrest = w.ndim - 2 * nd
    w = w.reshape((int(np.prod(nwin)),) + w.shape[nd:])
    # (nblk, rest..., blk...) -> (blk..., rest..., nblk)
    perm = (tuple(range(1 + nrest, 1 + nrest + nd))
            + tuple(range(1, 1 + nrest)) + (0,))
    return jnp.transpose(w, perm)


def average_blocks(blks, imgsz, stpsz=None):
    """Average overlapping blocks back into an image of shape ``imgsz``
    (``sporco/array.py:390``)."""
    nd = len(imgsz)
    blksz = blks.shape[:nd]
    if stpsz is None:
        stpsz = (1,) * nd
    sums, cnt = _accumulate_blocks(blks, imgsz, blksz, stpsz)
    return sums / cnt


def combine_blocks(blks, imgsz, stpsz=None, fn=jnp.mean):
    """Combine overlapping blocks into an image with reduction ``fn``
    (capability of ``sporco/array.py:421``).  ``fn=jnp.sum`` and
    ``fn=jnp.mean`` use a fused scatter-add; other reductions (e.g.
    median) fall back to mean, which is the standard choice for patch
    recombination on TPU (order statistics over ragged overlap sets do
    not vectorise)."""
    nd = len(imgsz)
    blksz = blks.shape[:nd]
    if stpsz is None:
        stpsz = (1,) * nd
    sums, cnt = _accumulate_blocks(blks, imgsz, blksz, stpsz)
    if fn is jnp.sum:
        return sums
    return sums / cnt


def _accumulate_blocks(blks, imgsz, blksz, stpsz):
    nd = len(imgsz)
    nblk = blks.shape[-1]
    nwin = tuple((imgsz[k] - blksz[k]) // stpsz[k] + 1 for k in range(nd))
    # flat pixel index for every element of every block
    grids = np.meshgrid(*[np.arange(n) for n in nwin], indexing="ij")
    starts = [g.ravel() * stpsz[k] for k, g in enumerate(grids)]  # (nblk,)
    offs = np.meshgrid(*[np.arange(b) for b in blksz], indexing="ij")
    flat_idx = 0
    for k in range(nd):
        coord = starts[k][None, :] + offs[k].ravel()[:, None]  # (blkel, nblk)
        flat_idx = flat_idx * imgsz[k] + coord
    vals = blks.reshape((int(np.prod(blksz)),) + blks.shape[nd:-1] + (nblk,))
    vals = jnp.moveaxis(vals, -1, 1)  # (blkel, nblk, rest...)
    flat = jnp.zeros((int(np.prod(imgsz)),) + vals.shape[2:],
                     dtype=blks.dtype)
    cnt = jnp.zeros((int(np.prod(imgsz)),), dtype=blks.dtype)
    fi = jnp.asarray(flat_idx.ravel())
    flat = flat.at[fi].add(vals.reshape((-1,) + vals.shape[2:]))
    cnt = cnt.at[fi].add(1.0)
    rest = vals.shape[2:]
    cntb = cnt.reshape((-1,) + (1,) * len(rest))
    return (flat.reshape(imgsz + rest),
            cntb.reshape(imgsz + (1,) * len(rest)) if rest
            else cnt.reshape(imgsz))


def transpose_ntpl(lst):
    """Transpose a list of namedtuples into a namedtuple of arrays
    (capability of ``sporco/array.py:69``)."""
    if not lst:
        return None
    cls = type(lst[0])
    return cls(*[np.asarray([getattr(t, f) for t in lst])
                 for f in cls._fields])


transpose_ntpl_list = transpose_ntpl    # reference alias (sporco/util.py:926)
