"""Plotting wrappers (capability parity with ``sporco/plot.py``):
``plot``, ``surf``, ``contour``, ``imview``, plus ``close`` and the
matplotlib config helpers.  All functions accept jax or numpy arrays.

matplotlib is imported lazily so headless/TPU-only environments never
pay for (or require) a display stack unless plotting is used.
"""

import numpy as np

__all__ = ["plot", "surf", "contour", "imview", "close", "set_ipython_plot_pos"]


def _mpl():
    import matplotlib
    if matplotlib.get_backend().lower() not in ("agg",) and \
            not _has_display():
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def _has_display():
    import os
    return bool(os.environ.get("DISPLAY"))


def _np(x):
    return np.asarray(x)


def plot(y, x=None, ptyp="plot", xlbl=None, ylbl=None, title=None,
         lgnd=None, lglc=None, fig=None, ax=None, **kwargs):
    """Plot points or lines in 2D (``sporco/plot.py:179``)."""
    plt = _mpl()
    if fig is None:
        fig = plt.figure()
    if ax is None:
        ax = fig.gca()
    pltfn = getattr(ax, ptyp)
    y = _np(y)
    if x is None:
        lines = pltfn(y, **kwargs)
    else:
        lines = pltfn(_np(x), y, **kwargs)
    if title is not None:
        ax.set_title(title)
    if xlbl is not None:
        ax.set_xlabel(xlbl)
    if ylbl is not None:
        ax.set_ylabel(ylbl)
    if lgnd is not None:
        ax.legend(lgnd, loc=lglc)
    return fig, ax


def surf(z, x=None, y=None, elev=None, azim=None, xlbl=None, ylbl=None,
         zlbl=None, title=None, cmap=None, fig=None, ax=None, **kwargs):
    """Plot a 2D surface in 3D (``sporco/plot.py:331``)."""
    plt = _mpl()
    if fig is None:
        fig = plt.figure()
    if ax is None:
        ax = fig.add_subplot(111, projection="3d")
    z = _np(z)
    if x is None or y is None:
        x, y = np.meshgrid(np.arange(z.shape[1]), np.arange(z.shape[0]))
    else:
        x, y = np.meshgrid(_np(x), _np(y))
    ax.plot_surface(x, y, z, cmap=cmap, **kwargs)
    if elev is not None or azim is not None:
        ax.view_init(elev=elev, azim=azim)
    for v, f in [(xlbl, ax.set_xlabel), (ylbl, ax.set_ylabel),
                 (zlbl, ax.set_zlabel), (title, ax.set_title)]:
        if v is not None:
            f(v)
    return fig, ax


def contour(z, x=None, y=None, v=5, xlog=False, ylog=False, xlbl=None,
            ylbl=None, title=None, cfntsz=10, lfntsz=None, cmap=None,
            fig=None, ax=None, **kwargs):
    """Contour plot of a 2D surface (``sporco/plot.py:444``)."""
    plt = _mpl()
    if fig is None:
        fig = plt.figure()
    if ax is None:
        ax = fig.gca()
    z = _np(z)
    if x is None or y is None:
        x, y = np.meshgrid(np.arange(z.shape[1]), np.arange(z.shape[0]))
    else:
        x, y = np.meshgrid(_np(x), _np(y))
    cs = ax.contour(x, y, z, v, cmap=cmap, **kwargs)
    if cfntsz is not None and cfntsz > 0:
        ax.clabel(cs, inline=True, fontsize=cfntsz)
    if xlog:
        ax.set_xscale("log")
    if ylog:
        ax.set_yscale("log")
    for v_, f in [(xlbl, ax.set_xlabel), (ylbl, ax.set_ylabel),
                  (title, ax.set_title)]:
        if v_ is not None:
            f(v_)
    return fig, ax


def imview(img, title=None, copy=True, fltscl=False, intrp="nearest",
           norm=None, cbar=False, cmap=None, fig=None, ax=None,
           **kwargs):
    """Display an image (``sporco/plot.py:575``)."""
    plt = _mpl()
    if fig is None:
        fig = plt.figure()
    if ax is None:
        ax = fig.gca()
    img = _np(img)
    if copy:
        img = img.copy()
    if img.dtype.kind == "f" and fltscl:
        img = img - img.min()
        img = img / max(img.max(), 1e-12)
    im = ax.imshow(img, interpolation=intrp, norm=norm, cmap=cmap,
                   **kwargs)
    if cbar:
        fig.colorbar(im, ax=ax)
    if title is not None:
        ax.set_title(title)
    ax.set_xticks([])
    ax.set_yticks([])
    return fig, ax


def close(fig=None):
    """Close figure(s) (``sporco/plot.py:748``)."""
    plt = _mpl()
    if fig is None:
        plt.close("all")
    else:
        plt.close(fig)


def set_ipython_plot_pos():  # pragma: no cover - notebook helper
    """Compat no-op for the reference's notebook backend helper."""
    return None
