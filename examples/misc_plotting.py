#!/usr/bin/env python
"""Plotting support demo.

Equivalent of the reference's examples/scripts/misc/plotting.py: line
plots, 3-D surfaces, contours, and image views through the
:mod:`sporco_tpu.utils.plot` wrappers, including saving figures to
disk; the interactive zoom/keypress hooks attach automatically when a
display is present.
"""

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(outdir=None):
    import matplotlib
    matplotlib.use("Agg")
    from sporco_tpu.utils import plot

    x = np.linspace(-1, 1, 101)
    y1, y2 = np.abs(x), np.abs(x) ** 1.5
    fig, ax = plot.plot(np.stack([y1, y2], axis=1), x=x,
                        title="Penalty functions", xlbl="x",
                        lgnd=("$|x|$", "$|x|^{1.5}$"))

    z = np.sin(np.pi * x)[:, None] * np.cos(np.pi * x)[None, :]
    plot.surf(z, title="surface", elev=25, azim=-60, cmap="viridis")
    plot.contour(z, title="contour", v=7)
    plot.imview(z, title="image view", cbar=True, fltscl=True)

    if outdir is not None:
        fig.savefig(os.path.join(outdir, "penalties.png"), dpi=80)
        print(f"saved {os.path.join(outdir, 'penalties.png')}")
    plot.close()
    print("plotting demo OK (4 figure types rendered)")
    return fig


if __name__ == "__main__":
    main()
