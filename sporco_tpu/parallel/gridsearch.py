"""Hyperparameter grid search.

Capability parity with the reference's multiprocessing/MPI grid search
(``sporco/util.py:80-170``, ``sporco/mpiutil.py:65-175``): evaluate a
function over the Cartesian product of parameter ranges and return the
argmin/argmax.  On TPU the natural parallelisation is ``vmap`` over the
grid (one compiled program evaluating all points at once) or sharding
the grid axis over a device mesh -- not process pools.
"""

import itertools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["grid_search", "grid_search_vmap"]


def grid_search(fn, grid, fmin=True, mode="serial"):
    """Evaluate ``fn`` over ``itertools.product(*grid)`` and locate the
    optimum (``sporco/util.py:80``).

    Returns ``(sprm, sfvl, fvmx, sidx)``: the optimal parameter tuple,
    the optimal value, the array of values shaped like the grid, and
    the optimal index tuple.

    ``mode='serial'`` calls ``fn`` per point (arbitrary Python);
    ``mode='vmap'`` requires a jax-traceable ``fn`` of scalar args and
    evaluates all points in one compiled program.
    """
    if isinstance(grid, (list, tuple)) and not isinstance(grid[0],
                                                          (list, tuple,
                                                           np.ndarray)):
        grid = (grid,)
    shape = tuple(len(g) for g in grid)
    if mode == "vmap":
        fvmx = np.asarray(grid_search_vmap(fn, grid)).reshape(shape)
    else:
        fvmx = np.empty(shape)
        for idx, prm in zip(itertools.product(*(range(n) for n in shape)),
                            itertools.product(*grid)):
            fvmx[idx] = float(fn(prm))
    sidx = np.unravel_index(np.argmin(fvmx) if fmin else np.argmax(fvmx),
                            shape)
    sprm = tuple(grid[i][sidx[i]] for i in range(len(grid)))
    sfvl = fvmx[sidx]
    return sprm, sfvl, fvmx, sidx


def grid_search_vmap(fn, grid):
    """Evaluate a traceable ``fn(p0, p1, ...)`` over the full Cartesian
    grid with a single vmapped, jitted program; returns the flat value
    array (row-major over the grid)."""
    meshes = jnp.meshgrid(*[jnp.asarray(g) for g in grid],
                          indexing="ij")
    flat = [m.ravel() for m in meshes]

    @jax.jit
    def run(*cols):
        return jax.vmap(fn)(*cols)

    return run(*flat)
