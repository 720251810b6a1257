"""Shared machinery for model classes: the thin stateful shell around
the functional solver cores.

Replaces the reference's deep template-method inheritance
(``sporco/common.py:120``, ``sporco/admm/admm.py:28``) with a minimal
host-side wrapper holding ``(cfg, params, opts, state)``.  ``solve()``
is re-entrant (the state pytree carries the iteration counter), solver
state is serialisable (checkpoint parity with the reference's pickling
machinery, ``sporco/common.py:24-82``), and all timing is collected via
:class:`sporco_tpu.utils.timer.Timer` with ``init``/``solve`` labels.
"""

import jax
import jax.numpy as jnp

from sporco_tpu import refopts
from sporco_tpu.solvers import admm as _admm
from sporco_tpu.solvers import pgm as _pgm
from sporco_tpu.utils.timer import Timer

__all__ = ["ADMMModel", "PGMModel", "device_sync"]


def device_sync(state):
    """Force completion of all device work producing ``state``.

    ``jax.block_until_ready`` alone is not a reliable barrier on every
    PJRT plugin (some relay backends acknowledge enqueue rather than
    completion), so a one-element host fetch -- which must wait for the
    producing program -- is used as the barrier.  A single 0-d leaf is
    fetched when one exists: a solver state's scalars (residuals, rho,
    k) are outputs of the same program as the arrays, and one fetch is
    one relay round trip, where ``block_until_ready`` over the whole
    pytree was measured to cost ~25 ms of per-leaf round trips per
    ``solve()`` call on the relay backend.
    """
    leaves = jax.tree_util.tree_leaves(state)
    if not leaves:
        return
    scalar = next((l for l in leaves if getattr(l, "ndim", None) == 0),
                  None)
    if scalar is None:
        scalar = jnp.ravel(leaves[-1])[:1]
    # start the device->host copy asynchronously first: the request's
    # forward leg travels to the (possibly remote) device while the
    # producing program is still running, so the blocking fetch below
    # pays only the return leg instead of a full round trip
    try:
        scalar.copy_to_host_async()
    except Exception:
        pass
    jax.device_get(scalar)


class ADMMModel:
    """Base for ADMM-driven model classes.  Subclasses set
    ``self.problem`` (an :class:`ADMMProblem`), ``self.cfg``,
    ``self.params``, ``self.opts`` and ``self.state`` in ``__init__``.

    Every subclass constructor transparently accepts a reference-style
    option dict as ``opt`` (``sporco/cdict.py:55`` semantics; see
    :mod:`sporco_tpu.refopts`): subclasses declare their model-specific
    key additions in ``REF_OPT_EXTRA``."""

    REF_OPT_EXTRA = refopts.ADMM_BASE

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        refopts.wrap_init(cls)

    def __init__(self):
        self.timer = Timer(["init", "solve"])
        self.timer.start("init")
        self.k_start = 0

    def _init_done(self):
        self.timer.stop("init")

    def solve(self):
        """Run (or resume) the jitted solve loop; returns the minimiser
        in the reference's output layout."""
        # keep the start counter as a device scalar: int() here would
        # cost one relay round trip (~25 ms) per solve call
        self.k_start = self.state.k
        self.timer.start("solve")
        self.state = _admm.admm_solve(self.problem, self.cfg, self.params,
                                      self.opts, self.state)
        device_sync(self.state)
        self.timer.stop("solve")
        return self.getmin()

    def getmin(self):
        """Minimiser (subclasses convert to user layout)."""
        return self.state.Y

    def getitstat(self):
        """Per-iteration statistics of the most recent ``solve`` call."""
        return _admm.iterstats(self.problem, self.state, self.k_start)

    @property
    def itstat(self):
        return self.getitstat()

    def state_dict(self):
        """Serialisable snapshot of the solver state (checkpointing)."""
        return jax.tree_util.tree_map(lambda x: x, self.state)._asdict()

    def load_state(self, d):
        self.state = type(self.state)(**d)

    def save_state(self, path):
        """Checkpoint the solver state to an ``.npz`` file (the
        capability the reference provides through pickling solver
        objects, ``sporco/common.py:24-82``)."""
        _save_pytree(path, self.state)

    def load_state_file(self, path):
        """Restore a checkpoint written by :meth:`save_state`."""
        self.state = _load_pytree(path, self.state)

    def solve_chunked(self, callback, chunk=10, max_chunks=None):
        """Run the solve in host-visible chunks, invoking
        ``callback(model)`` between chunks (the capability of the
        reference's per-iteration ``Callback`` option,
        ``sporco/admm/admm.py:148``, adapted to the jitted loop: the
        callback fires every ``chunk`` device iterations).  Returns the
        minimiser; the callback may return True to stop early."""
        import dataclasses
        opts = self.opts
        nch = ((opts.max_iter + chunk - 1) // chunk
               if max_chunks is None else max_chunks)
        self.opts = dataclasses.replace(opts, max_iter=chunk)
        try:
            for _ in range(nch):
                self.solve()
                if callback(self):
                    break
        finally:
            self.opts = opts
        return self.getmin()

    def display(self, file=None):
        """Print the per-iteration statistics table (capability of the
        reference's Verbose status display, ``sporco/common.py:230``)."""
        _display_stats(self.getitstat(), file=file)


def _save_pytree(path, tree):
    import numpy as _np
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    _np.savez(path, __n__=len(leaves),
              **{f"leaf{i}": _np.asarray(v)
                 for i, v in enumerate(leaves)})


def _load_pytree(path, like):
    import numpy as _np
    npz = _np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new = [jnp.asarray(npz[f"leaf{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new)


def _display_stats(its, file=None):
    names = [n for n in its._names]
    widths = [max(9, len(n) + 1) for n in names]
    hdr = "".join(n.rjust(w) for n, w in zip(names, widths))
    print(hdr, file=file)
    print("-" * len(hdr), file=file)
    import numpy as _np
    n = len(its)
    for i in range(n):
        row = []
        for name, w in zip(names, widths):
            v = getattr(its, name)[i]
            if name == "Iter":
                row.append(str(int(v)).rjust(w))
            else:
                row.append(f"{v:.2e}".rjust(w))
        print("".join(row), file=file)


class PGMModel:
    """Base for PGM-driven model classes.  Constructors accept
    reference-style option dicts (see :class:`ADMMModel`)."""

    REF_OPT_EXTRA = refopts.PGM_BASE

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        refopts.wrap_init(cls)

    def __init__(self):
        self.timer = Timer(["init", "solve"])
        self.timer.start("init")
        self.k_start = 0

    def _init_done(self):
        self.timer.stop("init")

    def solve(self):
        self.k_start = self.state.k
        self.timer.start("solve")
        self.state = _pgm.pgm_solve(self.problem, self.cfg, self.params,
                                    self.opts, self.state)
        device_sync(self.state)
        self.timer.stop("solve")
        return self.getmin()

    def getmin(self):
        return self.state.X

    def getitstat(self):
        return _pgm.pgm_iterstats(self.problem, self.state, self.k_start)

    @property
    def itstat(self):
        return self.getitstat()

    def state_dict(self):
        return jax.tree_util.tree_map(lambda x: x, self.state)._asdict()

    def load_state(self, d):
        self.state = type(self.state)(**d)

    def save_state(self, path):
        _save_pytree(path, self.state)

    def load_state_file(self, path):
        self.state = _load_pytree(path, self.state)

    def display(self, file=None):
        _display_stats(self.getitstat(), file=file)


def default_rho_xi(lmbda):
    """Default AutoRho residual-ratio target xi as a function of lambda
    (Sec. VI.C of wohlberg-2015-adaptive; ``sporco/admm/bpdn.py:424``)."""
    import math
    if lmbda is None or lmbda == 0.0:
        return 1.0
    return float(1.0 + 18.3 ** (math.log10(float(lmbda)) + 1.0))
