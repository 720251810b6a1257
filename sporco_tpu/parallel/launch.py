"""Multi-host (DCN x ICI) launching for the sharded solvers.

Reference analogue: ``sporco/mpiutil.py:65-175`` -- the only true
multi-node code in SPORCO (an MPI ``Allgatherv`` hyperparameter grid
search) -- plus the multiprocessing consensus CDL
(``sporco/dictlrn/prlcnscdl.py``), whose shared-memory pool this
framework already replaces with a device-sharded fused loop
(:mod:`sporco_tpu.parallel.consensus`).

Here multi-host runs are standard JAX multi-controller SPMD: every
process runs the same program; arrays are globally sharded over a mesh
whose ``"data"`` axis is ordered host-major, so a contiguous block of
the K (signal) axis lives on each host's ICI domain and the dictionary
consensus all-reduce does its partial reductions over ICI before
crossing DCN once per iteration.  The dictionary itself is tiny
(``Nd^2 * Cd * M`` floats), so the cross-host phase is latency-, not
bandwidth-bound (SURVEY.md §7.4).

Typical 2-host usage (same script on every host)::

    from sporco_tpu.parallel import launch
    launch.initialize(coordinator_address="host0:1234",
                      num_processes=2, process_id=rank)
    mesh = launch.global_mesh()
    d = launch.consensus_cdl(D0, S_local, lmbda=0.1, mesh=mesh,
                             max_iter=100)
    d.solve()

On TPU pod slices ``launch.initialize()`` with no arguments uses the
environment (TPU metadata) for coordinator discovery, matching
``jax.distributed.initialize`` semantics.
"""

import numpy as np
import jax
from jax.sharding import Mesh

from sporco_tpu.parallel.mesh import data_sharding

__all__ = ["initialize", "global_mesh", "shard_local_batch",
           "consensus_cdl", "grid_search"]


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, local_device_ids=None):
    """Initialise the JAX distributed runtime (multi-controller).

    Thin wrapper over ``jax.distributed.initialize``: every argument
    left ``None`` is auto-detected from the environment (TPU pod
    metadata, or the ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID`` variables).  Must run before any JAX backend is
    initialised.  Replaces the reference's ``mpiexec``-launched mpi4py
    communicator (``sporco/mpiutil.py:14``).
    """
    kw = {"coordinator_address": coordinator_address,
          "num_processes": num_processes,
          "process_id": process_id,
          "local_device_ids": local_device_ids}
    jax.distributed.initialize(**{k: v for k, v in kw.items()
                                  if v is not None})


def global_mesh(n_filter=1, devices=None):
    """A ``("data", "filter")`` mesh over ALL processes' devices.

    Devices are ordered host-major (process index outer), so
    consecutive blocks of the ``"data"`` axis are intra-host: XLA's
    all-reduce then runs hierarchically -- ICI reduction within a host,
    one DCN exchange across hosts.
    """
    if devices is None:
        devices = jax.devices()
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    n_data = len(devs) // n_filter
    arr = np.array(devs[:n_data * n_filter]).reshape(n_data, n_filter)
    return Mesh(arr, ("data", "filter"))


def shard_local_batch(mesh, local, axis=0):
    """Assemble a globally K-sharded array from per-process local
    batches (the device-mesh analogue of the reference's per-worker
    shared-memory slices, ``sporco/dictlrn/prlcnscdl.py:69-130``).

    Each process passes its own ``local`` chunk; the returned global
    ``jax.Array`` has that axis sharded over the mesh ``"data"`` axis
    with global size ``process_count * local.shape[axis]``.
    """
    local = np.asarray(local)
    sh = data_sharding(mesh, axis, local.ndim)
    if jax.process_count() == 1:
        return jax.device_put(local, sh)
    return jax.make_array_from_process_local_data(sh, local)


def consensus_cdl(D0, S_local, lmbda, mesh=None, **kw):
    """Construct a consensus-CDL solver whose signal batch is given
    per-process: each process passes only its own ``S_local`` (user
    layout, K axis last); the global batch is the concatenation over
    processes, sharded over the mesh ``"data"`` axis.

    Single-process this is identical to
    ``ConvBPDNDictLearn_Consensus(D0, S_local, lmbda, mesh=mesh)``.
    """
    from sporco_tpu.parallel.consensus import ConvBPDNDictLearn_Consensus
    if mesh is None:
        mesh = global_mesh()
    return ConvBPDNDictLearn_Consensus(
        D0, S_local, lmbda, mesh=mesh,
        process_local_batch=jax.process_count() > 1, **kw)


def grid_search(fn, grid, fmin=True):
    """Multi-process hyperparameter grid search: the DCN analogue of the
    reference's MPI grid search (``sporco/mpiutil.py:65-175``).

    The Cartesian product of ``grid`` (a tuple of 1-D arrays) is
    rank-chunked over processes (cf. ``_get_rank_limits``,
    ``mpiutil.py:26-61``); each process evaluates its chunk of ``fn``
    serially on host, and values are exchanged with a global all-gather
    (cf. ``comm.Allgatherv``, ``mpiutil.py:136-153``).  Every process
    returns the same ``(best_params, best_value, all_values)``.

    Single-process it degrades to a plain serial sweep, like running
    the reference's MPI version under one rank.
    """
    import itertools
    prms = list(itertools.product(*[np.asarray(g).tolist() for g in grid]))
    nproc = jax.process_count()
    rank = jax.process_index()
    n = len(prms)
    lo = (rank * n) // nproc
    hi = ((rank + 1) * n) // nproc
    local_vals = np.array([fn(p) for p in prms[lo:hi]], np.float64)
    if nproc > 1:
        # fixed-size per-rank slots (ragged chunks padded with nan)
        width = max(((r + 1) * n) // nproc - (r * n) // nproc
                    for r in range(nproc))
        pad = np.full(width, np.nan)
        pad[:hi - lo] = local_vals
        from jax.experimental import multihost_utils
        gathered = np.asarray(multihost_utils.process_allgather(pad))
        vals = np.concatenate(
            [gathered[r][:((r + 1) * n) // nproc - (r * n) // nproc]
             for r in range(nproc)])
    else:
        vals = local_vals
    idx = int(np.nanargmin(vals) if fmin else np.nanargmax(vals))
    return prms[idx], float(vals[idx]), vals.reshape(
        tuple(len(np.asarray(g)) for g in grid))
