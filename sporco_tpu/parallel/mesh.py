"""Device mesh helpers.

The framework's parallelism axes follow SURVEY.md §2.10: training
signals (K) shard on the ``"data"`` axis (consensus dictionary
learning, the analogue of the reference's multiprocessing pool over
images, ``sporco/dictlrn/prlcnscdl.py:509-513``); dictionary filters
(M) may shard on a ``"filter"`` axis (the ParConvBPDN analogue).
Reductions over these axes lower to XLA all-reduces over ICI.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "Mesh", "NamedSharding", "PartitionSpec"]


def make_mesh(n_data=None, n_filter=1, devices=None):
    """Construct a ``Mesh`` with axes ``("data", "filter")``.

    ``n_data`` defaults to ``len(devices) // n_filter``.  Use all local
    devices by default.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_filter
    devices = np.asarray(devices[:n_data * n_filter]).reshape(
        (n_data, n_filter))
    return Mesh(devices, ("data", "filter"))


def data_sharding(mesh, axis=0, ndim=None):
    """NamedSharding placing array axis ``axis`` on the mesh "data"
    axis (all other axes replicated)."""
    if ndim is None:
        spec = PartitionSpec(*(("data",) if axis == 0 else ()))
    else:
        parts = [None] * ndim
        parts[axis] = "data"
        spec = PartitionSpec(*parts)
    return NamedSharding(mesh, spec)


def replicated(mesh):
    """Fully replicated sharding."""
    return NamedSharding(mesh, PartitionSpec())


def shard_batch(mesh, x, axis=0):
    """Place ``x`` with its ``axis`` sharded over the mesh data axis."""
    return jax.device_put(x, data_sharding(mesh, axis=axis, ndim=x.ndim))
