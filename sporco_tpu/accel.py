"""Accelerator convenience API.

Functional-surface parity with the reference's native-GPU binding
``sporco.cuda`` (``sporco/cuda/__init__.py:6-18``; API documented in
``docs/source/modules/sporco.cuda.rst:107-239``): the four fused CSC
solvers ``cbpdn``, ``cbpdngrd``, ``cbpdnmsk``, ``cbpdngrdmsk`` plus
device-query helpers.  Here they are thin functional wrappers over the
jit-compiled TPU solver classes -- the "native fused implementation" is
the XLA-compiled program itself, so (unlike the reference, whose CUDA
build supports only single-image single-channel problems) these accept
the full generality of the underlying classes.

There is no analogue of ``sporco.cupy`` (the module-patching GPU port,
``sporco/cupy/``): jax *is* the array backend of every solver in this
package, on TPU, GPU, and CPU alike.
"""

import jax
import jax.numpy as jnp

from sporco_tpu.models import cbpdn as _cbpdn

__all__ = ["cbpdn", "cbpdngrd", "cbpdnmsk", "cbpdngrdmsk",
           "device_count", "current_device", "device_name",
           "memory_info"]

def cbpdn(D, s, lmbda, opt=None, dev=0, **kw):
    """Solve ConvBPDN on the accelerator; returns the coefficient map
    (parity with ``sporco.cuda.cbpdn``).  ``opt`` may be an
    :class:`ADMMOpts` or a reference-style option dict (translated by
    the model constructors via :mod:`sporco_tpu.refopts`)."""
    b = _cbpdn.ConvBPDN(D, s, lmbda, opt=opt, **kw)
    return b.solve()


def cbpdngrd(D, s, lmbda, mu, opt=None, dev=0, **kw):
    """Solve ConvBPDNGradReg (parity with ``sporco.cuda.cbpdngrd``)."""
    b = _cbpdn.ConvBPDNGradReg(D, s, lmbda, mu=mu, opt=opt, **kw)
    return b.solve()


def cbpdnmsk(D, s, w, lmbda, opt=None, dev=0, **kw):
    """Solve masked CSC via Additive Mask Simulation (parity with
    ``sporco.cuda.cbpdnmsk``)."""
    ams = _cbpdn.AddMaskSim(_cbpdn.ConvBPDN, D, s, w, lmbda, opt=opt,
                            **kw)
    return ams.solve()


def cbpdngrdmsk(D, s, w, lmbda, mu, opt=None, dev=0, **kw):
    """Solve masked gradient-regularised CSC via AMS (parity with
    ``sporco.cuda.cbpdngrdmsk``)."""
    ams = _cbpdn.AddMaskSim(_cbpdn.ConvBPDNGradReg, D, s, w, lmbda,
                            mu=mu, opt=opt, **kw)
    return ams.solve()


def device_count():
    """Number of available accelerator devices."""
    return jax.device_count()


def current_device(id=None):
    """Get (or nominally set) the current device index."""
    return 0 if id is None else id


def device_name(int_id=0):
    """Name of the given device."""
    return str(jax.devices()[int_id])


def memory_info():
    """(free, total) device memory in bytes where the backend exposes
    it; (-1, -1) otherwise."""
    try:
        d = jax.devices()[0]
        stats = d.memory_stats()
        total = stats.get("bytes_limit", -1)
        used = stats.get("bytes_in_use", 0)
        return (total - used if total > 0 else -1, total)
    except Exception:
        return (-1, -1)
