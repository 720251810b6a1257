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

# reference ConvBPDN.Options keys -> (ADMMOpts field | special handler)
# (sporco/admm/admm.py:148-161, sporco/admm/cbpdn.py:484-495): lets a
# reference user pass the familiar option dict straight through
_OPT_KEYS = {
    "MaxMainIter": "max_iter",
    "RelStopTol": "rel_stop_tol",
    "AbsStopTol": "abs_stop_tol",
    "RelaxParam": "relax_param",
    "rho": "rho",
    "FastSolve": "fast_solve",
    "Verbose": "verbose",
    "StdResiduals": None,          # handled via AutoRho subtree
}
_AUTORHO_KEYS = {"Enabled": "enabled", "Period": "period",
                 "AutoScaling": "auto_scaling", "Scaling": "scaling",
                 "RsdlRatio": "rsdl_ratio", "RsdlTarget": "rsdl_target"}
_KW_KEYS = {"L1Weight": "wl1", "GradWeight": "wgrd",
            "NonNegCoef": "non_neg", "NoBndryCross": "no_bndry"}


def _translate_opt(cls, opt, kw):
    """Accept reference-style option dicts (``{'MaxMainIter': 200,
    'RelStopTol': 5e-3, 'AutoRho': {'Enabled': True}, ...}``) in
    addition to this package's :class:`ADMMOpts` objects."""
    if opt is None or not isinstance(opt, dict):
        return opt, kw
    import dataclasses
    from sporco_tpu.solvers.admm import AutoRhoOpts
    fields = {}
    kw = dict(kw)
    ar_sub = {}
    for key, val in opt.items():
        if key in _KW_KEYS:
            kw.setdefault(_KW_KEYS[key], val)
        elif key == "AutoRho":
            ar_sub.update({_AUTORHO_KEYS[k]: v for k, v in val.items()
                           if k in _AUTORHO_KEYS})
        elif key == "StdResiduals":
            ar_sub["std_residuals"] = val
        elif key in _OPT_KEYS and _OPT_KEYS[key] is not None:
            fields[_OPT_KEYS[key]] = val
        # unknown keys are ignored (reference-only plumbing such as
        # HighMemSolve/DataType has no analogue here)
    if ar_sub:
        base = cls.options().auto_rho
        fields["auto_rho"] = dataclasses.replace(base, **ar_sub)
    return cls.options(**fields), kw


def cbpdn(D, s, lmbda, opt=None, dev=0, **kw):
    """Solve ConvBPDN on the accelerator; returns the coefficient map
    (parity with ``sporco.cuda.cbpdn``).  ``opt`` may be an
    :class:`ADMMOpts` or a reference-style option dict."""
    opt, kw = _translate_opt(_cbpdn.ConvBPDN, opt, kw)
    b = _cbpdn.ConvBPDN(D, s, lmbda, opt=opt, **kw)
    return b.solve()


def cbpdngrd(D, s, lmbda, mu, opt=None, dev=0, **kw):
    """Solve ConvBPDNGradReg (parity with ``sporco.cuda.cbpdngrd``)."""
    opt, kw = _translate_opt(_cbpdn.ConvBPDNGradReg, opt, kw)
    b = _cbpdn.ConvBPDNGradReg(D, s, lmbda, mu=mu, opt=opt, **kw)
    return b.solve()


def cbpdnmsk(D, s, w, lmbda, opt=None, dev=0, **kw):
    """Solve masked CSC via Additive Mask Simulation (parity with
    ``sporco.cuda.cbpdnmsk``)."""
    opt, kw = _translate_opt(_cbpdn.ConvBPDN, opt, kw)
    ams = _cbpdn.AddMaskSim(_cbpdn.ConvBPDN, D, s, w, lmbda, opt=opt,
                            **kw)
    return ams.solve()


def cbpdngrdmsk(D, s, w, lmbda, mu, opt=None, dev=0, **kw):
    """Solve masked gradient-regularised CSC via AMS (parity with
    ``sporco.cuda.cbpdngrdmsk``)."""
    opt, kw = _translate_opt(_cbpdn.ConvBPDNGradReg, opt, kw)
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
