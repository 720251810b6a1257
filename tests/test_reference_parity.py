"""Objective-value parity with the reference implementation on the
ACTUAL example data set (BASELINE.md: "match SPORCO objective values
within its stopping tolerances on the example benchmark set").

Runs the reference (numpy, in a subprocess with its compat shims) and
this framework on an identical crop of the bundled ``barbara.png`` with
the bundled pre-learned 12x12x36 dictionary -- the configuration of
``examples/scripts/csc/cbpdn_gry.py`` -- and compares the per-iteration
objective trajectories.  Skipped when the reference checkout is not
mounted (conditional collection, the reference's own test strategy).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(_REF, "sporco", "data")),
    reason="reference checkout not mounted")


def _run_reference(crop_path, d_path, lmbda, n_iter):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    bench._ensure_shims()
    code = f"""
import sys, json, warnings
warnings.filterwarnings("ignore")
sys.path.insert(0, "/tmp/shims"); sys.path.insert(1, "{_REF}")
import numpy as np
from sporco import signal
from sporco.admm import cbpdn
img = np.load("{crop_path}")
D = np.load("{d_path}")
sl, sh = signal.tikhonov_filter(img, 10.0, 16)
opt = cbpdn.ConvBPDN.Options({{'Verbose': False,
                              'MaxMainIter': {n_iter},
                              'RelStopTol': 0.0, 'AuxVarObj': False}})
b = cbpdn.ConvBPDN(D, sh, {lmbda}, opt)
b.solve()
its = b.getitstat()
print(json.dumps({{"sh_norm": float(np.linalg.norm(sh)),
                  "obj": list(map(float, its.ObjFun)),
                  "dfid": list(map(float, its.DFid))}}))
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600, env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cbpdn_objective_matches_reference_on_barbara(tmp_path):
    from sporco_tpu.utils.util import ExampleImages, convdicts
    from sporco_tpu.utils.signal import tikhonov_filter
    from sporco_tpu.models import cbpdn as mc
    import jax.numpy as jnp

    ei = ExampleImages(scaled=True, gray=True, dtype=np.float64)
    img = ei.image("barbara.png",
                   idxexp=np.s_[10:138, 100:228])      # 128x128 crop
    D = convdicts()["G:12x12x36"].astype(np.float64)
    lmbda, n_iter = 5e-2, 20

    crop_path = str(tmp_path / "crop.npy")
    d_path = str(tmp_path / "D.npy")
    np.save(crop_path, img)
    np.save(d_path, D)
    ref = _run_reference(crop_path, d_path, lmbda, n_iter)

    sl, sh = tikhonov_filter(jnp.asarray(img), 10.0, 16)
    # identical pre-processing (the tikhonov split feeds the solver)
    assert abs(float(jnp.linalg.norm(sh)) - ref["sh_norm"]) \
        < 1e-6 * ref["sh_norm"]

    opt = mc.ConvBPDN.options(max_iter=n_iter, rel_stop_tol=0.0)
    b = mc.ConvBPDN(D, np.asarray(sh), lmbda=lmbda, opt=opt,
                    dtype=jnp.float64)
    b.solve()
    its = b.getitstat()

    obj = np.asarray(its.ObjFun)
    ref_obj = np.asarray(ref["obj"])
    assert obj.shape == ref_obj.shape
    # identical trajectories (same data, same algorithm, f64)
    assert np.allclose(obj, ref_obj, rtol=1e-6), (
        np.abs(obj / ref_obj - 1).max())
    assert np.allclose(np.asarray(its.DFid), np.asarray(ref["dfid"]),
                       rtol=1e-6)
