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


def _run_reference_generic(code, timeout=600):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    bench._ensure_shims()
    pre = f"""
import sys, json, warnings
warnings.filterwarnings("ignore")
sys.path.insert(0, "/tmp/shims"); sys.path.insert(1, "{_REF}")
import numpy as np
"""
    out = subprocess.run(
        [sys.executable, "-c", pre + code], capture_output=True,
        text=True, timeout=timeout,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_bpdn_objective_matches_reference(tmp_path):
    """BASELINE config 1 (BPDN): identical per-iteration objective."""
    from sporco_tpu.models import bpdn as mb
    import jax.numpy as jnp
    rng = np.random.default_rng(12345)
    N, M = 64, 128
    D = rng.standard_normal((N, M))
    s = D @ (np.abs(rng.standard_normal((M, 1))) > 2.2)
    np.save(tmp_path / "D.npy", D)
    np.save(tmp_path / "s.npy", s.astype(np.float64))
    ref = _run_reference_generic(f"""
from sporco.admm import bpdn
D = np.load("{tmp_path}/D.npy"); s = np.load("{tmp_path}/s.npy")
opt = bpdn.BPDN.Options({{'Verbose': False, 'MaxMainIter': 25,
                         'RelStopTol': 0.0}})
b = bpdn.BPDN(D, s, 0.1, opt)
b.solve()
print(json.dumps({{"obj": list(map(float, b.getitstat().ObjFun))}}))
""")
    opt = mb.BPDN.options(max_iter=25, rel_stop_tol=0.0)
    b = mb.BPDN(D, s, lmbda=0.1, opt=opt, dtype=jnp.float64)
    b.solve()
    obj = np.asarray(b.getitstat().ObjFun)
    assert np.allclose(obj, np.asarray(ref["obj"]), rtol=1e-6)


def test_tvl2_objective_matches_reference(tmp_path):
    """BASELINE config 2 (TVL2Denoise): identical objective."""
    from sporco_tpu.models import tv
    import jax.numpy as jnp
    rng = np.random.default_rng(12345)
    N = 64
    img = np.zeros((N, N))
    img[N // 4:3 * N // 4, N // 4:3 * N // 4] = 1.0
    S = img + 0.1 * rng.standard_normal((N, N))
    np.save(tmp_path / "S.npy", S)
    ref = _run_reference_generic(f"""
from sporco.admm import tvl2
S = np.load("{tmp_path}/S.npy")
opt = tvl2.TVL2Denoise.Options({{'Verbose': False, 'MaxMainIter': 20,
                                'RelStopTol': 0.0}})
b = tvl2.TVL2Denoise(S, 0.05, opt)
b.solve()
print(json.dumps({{"obj": list(map(float, b.getitstat().ObjFun))}}))
""")
    opt = tv.TVL2Denoise.options(max_iter=20, rel_stop_tol=0.0)
    b = tv.TVL2Denoise(S, 0.05, opt=opt, dtype=jnp.float64)
    b.solve()
    obj = np.asarray(b.getitstat().ObjFun)
    # the x-step uses the same fixed number of (Jacobi vs Gauss-Seidel)
    # sweeps, so objectives agree closely but not to rounding
    assert np.allclose(obj, np.asarray(ref["obj"]), rtol=1e-3)
    assert abs(obj[-1] - ref["obj"][-1]) < 1e-4 * abs(ref["obj"][-1])


def test_rpca_objective_matches_reference(tmp_path):
    """BASELINE config 3 (RobustPCA): identical objective."""
    from sporco_tpu.models import rpca
    import jax.numpy as jnp
    rng = np.random.default_rng(12345)
    N, r = 64, 4
    L = rng.standard_normal((N, r)) @ rng.standard_normal((r, N))
    Ssp = (rng.random((N, N)) > 0.9) * rng.standard_normal((N, N)) * 5
    S = L + Ssp
    np.save(tmp_path / "S.npy", S)
    ref = _run_reference_generic(f"""
from sporco.admm import rpca
S = np.load("{tmp_path}/S.npy")
opt = rpca.RobustPCA.Options({{'Verbose': False, 'MaxMainIter': 15,
                              'RelStopTol': 0.0}})
b = rpca.RobustPCA(S, None, opt)
b.solve()
print(json.dumps({{"obj": list(map(float, b.getitstat().ObjFun))}}))
""")
    opt = rpca.RobustPCA.options(max_iter=15, rel_stop_tol=0.0)
    b = rpca.RobustPCA(S, opt=opt, dtype=jnp.float64)
    b.solve()
    obj = np.asarray(b.getitstat().ObjFun)
    assert np.allclose(obj, np.asarray(ref["obj"]), rtol=1e-6)


def test_tvl1_objective_matches_reference(tmp_path):
    """TVL1Denoise: trajectory-level objective parity.  The reference's
    "GaussSeidelStep" reads every neighbour from the previous iterate
    (``sporco/admm/tvl1.py:389-398``), i.e. it IS a Jacobi sweep -- the
    same update this implementation runs -- so the trajectories agree
    to f64 rounding (measured 4e-8 over 30 iterations; the f32 stats
    buffer bounds the comparison)."""
    from sporco_tpu.models import tv
    import jax.numpy as jnp
    rng = np.random.default_rng(12345)
    N = 48
    img = np.zeros((N, N))
    img[N // 4:3 * N // 4, N // 4:3 * N // 4] = 1.0
    S = img.copy()
    m = rng.random((N, N))
    S[m < 0.05] = 0.0
    S[m > 0.95] = 1.0
    np.save(tmp_path / "S.npy", S)
    ref = _run_reference_generic(f"""
from sporco.admm import tvl1
S = np.load("{tmp_path}/S.npy")
opt = tvl1.TVL1Denoise.Options({{'Verbose': False, 'MaxMainIter': 30,
                                'RelStopTol': 0.0}})
b = tvl1.TVL1Denoise(S, 0.8, opt)
b.solve()
print(json.dumps({{"obj": list(map(float, b.getitstat().ObjFun))}}))
""")
    opt = tv.TVL1Denoise.options(max_iter=30, rel_stop_tol=0.0)
    b = tv.TVL1Denoise(S, 0.8, opt=opt, dtype=jnp.float64)
    b.solve()
    obj = np.asarray(b.getitstat().ObjFun)
    ref_obj = np.asarray(ref["obj"])
    assert np.allclose(obj, ref_obj, rtol=1e-6)


def test_spline_objective_matches_reference(tmp_path):
    """SplineL1 (DCT-domain x-step): identical objective."""
    from sporco_tpu.models import spline
    import jax.numpy as jnp
    rng = np.random.default_rng(12345)
    N = 48
    x = np.linspace(-1, 1, N)
    S = np.outer(np.sin(2 * x), np.cos(3 * x))
    m = rng.random((N, N))
    S[m < 0.05] += 2.0
    np.save(tmp_path / "S.npy", S)
    ref = _run_reference_generic(f"""
from sporco.admm import spline
S = np.load("{tmp_path}/S.npy")
opt = spline.SplineL1.Options({{'Verbose': False, 'MaxMainIter': 25,
                               'RelStopTol': 0.0}})
b = spline.SplineL1(S, 5.0, opt)
b.solve()
print(json.dumps({{"obj": list(map(float, b.getitstat().ObjFun))}}))
""")
    opt = spline.SplineL1.options(max_iter=25, rel_stop_tol=0.0)
    b = spline.SplineL1(S, 5.0, opt=opt, dtype=jnp.float64)
    b.solve()
    obj = np.asarray(b.getitstat().ObjFun)
    assert np.allclose(obj, np.asarray(ref["obj"]), rtol=1e-6)


def test_cbpdn_gradreg_fused_matches_reference(tmp_path):
    """The fused gradreg driver (cbpdngrd scope of the reference CUDA
    extension) against the reference ConvBPDNGradReg itself."""
    from sporco_tpu.models import cbpdn as mc
    from sporco_tpu.ops import fused_csc
    import jax.numpy as jnp
    rng = np.random.default_rng(12345)
    N, Nd, M = 32, 8, 4
    D = rng.standard_normal((Nd, Nd, M))
    S = rng.standard_normal((N, N))
    np.save(tmp_path / "D.npy", D)
    np.save(tmp_path / "S.npy", S)
    ref = _run_reference_generic(f"""
from sporco.admm import cbpdn
D = np.load("{tmp_path}/D.npy"); S = np.load("{tmp_path}/S.npy")
opt = cbpdn.ConvBPDNGradReg.Options({{'Verbose': False,
    'MaxMainIter': 20, 'RelStopTol': 0.0}})
b = cbpdn.ConvBPDNGradReg(D, S, 0.1, 0.2, opt)
b.solve()
its = b.getitstat()
print(json.dumps({{"obj": list(map(float, its.ObjFun)),
                  "rgr": list(map(float, its.RegGrad))}}))
""")
    opt = mc.ConvBPDNGradReg.options(max_iter=20, rel_stop_tol=0.0)
    b = mc.ConvBPDNGradReg(D, S, 0.1, mu=0.2, opt=opt,
                           dtype=jnp.float64)
    # f64 falls back to the generic driver; also run the fused f32 one
    b.solve()
    obj = np.asarray(b.getitstat().ObjFun)
    assert np.allclose(obj, np.asarray(ref["obj"]), rtol=1e-6)
    assert np.allclose(np.asarray(b.getitstat().RegGrad),
                       np.asarray(ref["rgr"]), rtol=1e-5, atol=1e-9)
    bf = mc.ConvBPDNGradReg(D, S, 0.1, mu=0.2, opt=opt, fused=True)
    assert fused_csc.eligible(bf.cfg, bf.params, bf.opts)
    bf.solve()
    obj_f = np.asarray(bf.getitstat().ObjFun)
    assert np.allclose(obj_f, np.asarray(ref["obj"]), rtol=2e-4)


def test_conv_elasticnet_matches_reference(tmp_path):
    from sporco_tpu.models import cbpdn as mc
    import jax.numpy as jnp
    rng = np.random.default_rng(12345)
    N, Nd, M = 32, 6, 4
    D = rng.standard_normal((Nd, Nd, M))
    S = rng.standard_normal((N, N))
    np.save(tmp_path / "D.npy", D)
    np.save(tmp_path / "S.npy", S)
    ref = _run_reference_generic(f"""
from sporco.admm import cbpdn
D = np.load("{tmp_path}/D.npy"); S = np.load("{tmp_path}/S.npy")
opt = cbpdn.ConvElasticNet.Options({{'Verbose': False,
    'MaxMainIter': 20, 'RelStopTol': 0.0}})
b = cbpdn.ConvElasticNet(D, S, 0.1, 0.05, opt)
b.solve()
print(json.dumps({{"obj": list(map(float, b.getitstat().ObjFun))}}))
""")
    opt = mc.ConvElasticNet.options(max_iter=20, rel_stop_tol=0.0)
    b = mc.ConvElasticNet(D, S, 0.1, mu=0.05, opt=opt,
                          dtype=jnp.float64)
    b.solve()
    obj = np.asarray(b.getitstat().ObjFun)
    assert np.allclose(obj, np.asarray(ref["obj"]), rtol=1e-6)


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
