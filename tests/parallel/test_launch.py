"""Multi-host (multi-controller) path: two cooperating JAX processes on
CPU must reproduce the single-process consensus-CDL trajectory exactly
(capability target of BASELINE.md's 2+ host scaling row; reference
multi-node analogue ``sporco/mpiutil.py:65-175``)."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from sporco_tpu.parallel import consensus, launch


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestMultiProcessLaunch:

    def test_two_process_matches_single(self, tmp_path):
        child = os.path.join(os.path.dirname(__file__),
                             "_launch_child.py")
        port = _free_port()
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [subprocess.Popen(
            [sys.executable, child, str(r), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env) for r in range(2)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append(out)
        for r, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"rank {r} failed:\n{out[-3000:]}"

        # single-process run on the identical (seeded) data
        rng = np.random.default_rng(12345)
        N, Nd, M, K = 16, 5, 8, 8
        D0 = rng.standard_normal((Nd, Nd, M))
        S = rng.standard_normal((N, N, K))
        d = consensus.ConvBPDNDictLearn_Consensus(
            D0, S, lmbda=0.05, max_iter=10, dtype=jnp.float64)
        D1 = np.asarray(d.solve())
        obj1 = d.evaluate()[0]

        D2 = np.load(tmp_path / "D_multi.npy")
        obj2 = float(np.load(tmp_path / "obj_multi.npy")[0])
        assert np.allclose(D1, D2, atol=1e-8)
        assert abs(obj1 - obj2) < 1e-8 * max(1.0, abs(obj1))

        # distributed grid search found the analytic minimum
        gs = np.load(tmp_path / "gs.npy")
        assert abs(gs[0] - 0.3) < 1e-12 and gs[1] == 0.0
        assert abs(gs[2]) < 1e-12

    def test_single_process_grid_search(self):
        prm, val, vals = launch.grid_search(
            lambda p: (p[0] - 2.0) ** 2, (np.arange(5.0),))
        assert prm == (2.0,)
        assert val == 0.0
        assert vals.shape == (5,)
