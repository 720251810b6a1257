"""Child process for the multi-controller launch test: one of two
cooperating JAX processes (2 CPU devices each -> a 4-device global
mesh).  Run as::

    python _launch_child.py <rank> <port> <outdir>

Computes 10 consensus-CDL iterations with the signal batch split
per-process, plus a distributed grid search, and (rank 0) saves the
results for the parent test to compare against a single-process run.
"""

import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from sporco_tpu.parallel import launch  # noqa: E402

launch.initialize(coordinator_address=f"localhost:{port}",
                  num_processes=2, process_id=rank)
assert jax.device_count() == 4, jax.device_count()
mesh = launch.global_mesh()
assert mesh.shape["data"] == 4

# same data in every process (seeded); each passes only its K chunk
rng = np.random.default_rng(12345)
N, Nd, M, K = 16, 5, 8, 8
D0 = rng.standard_normal((Nd, Nd, M))
S = rng.standard_normal((N, N, K))
S_local = S[..., rank * (K // 2):(rank + 1) * (K // 2)]

d = launch.consensus_cdl(D0, S_local, lmbda=0.05, mesh=mesh,
                         max_iter=10, dtype=jnp.float64)
assert d.cri.K == K
D = np.asarray(d.solve())
obj = d.evaluate()[0]

# distributed grid search (mpiutil.grid_search capability)
prm, val, vals = launch.grid_search(
    lambda p: (p[0] - 0.3) ** 2 + abs(p[1]),
    (np.linspace(0, 1, 11), np.array([-1.0, 0.0, 2.0])))

if rank == 0:
    np.save(os.path.join(outdir, "D_multi.npy"), D)
    np.save(os.path.join(outdir, "obj_multi.npy"), np.array([obj]))
    np.save(os.path.join(outdir, "gs.npy"),
            np.array([prm[0], prm[1], val]))
print(f"rank {rank} OK", flush=True)
