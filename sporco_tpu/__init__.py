"""sporco_tpu: a TPU-native sparse-optimization framework.

A ground-up JAX/XLA re-design of the capability surface of SPORCO
(sparse coding, convolutional sparse coding, dictionary learning, total
variation, robust PCA, l1-splines, plug-and-play priors) built for TPU
hardware:

- all per-iteration hot loops (batched real FFTs, DFT-domain
  Sherman-Morrison diagonal-block solves, proximal operators) run fully
  on-device inside jit-compiled ``lax.while_loop``s with on-device
  convergence tests and adaptive penalty (rho) logic;
- dictionary learning shards the training-signal axis across a
  ``jax.sharding.Mesh`` with XLA collectives over ICI;
- solver state is a serialisable pytree (checkpoint/warm-start parity
  with the reference's pickle/re-entrant ``solve()`` semantics).

The package layout:

- :mod:`sporco_tpu.ops`     -- FFT, prox, and linear-algebra kernels.
- :mod:`sporco_tpu.solvers` -- generic ADMM and PGM (FISTA) loop drivers.
- :mod:`sporco_tpu.models`  -- problem classes (BPDN, ConvBPDN, TV, RPCA,
  CMOD/CCMOD, dictionary learning, PPP, ...).
- :mod:`sporco_tpu.parallel`-- mesh construction, sharded consensus
  dictionary learning, vmapped grid search.
- :mod:`sporco_tpu.utils`   -- array/signal/image utilities and metrics.
"""

__version__ = "0.1.0"

from sporco_tpu import ops  # noqa: F401
