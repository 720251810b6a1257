"""Multi-device parallelism: mesh construction, the sharded consensus
dictionary learning (the distributed north-star path), and vmapped
hyperparameter grid search."""

from sporco_tpu.parallel import mesh  # noqa: F401
from sporco_tpu.parallel import consensus  # noqa: F401
from sporco_tpu.parallel import gridsearch  # noqa: F401
