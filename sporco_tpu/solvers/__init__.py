"""Generic solver loop drivers: ADMM and PGM (FISTA), implemented as
jit-compiled ``lax.while_loop``s with fully on-device convergence tests,
residuals, and adaptive penalty logic."""

from sporco_tpu.solvers import admm  # noqa: F401
from sporco_tpu.solvers import pgm  # noqa: F401
