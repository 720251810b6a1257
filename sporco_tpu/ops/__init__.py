"""Numerical kernels: FFT substrate, proximal operators, linear algebra.

These are the jittable building blocks every solver is assembled from
(capability parity with the reference's ``sporco/fft.py``,
``sporco/prox/`` and ``sporco/linalg.py`` layers).
"""

from sporco_tpu.ops import fft  # noqa: F401
from sporco_tpu.ops import prox  # noqa: F401
from sporco_tpu.ops import linalg  # noqa: F401
