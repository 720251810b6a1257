"""Support utilities: array manipulation, signal processing, image
metrics, timers, example data, grid search, plotting."""

from sporco_tpu.utils import array  # noqa: F401
from sporco_tpu.utils import signal  # noqa: F401
from sporco_tpu.utils import metric  # noqa: F401
