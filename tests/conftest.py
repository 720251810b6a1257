"""Test configuration: run the suite on CPU with 8 virtual XLA devices
(so sharding paths are exercised without a TPU pod) and with float64
enabled for tight numerical tolerances.

Mirrors the reference's tolerance-based test strategy (SURVEY.md §4);
multi-device coverage is the addition SPORCO lacks.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
