"""Test configuration: run the suite on CPU with 8 virtual XLA devices
(so sharding paths are exercised without a TPU pod) and with float64
enabled for tight numerical tolerances.

Mirrors the reference's tolerance-based test strategy (SURVEY.md §4);
multi-device coverage is the addition SPORCO lacks.

Set ``SPORCO_TPU_TESTS=1`` to keep the real accelerator backend
instead (for ``tests/test_tpu_smoke.py`` -- the on-hardware validation
pass; it is skipped on CPU).
"""

import os

_ON_TPU = os.environ.get("SPORCO_TPU_TESTS") == "1"

if not _ON_TPU:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
