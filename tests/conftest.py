"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that every multi-chip sharding
path (data-parallel psum allreduce, window-axis sharding) is exercised without
TPU hardware — the standard JAX trick via
``--xla_force_host_platform_device_count`` (see SURVEY.md §4e).

Must run before the first ``import jax`` anywhere in the test process.
"""

import os
import sys

# Force CPU even when the ambient environment selects a TPU platform
# (e.g. JAX_PLATFORMS=axon): the suite needs 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
