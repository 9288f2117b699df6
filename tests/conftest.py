"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that every multi-chip sharding
path (data-parallel psum allreduce, window-axis sharding) is exercised without
TPU hardware — the standard JAX trick via
``--xla_force_host_platform_device_count`` (see SURVEY.md §4e).

Note: this environment pre-imports jax at interpreter startup (site hook for
the TPU tunnel), so plain env vars are too late — the platform is switched
through ``jax.config`` before the backend initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
