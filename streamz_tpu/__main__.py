"""``python -m streamz_tpu`` — the StreamZ CLI entry point."""

import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS"):
    # Honor the env var even when a site hook pre-imported jax before it
    # could take effect (see tests/conftest.py).
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from streamz_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
