"""``python -m streamz_tpu`` — the StreamZ CLI entry point."""

import sys

from streamz_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
