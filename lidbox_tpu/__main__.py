"""
``python -m lidbox_tpu`` entry point (reference: lidbox/__main__.py —
whose import of the removed lidbox.cli module made it a dead entry point;
this one works, see lidbox_tpu/cli.py).
"""
import sys

from lidbox_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
