"""CLI entry point: etraining equivalent.

Usage: python -m augustus_tpu.cli.etraining trainset.gb --species=X \
           [--AUGUSTUS_CONFIG_PATH=DIR] [--key=value ...]
"""

import sys

from ..training.etraining import main

if __name__ == "__main__":
    sys.exit(main())
