#!/usr/bin/env python
"""Repo-checkout shim — the implementation lives in pillarnext_tpu.cli.train
(installed as the ``pnx-train`` console script)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pillarnext_tpu.cli.train import main  # noqa: E402

if __name__ == "__main__":
    main()
