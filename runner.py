#!/usr/bin/env python3
"""Repo-root entry point: ``python runner.py [command] [flags]``.

Thin wrapper over :mod:`inspig_etl_spark.runner` (SURVEY.md §7.1), matching
the reference's ``python run_etl.py`` invocation shape.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from inspig_etl_spark.runner import main

if __name__ == "__main__":
    raise SystemExit(main())
