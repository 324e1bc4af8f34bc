#!/usr/bin/env python
"""spark-submit-able alias of the repo-root benchmark harness
(BASELINE.md §3 refers to `jobs/bench.py`; the driver runs the root
`bench.py` — both are the same code)."""

import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

runpy.run_path(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench.py"),
    run_name="__main__",
)
