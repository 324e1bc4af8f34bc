#!/usr/bin/env python
"""spark-submit-able alias of the repo-root benchmark harness
(BASELINE.md §3 refers to `jobs/bench.py`; the driver runs the root
`bench.py` — both are the same code)."""

import os
import runpy
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
# propagate to forked Python UDF workers (they see PYTHONPATH, not the
# driver's sys.path; --py-files plays this role on a real cluster)
os.environ["PYTHONPATH"] = _ROOT + (
    os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH") else ""
)

runpy.run_path(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench.py"),
    run_name="__main__",
)
