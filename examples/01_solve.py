"""Example 1: solver-only on a prebuilt Q matrix (reference 1_test_solve.py).

Reads ``Q.bin`` from the SIMPLE1 fixture, runs the certified rank-staircase
solve, writes ``R.bin``/``s.bin`` next to it.  With no argument the fixture
is staged into a local working directory first (the reference assets mount
is read-only).
"""

# run directly from anywhere: the repo root is not on sys.path when the
# script dir is examples/ (python examples/01_....py)
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import shutil
import sys

import xmtpu

if len(sys.argv) > 1:
    dataset_path = sys.argv[1]
else:
    dataset_path = os.path.join("assets_work", "SIMPLE1")
    os.makedirs(dataset_path, exist_ok=True)
    shutil.copy("/root/reference/assets/SIMPLE1/Q.bin", dataset_path)

result = xmtpu.solve(dataset_path, max_rank=3, tol=1e-16, lam=0.0, max_time=1000)
print(f"status={result.status} certified={result.certified} "
      f"rank={result.rank} primal={result.primal:.10f} gap={result.gap:.3e}")
