"""Example 1: solver-only on a prebuilt Q matrix (reference 1_test_solve.py).

Reads ``Q.bin`` from the SIMPLE1 fixture, runs the certified rank-staircase
solve, writes ``R.bin``/``s.bin`` back.
"""

import sys

import xmtpu

dataset_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/assets/SIMPLE1"

result = xmtpu.solve(dataset_path, max_rank=3, tol=1e-16, lam=0.0, max_time=1000)
print(f"status={result.status} certified={result.certified} "
      f"rank={result.rank} primal={result.primal:.10f} gap={result.gap:.3e}")
