"""Benchmark: certified SIMPLE1 solve wall-clock (warm) on the local device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference repo commits no quantitative numbers (BASELINE.md); the
recorded baseline below is this framework's round-1 measurement on a single
TPU chip so later rounds report progress against it (vs_baseline > 1 means
faster than round 1).
"""

import json
import os
import sys
import time

# Round-1 recorded wall-clock for the full certified SIMPLE1 staircase solve
# (rank-3 TR + exact-dual certificate, warm), single TPU v5 chip.
BASELINE_MS = 1030.0


def main():
    import numpy as np

    import xmtpu
    from xmtpu.io.bin_format import load_matrix_from_bin
    from xmtpu.solver.staircase import solve_arrays

    qpath = "/root/reference/assets/SIMPLE1/Q.bin"
    if not os.path.exists(qpath):
        print(json.dumps({"metric": "simple1_certified_solve", "value": -1,
                          "unit": "ms", "vs_baseline": 0.0}))
        return

    import jax.numpy as jnp

    Q, _ = load_matrix_from_bin(qpath)
    Q = jnp.asarray(Q)  # device residency up front; solves reuse the buffer

    # Production fast path: mixed ladder (f32 bulk, f64 polish) with f32 tCG
    # Hessian applies in the polish; the certificate always runs in f64, so
    # acceptance (and the certified optimum asserted below) is identical to
    # the pure-f64 reference semantics. See docs/PERFORMANCE.md.
    kw = dict(max_rank=3, tol=1e-16, lam=0.0, max_time=1000, verbose=False,
              precision="mixed", inner_f32=True)

    # warmup (compile; persistent cache makes this fast on reruns)
    res = solve_arrays(Q, **kw)
    if not res.certified:
        # BM rank-3 basin safety net: fall back to the reference-parity f64
        # path (slower but certification is deterministic there)
        kw = dict(max_rank=3, tol=1e-16, lam=0.0, max_time=1000,
                  verbose=False)
        res = solve_arrays(Q, **kw)
    assert res.certified, "SIMPLE1 must certify at rank 3"

    # median of 5: the remote tunnel's dispatch latency fluctuates run to
    # run (observed 189-272 ms for the identical program on 3-run medians)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = solve_arrays(Q, **kw)
        times.append((time.perf_counter() - t0) * 1e3)
    assert res.certified, "SIMPLE1 must certify at rank 3"
    value = float(np.median(times))

    print(json.dumps({
        "metric": "simple1_certified_solve",
        "value": round(value, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / value, 3),
    }))


if __name__ == "__main__":
    main()
