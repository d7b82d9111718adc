"""End-to-end XM^2 pipeline benchmark: clean -> assemble -> certified
staircase solve -> residual cut -> rank-3 probe + adaptive lambda ->
re-solve, on a synthetic BAL-class scene (the reference's
3_test_colmap_glomap.py flow from the view-graph onward).

    python benchmarks/xm2_bench.py [n_cameras] [precision] [--dense]

Round-5 methodology (VERDICT r4 item 2):
  * a device warm-up roundtrip runs BEFORE any timing so "assembly" is
    assembly, not first-device-use overhead;
  * one compile pass, then the e2e wall and every pipeline phase are
    medians of 3 warm runs (single-shot timings fluctuate 2-4x with tunnel
    dispatch jitter — CLAUDE.md rule 14);
  * the implicit round-5 solver path (SchurQTF two-float stages, f32 inner
    applies, exact-anchored fast certificate) is the default at the n=1934
    flagship size; --dense keeps choose_implicit's dense-C arm.

First run on a fresh problem size pays multi-minute remote compiles (one
per program shape); the persistent cache makes repeats warm.  Prints a
phase table and one JSON line; see benchmarks/README.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_cam = int(pos[0]) if pos else 1934
    precision = pos[1] if len(pos) > 1 else "mixed"
    implicit = False if "--dense" in sys.argv else True

    import xmtpu  # noqa: F401  (x64 + cache config)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.pipeline.xm2 import xm2_solve
    from xmtpu.utils.timer import PhaseTimer

    scene = make_scene(n_cameras=n_cam, n_points=max(2000, 4 * n_cam),
                       obs_per_camera=60, noise=1e-3, seed=0)
    print(f"scene N={scene.N} M={scene.M} E={len(scene.edges)} "
          f"implicit={implicit} precision={precision}", flush=True)

    # first-device-use (runtime init, allocator, transfer setup) OUT of the
    # phase timers
    t0 = time.perf_counter()
    jax.device_get(jnp.zeros((256, 256)) @ jnp.zeros((256, 256)))
    t_dev = time.perf_counter() - t0
    print(f"device first-use: {t_dev:.2f} s (excluded from all phases)",
          flush=True)

    def run(timer=None, verbose=False):
        return xm2_solve(scene.edges.copy(), scene.weights.copy(),
                         scene.landmarks.copy(), scene.rgbs.copy(),
                         scene.N, scene.M, max_rank=5, tol=1e-1,
                         verbose=verbose, precision=precision,
                         implicit=implicit, timer=timer)

    t0 = time.perf_counter()
    out = run(verbose=True)
    print(f"compile pass: {time.perf_counter() - t0:.1f} s", flush=True)

    walls, timers = [], []
    for i in range(3):
        tm = PhaseTimer()
        t0 = time.perf_counter()
        out = run(timer=tm)
        walls.append(time.perf_counter() - t0)
        timers.append(tm)
        print(f"warm run {i}: {walls[-1]:.2f} s", flush=True)

    phases = sorted({k for tm in timers for k in tm.totals})
    med = {k: float(np.median([tm.totals.get(k, 0.0) for tm in timers]))
           for k in phases}
    print(f"\n{'phase':>22} {'median_s':>9}")
    for k in phases:
        print(f"{k:>22} {med[k]:>9.2f}")
    wall = float(np.median(walls))
    print(f"{'TOTAL e2e':>22} {wall:>9.2f}")
    print(json.dumps({
        "metric": "xm2_end_to_end", "n": n_cam, "unit": "s",
        "value": round(wall, 2), "precision": precision,
        "implicit": implicit, "device_first_use_s": round(t_dev, 2),
        "phases": {k: round(v, 3) for k, v in med.items()},
        "runs": [round(w, 2) for w in walls],
    }))


if __name__ == "__main__":
    main()
