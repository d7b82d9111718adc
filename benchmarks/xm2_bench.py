"""End-to-end XM^2 pipeline benchmark: clean -> assemble -> certified
staircase solve -> residual cut -> rank-3 probe + adaptive lambda ->
re-solve, on a synthetic BAL-class scene (the reference's
3_test_colmap_glomap.py flow from the view-graph onward).

    python benchmarks/xm2_bench.py [n_cameras] [precision]

First run on a fresh problem size pays multi-minute remote compiles (one
per program shape); the persistent cache makes repeats warm.  See
benchmarks/README.md for the platform measurement rules.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_cam = int(sys.argv[1]) if len(sys.argv) > 1 else 1934
    precision = sys.argv[2] if len(sys.argv) > 2 else "mixed"

    import xmtpu  # noqa: F401  (x64 + cache config)
    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.pipeline.xm2 import xm2_solve

    scene = make_scene(n_cameras=n_cam, n_points=max(2000, 4 * n_cam),
                       obs_per_camera=60, noise=1e-3, seed=0)
    print(f"scene N={scene.N} M={scene.M} E={len(scene.edges)}", flush=True)

    t0 = time.time()
    out = xm2_solve(scene.edges.copy(), scene.weights.copy(),
                    scene.landmarks.copy(), scene.rgbs.copy(),
                    scene.N, scene.M, max_rank=5, tol=1e-1,
                    verbose=True, precision=precision)
    dt = time.time() - t0
    print(f"xm2 end-to-end ({precision}): {dt:.1f}s  "
          f"N={out.s_real.shape[0]} M={out.p_est.shape[1]} "
          f"lam2={out.lam:.3f}", flush=True)


if __name__ == "__main__":
    main()
