"""Saddle-escape staircase at scale (VERDICT r2 item 4).

The reference's signature loop — uncertified rank -> certificate escape
direction -> Armijo linesearch -> higher-rank TR stage -> re-certification
(XM_main.cu:223-277 + trustregion.h:360-408) — measured end to end on a
problem whose rank-3 solution is GENUINELY uncertifiable: moderate
observation noise + sparse visibility creates spurious rank-3 local minima
while the SDP stays tight at a higher rank (found by grid search; see
tests/test_scale.py::test_saddle_escape_staircase_certifies_rank4 for the
CI-size pin).

    python benchmarks/staircase_bench.py [n_cameras] [noise]

Prints a per-rank table (stage wall, certificate wall, iterations, verdict)
from ``SolveResult.stages`` and a one-line JSON summary.  Default n=1024:
rank 3 refuted -> rank 4 refuted -> rank 5 certified (exact-f64 stages; the
mixed-edge operator's noise floor sits above the stationarity these
borderline certificates need).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_cam = int(pos[0]) if pos else 1024
    noise = float(pos[1]) if len(pos) > 1 else 0.2

    if os.environ.get("XMTPU_FORCE_CPU") == "1" or "--cpu" in sys.argv:
        # structure probes off the tunnel (the axon sitecustomize force-sets
        # the TPU platform; CLAUDE.md rule 0)
        import jax

        jax.config.update("jax_platforms", "cpu")

    import xmtpu  # noqa: F401  (x64 + cache config)
    from xmtpu.ops.schurq import SchurQ
    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.solver.staircase import solve_arrays

    scene = make_scene(n_cameras=n_cam, n_points=max(400, 3400 * n_cam // 1024),
                       obs_per_camera=10, noise=noise, seed=1)
    print(f"scene N={scene.N} M={scene.M} E={len(scene.edges)} noise={noise}",
          flush=True)
    Q = SchurQ.build(scene.weights, scene.edges, scene.landmarks)

    import jax

    # exact-f64 implicit stages run heavy tCG loops: on the remote TPU a
    # 100-outer device program exceeds the worker's runtime limit (observed:
    # crash in the rank-5 stage) — bound programs to ~10 outers there
    chunk = 10 if jax.default_backend() != "cpu" else None
    # --inner-f32 (the chip configuration): f32 tCG Hessian applies with
    # exact-f64 outer iterations — the stages drive gradnorm to ~1e-6,
    # which the borderline certificates here need, while the ~10x-cheaper
    # f32 applies carry the ~20x-larger inner-iteration count.  The
    # certificate rides the fast two-float matvecs automatically on a
    # single TPU device (solve_arrays certify fast="auto").
    inner_f32 = "--inner-f32" in sys.argv
    t0 = time.perf_counter()
    res = solve_arrays(Q, max_rank=6, tol=1e-6, lam=0.0, verbose=True,
                       chunk=chunk, inner_f32=inner_f32)
    wall = time.perf_counter() - t0

    print(f"\n{'rank':>4} {'stage_s':>8} {'cert_s':>8} {'outer':>6} "
          f"{'inner':>6} {'verdict':>9}")
    for st in res.stages:
        print(f"{st['rank']:>4} {st['stage_s']:>8.2f} {st['cert_s']:>8.2f} "
              f"{st['outer']:>6} {st['inner']:>6} "
              f"{'CERTIFIED' if st.get('certified') else 'refuted':>9}")
    print(json.dumps({
        "metric": "staircase_escape", "n": n_cam, "noise": noise,
        "unit": "s", "value": round(wall, 2), "rank": res.rank,
        "certified": bool(res.certified), "primal": res.primal,
        "stages": [{k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in st.items()} for st in res.stages],
    }))


if __name__ == "__main__":
    main()
