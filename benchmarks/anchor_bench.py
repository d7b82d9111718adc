"""Reference-anchored CPU-vs-TPU comparison at matched basins (VERDICT r2
weak-6: the bench's vs_baseline numbers are self-referential; this is the
hardware-anchored point).

Runs the SAME problem (the n=1934 dense testbed), SAME init (identity
frames), SAME algorithm configuration (f64 dense C, block-Jacobi tCG,
tol 1e-1 then 1e-3 polish) on one backend per invocation and prints a JSON
line.  Comparing runs is legitimate only when both certify the same
optimum — the script records primal/gap so the doc can assert the basins
match (CLAUDE.md semantics rules: never compare wall-clock across basins).

    python benchmarks/anchor_bench.py cpu
    python benchmarks/anchor_bench.py tpu
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import xmtpu  # noqa: F401
    import jax.numpy as jnp
    import numpy as np

    from xmtpu.assembly.creatematrix import create_matrix_arrays
    from xmtpu.ops import manifold as mf
    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.solver import trust_region as tr
    from xmtpu.solver.certificate import certify

    n_cam = 1934
    scene = make_scene(n_cameras=n_cam, n_points=max(2000, 4 * n_cam),
                       obs_per_camera=60, noise=1e-3, seed=0)
    C, _ = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    C = jnp.asarray(C, jnp.float64)
    R0 = mf.identity_frames(n_cam, 3)
    s0 = jnp.ones((n_cam,), jnp.float64)
    cfg = tr.TRConfig(chunk=50)

    def solve():
        res = tr.trust_region_solve(C, R0, s0, 0.0, 1e-1, cfg=cfg)
        res = tr.trust_region_solve(C, res.R, res.s_ex, 0.0, 1e-3, cfg=cfg)
        jax.device_get(res.primal)
        return res

    res = solve()                     # warm-up / compile
    t0 = time.perf_counter()
    res = solve()
    wall = time.perf_counter() - t0
    sR = mf.flatten(mf.scale_blocks(res.R, res.s_ex))
    t0 = time.perf_counter()
    cert = certify(C, sR, 0.0, res.primal)
    cert_ok = bool(jax.device_get(cert.certified))
    cert_s = time.perf_counter() - t0
    print(json.dumps({
        "metric": "anchor_dense_f64_n1934", "backend": jax.default_backend(),
        "unit": "s", "solve_s": round(wall, 2), "cert_s": round(cert_s, 2),
        "outer": int(res.outer_iters), "inner": int(res.total_inner),
        "primal": float(res.primal), "certified": cert_ok,
        "gap": float(cert.gap),
    }))


if __name__ == "__main__":
    main()
