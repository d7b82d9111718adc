"""Scale benchmark: synthetic BAL-1934-class problem, dense vs SchurQ,
precision ladder.  Not run by the driver (bench.py is the one-line headline);
use interactively:

    python benchmarks/scale_bench.py [n_cameras] [tol]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_cam = int(sys.argv[1]) if len(sys.argv) > 1 else 1934
    tol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-1

    import jax
    import jax.numpy as jnp

    import xmtpu  # noqa: F401  (x64 + cache config)
    from xmtpu.assembly.creatematrix import create_matrix_arrays
    from xmtpu.ops import manifold as mf
    from xmtpu.ops.schurq import SchurQ
    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.solver import trust_region as tr

    print(f"devices: {jax.devices()}")
    t0 = time.time()
    scene = make_scene(n_cameras=n_cam, n_points=max(2000, 4 * n_cam),
                       obs_per_camera=60, noise=1e-3, seed=0)
    print(f"scene E={len(scene.edges)} ({time.time()-t0:.1f}s)")

    t0 = time.time()
    Q = SchurQ.build(scene.weights, scene.edges, scene.landmarks)
    jax.device_get(Q.VT_inv[0, 0])
    print(f"SchurQ build {time.time()-t0:.1f}s")

    n = Q.n_cameras
    R0 = mf.identity_frames(n, 3)
    s0 = jnp.ones((n,))
    cfg = tr.TRConfig(chunk=50)

    t0 = time.time()
    C, _ = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    C = jnp.asarray(C)
    jax.device_get(C[0, 0])
    print(f"dense assembly {time.time()-t0:.1f}s ({C.nbytes/1e9:.2f} GB)")

    from xmtpu.ops.qop import cast_qop

    cfg_i32 = tr.TRConfig(chunk=50, inner_f32=True)
    Qm = Q.edge_f32(pallas=False)     # XLA-scatter mixed-edge baseline
    Qp = Q.edge_f32(pallas=True)      # Pallas sorted-segment-sum edge path
    Q32 = cast_qop(Q, jnp.float32)

    for name, solve in [
        ("dense_f64", lambda: tr.trust_region_solve(C, R0, s0, 0.0, tol, cfg=cfg)),
        ("schurq_f64", lambda: tr.trust_region_solve(Q, R0, s0, 0.0, tol, cfg=cfg)),
        ("schurq_inner32", lambda: tr.trust_region_solve(
            Q, R0, s0, 0.0, tol, cfg=cfg_i32)),
        ("schurq_edge32", lambda: tr.trust_region_solve(
            Qm, R0, s0, 0.0, tol, cfg=cfg_i32, Q32=Q32)),
        ("schurq_edge32_pallas", lambda: tr.trust_region_solve(
            Qp, R0, s0, 0.0, tol, cfg=cfg_i32, Q32=Q32)),
        ("schurq_mixed", lambda: tr.trust_region_solve_mixed(Q, R0, s0, 0.0, tol, cfg=cfg)),
    ]:
        res = solve()
        jax.device_get(res.primal)           # compile + first run
        t0 = time.time()
        res = solve()
        p, g, ko, ki = jax.device_get((res.primal, res.gradnorm,
                                       res.outer_iters, res.total_inner))
        print(f"{name}: {time.time()-t0:.2f}s warm  outer={ko} inner={ki} "
              f"primal={p:.4e} gradnorm={g:.2e}")


if __name__ == "__main__":
    main()
