"""Single-chip n=6144 implicit certified solve — the beyond-dense-memory
operating point (VERDICT r1 item 1 deliverable; dense C at this size is
6144*3 squared f64 = 2.7 GB + assembly transients, past the 4 GB
choose_implicit budget).

Measures on the real TPU:
  * SchurQ build wall (the mixed-precision 'ns' VT_inv ladder vs the
    emulated-f64 'chol' route that was the round-1 build wall);
  * rank-3 TR solve on the two-float mixed-edge operator (tol 1e-1, the
    reference's BAL operating point), block-Jacobi + inner_f32;
  * the matvec-only certificate (deflated bound + CG shift probe) on the
    exact f64 operator.

Shapes are fixed so the persistent compile cache makes reruns cheap.
Usage: python benchmarks/n6k_bench.py [--chol-too] [--no-pallas] [--plain-f64]

``--no-pallas`` routes the mixed operator's f32 segment reductions through
XLA sorted scatter instead of the Pallas kernel — the r2 sessions saw the
n=6144 TR program compile for >45 min on the remote compiler with the
Pallas path; the scatter variant is the fallback to get a first number.

``--plain-f64`` drops the mixed-edge operator AND the f32 inner Hessian:
the TR program then contains ONE plain f64 operator — the smallest
program variant (observed: the two-float + dual-operator program at this
size compiles for hours on the remote compiler without completing; the
r2 Pallas variant did the same).  Slower per iteration, but tol 1e-1
needs only tens of outers — the first hardware number beats no number.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from xmtpu.ops import manifold as mf                     # noqa: E402
from xmtpu.ops.schurq import SchurQ                      # noqa: E402
from xmtpu.ops.qop import cast_qop                       # noqa: E402
from xmtpu.pipeline.synthetic import make_scene_window   # noqa: E402
from xmtpu.solver import trust_region as tr              # noqa: E402
from xmtpu.solver.certificate import certify             # noqa: E402

N, M, K = 6144, 24576, 40


def main():
    print(f"backend={jax.default_backend()}  n={N} m={M} obs/cam={K}")
    scene = make_scene_window(N, M, obs_per_camera=K, noise=1e-3, seed=0)

    t0 = time.perf_counter()
    Q = SchurQ.build(scene.weights, scene.edges, scene.landmarks,
                     vt_build="ns")
    jax.device_get(Q.VT_inv[0, 0])
    t_ns = time.perf_counter() - t0
    print(f"build (ns ladder):   {t_ns:8.2f} s")

    if "--chol-too" in sys.argv:
        t0 = time.perf_counter()
        Qc = SchurQ.build(scene.weights, scene.edges, scene.landmarks,
                          vt_build="chol")
        jax.device_get(Qc.VT_inv[0, 0])
        print(f"build (f64 chol):    {time.perf_counter() - t0:8.2f} s")
        err = float(jnp.max(jnp.abs(Q.VT_inv - Qc.VT_inv))
                    / jnp.max(jnp.abs(Qc.VT_inv)))
        print(f"  ns-vs-chol rel err: {err:.2e}")

    plain = "--plain-f64" in sys.argv
    if plain:
        Q32, Qmix = None, Q
    else:
        Q32 = cast_qop(Q, jnp.float32)
        Qmix = Q.edge_f32(pallas=False if "--no-pallas" in sys.argv else None)
    R0 = mf.identity_frames(N, 3)
    s0 = jnp.ones((N,), jnp.float64)
    # Program-length sizing (CLAUDE rules 3/9): the remote worker kills
    # long-running programs.  Mixed path: 5 outers/program.  Plain f64 is
    # driven ONE OUTER PER PROGRAM below (kmax is traced, so the stepping
    # reuses the one cached executable; measured ~1.2-2.0 s/outer at ~5
    # tCG inner per outer — a 5-outer chunk is already tens of seconds and
    # a churny outer at max_inner=1000 alone would exceed the worker
    # budget).  The cfg itself stays at the defaults so the program hash
    # matches the round-3 cached compile (~30 min to rebuild otherwise).
    cfg = tr.TRConfig(chunk=5, inner_f32=not plain)

    if plain:
        lam = jnp.asarray(0.0, jnp.float64)
        gradtol = jnp.asarray(1e-1, jnp.float64)
        delta_bar = jnp.asarray(float(np.sqrt(N * 3 + N - 1)), jnp.float64)
        st = tr._init_state(Q, R0, s0, lam, delta_bar, cfg)
        jax.device_get(st.loss)          # compile wall lives here
        t0 = time.perf_counter()
        k = 0
        while k < 2000:
            st = tr._run_chunk(Q, st, lam, gradtol, delta_bar, cfg,
                               jnp.asarray(k + 1, jnp.int32))
            k_, done = jax.device_get((st.k, st.done))
            k = int(k_)
            if bool(done):
                break
        t_solve = time.perf_counter() - t0
        res = tr.TRResult(st.R, st.s_ex, st.loss, st.gradnorm, st.k,
                          st.total_inner, st.done_reason)
        print(f"TR solve (plain f64, tol 1e-1): {t_solve:6.2f} s  "
              f"({int(res.outer_iters)} outer / {int(res.total_inner)} "
              f"inner, primal {float(res.primal):.4e})")
    else:
        def run():
            return tr.trust_region_solve(Qmix, R0, s0, 0.0, 1e-1, cfg=cfg,
                                         Q32=Q32)

        res = run()
        jax.device_get(res.primal)           # compile + cold run
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = run()
            jax.device_get(res.primal)
            times.append(time.perf_counter() - t0)
        t_solve = float(np.median(times))
        print(f"TR solve (edge_f32, tol 1e-1): {t_solve:6.2f} s  "
              f"({int(res.outer_iters)} outer / {int(res.total_inner)} "
              f"inner, primal {float(res.primal):.4e})")

    sR = mf.flatten(mf.scale_blocks(res.R, res.s_ex))
    cert = certify(Q, sR, 0.0, res.primal)       # compile
    t0 = time.perf_counter()
    cert = certify(Q, sR, 0.0, res.primal)
    ok = bool(jax.device_get(cert.certified))
    t_cert = time.perf_counter() - t0
    print(f"implicit certificate: {t_cert:6.2f} s  certified={ok} "
          f"lam_min={float(cert.lam_min):.3e} gap={float(cert.gap):.3e}")


if __name__ == "__main__":
    main()
