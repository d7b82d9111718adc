"""Breakdown of the n=6144 exact implicit matvec (VERDICT r4 item 1).

The round-4 roofline put the exact-f64 SchurQ matvec at 176 ms against a
~1 ms HBM bound (0.6% of roofline).  This script measures WHERE those
milliseconds live on the real chip and what the two-float replacements cost:

  * f64 SchurQ.apply (the current exact path; cached program)
  * SchurQEdgeF32.apply (two-float edge path, f64 VT_inv GEMM)
  * the (n-1)^2 VT_inv GEMM alone: f64 at o in {3, 32, 128}, and the
    two-float (hi/lo f32 pair) form at the same widths
  * accuracy of each fast path against the exact f64 apply

Writes assets_work/exact_matvec.json.  Timing discipline per CLAUDE.md:
batch ops per device fetch, median of >= 3.
"""

import json
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from xmtpu.ops.schurq import SchurQ, _split_f32          # noqa: E402
from xmtpu.pipeline.synthetic import make_scene_window   # noqa: E402

_FETCH_S = None


def _fetch_cost():
    global _FETCH_S
    if _FETCH_S is None:
        x = jnp.zeros((1,), jnp.float32)
        jax.device_get(x)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_get(x)
            ts.append(time.perf_counter() - t0)
        _FETCH_S = float(np.median(ts))
        print(f"(fetch latency {_FETCH_S*1e3:.1f} ms)")
    return _FETCH_S


def timeit(fn, *args, reps=10):
    fetch = _fetch_cost()
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append((time.perf_counter() - t0 - fetch) / reps)
    return float(np.median(ts))


def main():
    out = {"backend": jax.default_backend()}
    print(f"backend={jax.default_backend()}", flush=True)
    N, M, K = 6144, 24576, 40
    scene = make_scene_window(N, M, obs_per_camera=K, noise=1e-3, seed=0,
                              long_range=4)
    t0 = time.perf_counter()
    Q = SchurQ.build(scene.weights, scene.edges, scene.landmarks,
                     vt_build="ns")
    jax.device_get(Q.VT_inv[0, 0])
    print(f"build: {time.perf_counter() - t0:.1f} s", flush=True)

    rng = np.random.default_rng(0)
    X3 = jnp.asarray(rng.standard_normal((3 * N, 3)))

    app = jax.jit(lambda q, x: q.apply(x))
    t = timeit(app, Q, X3)
    out["f64_apply_o3_ms"] = t * 1e3
    print(f"f64 apply o=3: {t*1e3:.2f} ms", flush=True)
    ref = app(Q, X3)
    refn = float(jax.device_get(jnp.linalg.norm(ref)))

    # two-float edge path (current SchurQEdgeF32, f64 VT GEMM) w/ pallas seg
    Qe = Q.edge_f32(pallas=True)
    t = timeit(app, Qe, X3)
    out["edge_f32_apply_o3_ms"] = t * 1e3
    err = float(jax.device_get(jnp.linalg.norm(app(Qe, X3) - ref))) / refn
    out["edge_f32_apply_o3_relerr"] = err
    print(f"edge_f32 apply o=3: {t*1e3:.2f} ms  relerr {err:.2e}", flush=True)

    # same but XLA segsum (no pallas) for comparison
    Qe0 = Q.edge_f32(pallas=False)
    t = timeit(app, Qe0, X3)
    out["edge_f32_xla_apply_o3_ms"] = t * 1e3
    print(f"edge_f32 apply (xla seg) o=3: {t*1e3:.2f} ms", flush=True)

    # fully two-float fast-exact operator (round-5 SchurQTF: two-float edge
    # path + two-float VT GEMM + inner-unrolled segsum kernel)
    from xmtpu.ops.schurq import operator_error_estimate

    Qtf = Q.two_float()
    for o in (1, 3):
        Xo = jnp.asarray(rng.standard_normal((3 * N, o)))
        t = timeit(app, Qtf, Xo)
        out[f"tf_apply_o{o}_ms"] = t * 1e3
        r = app(Q, Xo)
        err = float(jax.device_get(
            jnp.linalg.norm(app(Qtf, Xo) - r) / jnp.linalg.norm(r)))
        out[f"tf_apply_o{o}_relerr"] = err
        print(f"SchurQTF apply o={o}: {t*1e3:.2f} ms  relerr {err:.2e}",
              flush=True)
    t0 = time.perf_counter()
    eta = operator_error_estimate(Q, Qtf, iters=5)
    out["tf_eta_estimate"] = eta
    out["tf_eta_estimate_s"] = time.perf_counter() - t0
    print(f"operator_error_estimate: {eta:.3e} "
          f"({out['tf_eta_estimate_s']:.1f} s)", flush=True)

    # ---- VT_inv GEMM alone ------------------------------------------------
    VT = Q.VT_inv
    mm = jax.jit(lambda a, b: jnp.dot(a, b,
                                      precision=jax.lax.Precision.HIGHEST))
    Vh, Vl = _split_f32(VT)
    Vh.block_until_ready()

    @jax.jit
    def mm_tf(vh, vl, y):
        yh, yl = _split_f32(y)
        a = jnp.dot(vh, jnp.concatenate([yh, yl], axis=1),
                    precision=jax.lax.Precision.HIGHEST)
        b = jnp.dot(vl, yh, precision=jax.lax.Precision.HIGHEST)
        o = y.shape[1]
        return (a[:, :o].astype(jnp.float64) + a[:, o:].astype(jnp.float64)
                + b.astype(jnp.float64))

    for o in (3, 32, 128):
        Y = jnp.asarray(rng.standard_normal((VT.shape[1], o)))
        t = timeit(mm, VT, Y)
        out[f"vt_gemm_f64_o{o}_ms"] = t * 1e3
        g_ref = mm(VT, Y)
        gn = float(jax.device_get(jnp.linalg.norm(g_ref)))
        t2 = timeit(mm_tf, Vh, Vl, Y)
        e2 = float(jax.device_get(
            jnp.linalg.norm(mm_tf(Vh, Vl, Y) - g_ref))) / gn
        out[f"vt_gemm_tf_o{o}_ms"] = t2 * 1e3
        out[f"vt_gemm_tf_o{o}_relerr"] = e2
        print(f"VT gemm o={o}: f64 {t*1e3:.2f} ms | two-float {t2*1e3:.2f} "
              f"ms relerr {e2:.2e}", flush=True)

    # ---- edge reductions alone (f64): apply minus the solve -----------------
    @jax.jit
    def edge_only(q, x):
        n = q.n_cameras
        Yb = x.reshape(n, 3, x.shape[-1])
        o1 = jnp.einsum("nab,nbo->nao", q.Q1, Yb)
        b_A, b_B = q._vtpT(Yb)
        return o1.reshape(3 * n, -1), b_A, b_B

    t = timeit(edge_only, Q, X3)
    out["f64_edge_vtpT_ms"] = t * 1e3
    print(f"f64 Q1+vtpT alone: {t*1e3:.2f} ms", flush=True)

    t = timeit(edge_only, Qe, X3)
    out["edge_f32_vtpT_ms"] = t * 1e3
    print(f"edge_f32 Q1+vtpT alone: {t*1e3:.2f} ms", flush=True)

    with open("assets_work/exact_matvec.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote assets_work/exact_matvec.json", flush=True)


if __name__ == "__main__":
    main()
