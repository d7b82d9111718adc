"""Fine-grained breakdown of the two-float implicit matvec at n=6144.

Round-5 finding: batching the Pallas segsum grid 16x did NOT move the
edge-path time (47.5 ms), so the cost is elsewhere.  This times every piece
of the SchurQTF apply separately to find it.

Writes assets_work/edge_breakdown.json.
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

_FETCH = None


def timeit(fn, *args, reps=20):
    global _FETCH
    if _FETCH is None:
        x = jnp.zeros((1,), jnp.float32)
        jax.device_get(x)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_get(x)
            ts.append(time.perf_counter() - t0)
        _FETCH = float(np.median(ts))
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append((time.perf_counter() - t0 - _FETCH) / reps)
    return float(np.median(ts))


def main():
    out = {}
    N, M, K = 6144, 24576, 40
    scene = make_scene_window(N, M, obs_per_camera=K, noise=1e-3, seed=0,
                              long_range=4)
    Q = SchurQ.build(scene.weights, scene.edges, scene.landmarks,
                     vt_build="ns")
    jax.device_get(Q.VT_inv[0, 0])
    Qtf = Q.two_float()
    E = Q.f_l.shape[0]
    o = 3
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((3 * N, o)))
    print(f"E={E} bands l={Qtf.band_l} f={Qtf.band_f}", flush=True)

    def rec(name, fn, *args):
        t = timeit(fn, *args)
        out[name] = t * 1e3
        print(f"{name}: {t*1e3:.2f} ms", flush=True)
        return t

    rec("tf_apply", jax.jit(lambda q, x: q.apply(x)), Qtf, X)
    rec("tf_vtpT", jax.jit(lambda q, x: q._vtpT(
        x.reshape(q.n_cameras, 3, -1))), Qtf, X)
    rec("tf_q1_einsum_f64", jax.jit(lambda q, x: jnp.einsum(
        "nab,nbo->nao", q.Q1, x.reshape(q.n_cameras, 3, -1))), Qtf, X)
    rec("split_Yb_f64", jax.jit(lambda x: _split_f32(x)), X)

    # pieces of _vtpT
    Yb = X.reshape(N, 3, o)
    Yh, Yl = _split_f32(Yb)
    Yh.block_until_ready()
    rec("gather_f32", jax.jit(lambda q, yh: yh[q.f_l]), Qtf, Yh)

    @jax.jit
    def prods(q, yh, yl):
        gh, gl = yh[q.f_l], yl[q.f_l]
        th = jnp.einsum("ea,eao->eo", q.wxh_l, gh)
        tl = (jnp.einsum("ea,eao->eo", q.wxh_l, gl)
              + jnp.einsum("ea,eao->eo", q.wxl_l, gh))
        return th, tl

    rec("gather_plus_prods_f32", prods, Qtf, Yh, Yl)
    th, tl = prods(Qtf, Yh, Yl)
    th.block_until_ready()

    @jax.jit
    def seg2_l(q, th, tl):
        return q._seg2(th, tl, q.l_l, q.n_landmarks, q.band_l)

    rec("seg2_landmark", seg2_l, Qtf, th, tl)

    @jax.jit
    def seg2_l_xla(q, th, tl):
        return q._seg2(th, tl, q.l_l, q.n_landmarks, 0)

    rec("seg2_landmark_xla", seg2_l_xla, Qtf, th, tl)

    b_A, b_B = Qtf._vtpT(Yb)
    b_A.block_until_ready()
    rec("solve_M", jax.jit(lambda q, a, b: q.solve_M(a, b)), Qtf, b_A, b_B)
    rec("v3f", jax.jit(lambda q, b: q._v3f(b)), Qtf, b_B)
    z_A, z_B = Qtf.solve_M(b_A, b_B)
    z_A.block_until_ready()
    rec("v3fT", jax.jit(lambda q, a: q._v3fT(a)), Qtf, z_A)
    rec("vtp", jax.jit(lambda q, a, b: q._vtp(a, b)), Qtf, z_A, z_B)

    from xmtpu.ops.qop import tf_gemm
    rec("tf_gemm", jax.jit(tf_gemm), Qtf.vth, Qtf.vtl,
        jnp.asarray(rng.standard_normal((N - 1, o))))

    with open("assets_work/edge_breakdown.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote assets_work/edge_breakdown.json", flush=True)


if __name__ == "__main__":
    main()
