"""Roofline / MFU accounting for the solver's hot ops (VERDICT r3 item 3).

Measures on the real chip:
  * f32 MXU peak (large square GEMM, the best-case ceiling);
  * emulated-f64 effective peak (same GEMM in f64 — the two-float software
    emulation's ceiling);
  * HBM read bandwidth (big-array reduction);
  * the solver's actual hot op at the n=1934 and n=6144 shapes — the
    (3n, 3n) x (3n, o) dense matvec and the SchurQ implicit matvec — with
    their achieved FLOP/s and the binding roofline term.

The point (and the honest finding): the solver's GEMMs are THIN — o <= 5
columns against the MXU's 128-lane tiles — so the ceiling for the hot op is
not the chip's peak FLOP/s but min(HBM bytes / BW, padded-tile FLOPs /
peak).  "MFU" is reported two ways: useful-FLOPs / (t * peak) (the
classical number, tiny by construction for thin GEMMs) and
achieved / roofline-attainable for the op (the number that says whether
optimization headroom remains).

Usage: python benchmarks/roofline_bench.py [--n6k]
Writes assets_work/roofline.json for PERFORMANCE.md / bench.py to cite.
"""

import json
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)   # BEFORE any array creation:
# without it the "f64" rows silently run f32 (first run of this script)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

_FETCH_S = None


def _fetch_cost():
    """A scalar device fetch costs ~20-40 ms on the remote tunnel and would
    swamp per-op timings; measure it once and batch ops per fetch."""
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
        print(f"(scalar fetch latency: {_FETCH_S*1e3:.1f} ms — batched out"
              f" of all timings below)")
    return _FETCH_S


def timeit(fn, *args, reps=20):
    """Median per-op time: enqueue ``reps`` calls, force ONE fetch at the
    end (in-order stream => all reps executed), subtract the fetch."""
    fetch = _fetch_cost()
    out = fn(*args)  # compile
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
    print(f"backend={jax.default_backend()}")

    # ---- peaks ------------------------------------------------------------
    k = 4096
    A32 = jnp.ones((k, k), jnp.float32)
    B32 = jnp.ones((k, k), jnp.float32)
    mm = jax.jit(lambda a, b: a @ b)
    t = timeit(mm, A32, B32)
    peak_f32 = 2 * k**3 / t
    out["peak_f32_gemm_tflops"] = peak_f32 / 1e12
    print(f"f32 {k}^3 GEMM: {t*1e3:.2f} ms -> {peak_f32/1e12:.1f} TFLOP/s")

    A64 = jnp.ones((k, k), jnp.float64)
    B64 = jnp.ones((k, k), jnp.float64)
    t = timeit(mm, A64, B64)
    peak_f64 = 2 * k**3 / t
    out["peak_f64_gemm_tflops"] = peak_f64 / 1e12
    print(f"f64 {k}^3 GEMM: {t*1e3:.2f} ms -> {peak_f64/1e12:.2f} TFLOP/s "
          f"(emulated; {peak_f32/peak_f64:.0f}x below f32)")

    big = jnp.ones((1 << 28,), jnp.float32)          # 1 GiB
    axpy = jax.jit(lambda x: x + 1.0)
    t = timeit(axpy, big, reps=10)
    bw = 2 * big.nbytes / t                           # read + write
    out["hbm_read_gbps"] = bw / 1e9
    print(f"HBM stream (1 GiB f32 axpy): {t*1e3:.2f} ms -> {bw/1e9:.0f} GB/s")

    # ---- hot op at the n=1934 testbed shape -------------------------------
    for n, o in ((1934, 5), (1934, 3)):
        d = 3 * n
        C = jnp.ones((d, d), jnp.float64)
        X = jnp.ones((d, o), jnp.float64)
        t = timeit(mm, C, X)
        useful = 2 * d * d * o
        padded = 2 * d * d * 128                     # MXU lane padding
        bytes_rd = d * d * 8 + d * o * 8 * 2
        roof = max(padded / peak_f64, bytes_rd / bw)
        out[f"dense_matvec_n{n}_o{o}"] = {
            "ms": t * 1e3, "useful_gflops": useful / t / 1e9,
            "mfu_vs_f64_peak": useful / t / peak_f64,
            "mfu_vs_f32_peak": useful / t / peak_f32,
            "attainable_ms": roof * 1e3,
            "frac_of_roofline": roof / t,
            "bound": ("mxu-padded-flops" if padded / peak_f64
                      > bytes_rd / bw else "hbm"),
        }
        r = out[f"dense_matvec_n{n}_o{o}"]
        print(f"dense C matvec n={n} o={o}: {r['ms']:.2f} ms "
              f"({r['useful_gflops']:.1f} useful GFLOP/s, "
              f"MFU {100*r['mfu_vs_f64_peak']:.1f}% of f64-emu peak, "
              f"{100*r['mfu_vs_f32_peak']:.2f}% of f32 peak); "
              f"roofline-attainable {r['attainable_ms']:.2f} ms "
              f"({r['bound']}) -> at {100*r['frac_of_roofline']:.0f}% "
              f"of attainable")

    # ---- two-float dense matvec (round 5: DenseQTF) -----------------------
    sys.path.insert(0, ".")
    from xmtpu.ops.qop import dense_two_float

    n, o = 1934, 5
    d = 3 * n
    C = jnp.ones((d, d), jnp.float64)
    X = jnp.ones((d, o), jnp.float64)
    Qd = dense_two_float(C)
    app_d = jax.jit(lambda q, x: q.apply(x))
    t = timeit(app_d, Qd, X)
    bytes_rd = d * d * 4 * 2 + d * o * 8 * 3   # hi pass + lo pass, f32
    padded32 = 2 * d * d * 128 * 2
    roof = max(padded32 / peak_f32, bytes_rd / bw)
    out["dense_tf_matvec_n1934_o5"] = {
        "ms": t * 1e3, "attainable_ms": roof * 1e3,
        "frac_of_roofline": roof / t,
        "bound": ("mxu-padded-flops" if padded32 / peak_f32
                  > bytes_rd / bw else "hbm"),
        "speedup_vs_f64": out["dense_matvec_n1934_o5"]["ms"] / (t * 1e3),
    }
    r = out["dense_tf_matvec_n1934_o5"]
    print(f"DenseQTF two-float matvec n={n} o={o}: {r['ms']:.2f} ms "
          f"({r['speedup_vs_f64']:.1f}x f64); roofline "
          f"{r['attainable_ms']:.2f} ms ({r['bound']}) -> at "
          f"{100*r['frac_of_roofline']:.0f}% of attainable")

    # ---- SchurQ implicit matvec at n=6144 ---------------------------------
    # free the peak/dense section's buffers first: the 1 GiB stream array +
    # dense C copies + the n6k build transients together exhausted HBM
    # (ResourceExhausted, round 5)
    del A32, B32, A64, B64, big, C, X, Qd
    if "--n6k" in sys.argv:
        from xmtpu.ops.schurq import SchurQ
        from xmtpu.pipeline.synthetic import make_scene_window

        N, M, K = 6144, 24576, 40
        scene = make_scene_window(N, M, obs_per_camera=K, noise=1e-3,
                                  seed=0, long_range=4)
        Q = SchurQ.build(scene.weights, scene.edges, scene.landmarks,
                         vt_build="ns")
        E = scene.edges.shape[0]
        X = jnp.ones((3 * N, 3), jnp.float64)
        app = jax.jit(lambda q, x: q.apply(x))
        t = timeit(app, Q, X)
        # exact-op FLOPs: VT_inv GEMM dominates ((n-1)^2 * o * 2), edge work
        # is O(E * o * 9 * ~4) gathers/einsums/segsums
        useful = 2 * (N - 1) ** 2 * 3 + E * 3 * 9 * 4
        bytes_rd = (N - 1) ** 2 * 8 + E * (9 + 1 + 1) * 8 * 2
        padded = 2 * (N - 1) ** 2 * 128          # VT_inv GEMM lane padding
        roof_t = max(bytes_rd / bw, padded / peak_f64)
        out["schurq_matvec_n6144"] = {
            "ms": t * 1e3, "useful_gflops": useful / t / 1e9,
            "mfu_vs_f64_peak": useful / t / peak_f64,
            "hbm_attainable_ms": roof_t * 1e3,
            "frac_of_roofline": roof_t / t,
        }
        r = out["schurq_matvec_n6144"]
        print(f"SchurQ matvec n={N}: {r['ms']:.2f} ms "
              f"({r['useful_gflops']:.1f} useful GFLOP/s, MFU "
              f"{100*r['mfu_vs_f64_peak']:.1f}% of f64-emu peak); HBM "
              f"bound {r['hbm_attainable_ms']:.2f} ms -> at "
              f"{100*r['frac_of_roofline']:.0f}% of attainable")

        # round-5 fast-exact two-float operator (VERDICT r4 item 1): same
        # math, f32-pair arithmetic everywhere.  Its HBM bound halves the
        # VT_inv traffic (two f32 passes = one f64 pass) and the f32 MXU
        # padded-flops term replaces the emulated-f64 one.
        Qtf = Q.two_float()
        app_tf = jax.jit(lambda q, x: q.apply(x))
        t = timeit(app_tf, Qtf, X)
        ref = app(Q, X)
        err = float(np.asarray(jnp.linalg.norm(app_tf(Qtf, X) - ref)
                               / jnp.linalg.norm(ref)))
        bytes_tf = (N - 1) ** 2 * 8 + E * (9 + 1 + 1) * 4 * 4
        padded32 = 2 * (N - 1) ** 2 * 128 * 2
        roof_tf = max(bytes_tf / bw, padded32 / peak_f32)
        out["schurq_tf_matvec_n6144"] = {
            "ms": t * 1e3, "relerr_vs_f64": err,
            "attainable_ms": roof_tf * 1e3,
            "frac_of_roofline": roof_tf / t,
            "bound": ("mxu-padded-flops" if padded32 / peak_f32
                      > bytes_tf / bw else "hbm"),
            "speedup_vs_f64_apply": out["schurq_matvec_n6144"]["ms"]
            / (t * 1e3),
        }
        r = out["schurq_tf_matvec_n6144"]
        print(f"SchurQTF fast-exact matvec n={N}: {r['ms']:.2f} ms "
              f"(relerr {err:.1e}, {r['speedup_vs_f64_apply']:.1f}x the f64 "
              f"apply); roofline {r['attainable_ms']:.2f} ms ({r['bound']}) "
              f"-> at {100*r['frac_of_roofline']:.0f}% of attainable")

    with open("assets_work/roofline.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote assets_work/roofline.json")


if __name__ == "__main__":
    main()
