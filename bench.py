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
    path = "mixed_inner_f32"
    res = solve_arrays(Q, **kw)
    if not res.certified:
        # BM rank-3 basin safety net: fall back to the reference-parity f64
        # path (slower but certification is deterministic there)
        path = "f64_fallback"
        kw = dict(max_rank=3, tol=1e-16, lam=0.0, max_time=1000,
                  verbose=False)
        res = solve_arrays(Q, **kw)
    assert res.certified, "SIMPLE1 must certify at rank 3"

    # median of 9: the remote tunnel's dispatch latency fluctuates run to
    # run (observed 136-155 ms across whole-process runs of the identical
    # cached program at 5-rep medians; 9 reps tightens the estimate)
    times = []
    for _ in range(9):
        t0 = time.perf_counter()
        res = solve_arrays(Q, **kw)
        times.append((time.perf_counter() - t0) * 1e3)
    assert res.certified, "SIMPLE1 must certify at rank 3"
    value = float(np.median(times))

    # Scale metric (VERDICT r1 item 5): certified implicit (SchurQ) staircase
    # on the fixed n~2000-class synthetic testbed, mixed-edge f32 + Pallas
    # segment sums — the number that tracks the actual production path.
    # Shapes are pinned so the persistent compile cache hits across rounds.
    extra = {}
    if os.environ.get("XMTPU_BENCH_SCALE", "1") != "0":
        try:
            extra = _scale_metric()
        except Exception as e:  # headline must still print
            extra = {"scale_error": f"{type(e).__name__}: {e}"}

    out = {
        "metric": "simple1_certified_solve",
        "value": round(value, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / value, 3),
        # which precision path the headline measured (VERDICT r1 weak-7:
        # the fallback must not silently change the metric's meaning)
        "path": path,
        "primal": float(res.primal),
        "gap": float(res.gap),
    }
    out.update(extra)
    print(json.dumps(out))


# Round-1 measured rank-3 TR solve at the n=1934 scale testbed: implicit
# SchurQ operator, two-float f32 edge reductions + f32 inner Hessian applies,
# tol=1e-1 (the reference's BAL operating point).  Measured interactively in
# round 1 (docs/PERFORMANCE.md "scale testbed", scale_bench schurq_edge32
# row); from round 2 it is driver-captured here with identical shapes so the
# persistent compile cache hits (CLAUDE.md rule 7).
SCALE_BASELINE_S = 2.66


def _scale_metric():
    """Scale-path metric: the n=1934 implicit TR solve + exact certificate.

    Same scene and solver configuration as benchmarks/scale_bench.py
    (n_cameras=1934, n_points=7736, obs_per_camera=60, seed=0, tol=1e-1,
    chunk=50) so the timing is apples-to-apples with the round-1 number and
    every round replays the same compiled programs.  Reports both the Pallas
    sorted-segment-sum edge path (the production default on a single TPU
    chip) and the XLA-scatter variant.
    """
    import os
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from xmtpu.ops import manifold as mf
    from xmtpu.ops.qop import cast_qop
    from xmtpu.ops.schurq import SchurQ
    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.solver import trust_region as tr
    from xmtpu.solver.certificate import certify

    n_cam = 1934
    scene = make_scene(n_cameras=n_cam, n_points=max(2000, 4 * n_cam),
                       obs_per_camera=60, noise=1e-3, seed=0)
    # with_pallas: the f32 casts derived below (inner-f32 tCG applies) run
    # their segment sums through the Pallas kernel; the exact f64 applies
    # (outer iterations, certificate) are bit-identical to the plain build
    Q = SchurQ.build(scene.weights, scene.edges, scene.landmarks)
    if jax.default_backend() == "tpu":
        Q = Q.with_pallas()
    Q32 = cast_qop(Q, jnp.float32)
    R0 = mf.identity_frames(n_cam, 3)
    s0 = jnp.ones((n_cam,), jnp.float64)
    cfg = tr.TRConfig(chunk=50, inner_f32=True)

    def run(op):
        return tr.trust_region_solve(op, R0, s0, 0.0, 1e-1, cfg=cfg, Q32=Q32)

    out = {"scale_metric": "schurq_n1934_edge32_tr_solve",
           "scale_unit": "s"}
    for name, pallas in (("scale_value", True), ("scale_scatter_value",
                                                 False)):
        op = Q.edge_f32(pallas=pallas)
        res = run(op)
        jax.device_get(res.primal)  # compile + first run
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = run(op)
            jax.device_get(res.primal)
            times.append(time.perf_counter() - t0)
        out[name] = round(float(np.median(times)), 3)
        if pallas:
            out["scale_vs_baseline"] = round(
                SCALE_BASELINE_S / out[name], 3)
            # Roofline accounting (VERDICT r4 item 3): per-op achieved /
            # attainable fractions with the binding term named, from the
            # recorded roofline campaign (benchmarks/roofline_bench.py).
            # The classical MFU (useful FLOPs / f32 peak) is meaningless
            # for this workload's o<=5-thin GEMMs + edge reductions — it
            # measured 9e-5 by construction and was dropped in round 5.
            try:
                import json as _json
                path_r = ("assets_work/roofline.json"
                          if os.path.exists("assets_work/roofline.json")
                          else "benchmarks/recorded/roofline.json")
                with open(path_r) as f:
                    roof = _json.load(f)
                rf = {}
                for op_name in ("dense_matvec_n1934_o5",
                                "dense_tf_matvec_n1934_o5",
                                "schurq_matvec_n6144",
                                "schurq_tf_matvec_n6144"):
                    if op_name in roof:
                        rf[op_name] = {
                            "frac_of_roofline": round(
                                roof[op_name]["frac_of_roofline"], 3),
                            "bound": roof[op_name].get("bound", "hbm"),
                            "ms": round(roof[op_name]["ms"], 2),
                        }
                out["roofline"] = rf
            except (OSError, KeyError):
                pass  # roofline not measured on this host
            # The tol 1e-1 iterate (timed above, comparable to the r1
            # baseline) stops in a shallow basin far from stationarity and
            # honestly cannot certify.  Polish to tol 1e-3 (the reference
            # pipeline's certification-grade operating point — lands in the
            # deep 0.3726 basin), then run the matvec-only certificate on
            # the exact f64 operator (deflated bound + CG probe).
            # stop_on_collapse: the mixed-edge operator has a ~5e-8 relative
            # noise floor — gradnorm stalls around 9e-3 on this problem and
            # every outer after the first radius collapse is rejection churn
            # (measured: 26 of 31 polish outers rejected without moving the
            # loss).  The certificate (exact f64 operator) decides anyway.
            cfg_pol = tr.TRConfig(chunk=50, inner_f32=True,
                                  stop_on_collapse=True)
            # (delta0 warm-start measured here: no iteration win — the
            # tol-1e-1 stage ends by gradtol with its radius still healthy,
            # and the polish outers are operator-noise churn, not radius
            # collapse.  Kept at the default for round-over-round
            # comparability: 60/240 iters, primal 0.37371.)
            # median of 3: single-shot polish timings fluctuate 2-4x with
            # tunnel dispatch jitter (measured 4.0 s quiet vs 9-18 s in
            # earlier single-shot rounds)
            R_in, s_in = res.R, res.s_ex
            pol_times = []
            for _ in range(3):
                t0 = time.perf_counter()
                res = tr.trust_region_solve(op, R_in, s_in, 0.0, 1e-3,
                                            cfg=cfg_pol, Q32=Q32)
                jax.device_get(res.primal)
                pol_times.append(time.perf_counter() - t0)
            out["scale_polish_s"] = round(float(np.median(pol_times)), 3)
            out["scale_polish_iters"] = (int(res.outer_iters),
                                         int(res.total_inner))
            sR = mf.flatten(mf.scale_blocks(res.R, res.s_ex))
            # round 5: per-iteration certificate matvecs on the two-float
            # fast operator, decisions exact-anchored (certify fast="auto")
            cert = certify(Q, sR, 0.0, res.primal,
                           fast="auto")  # warmup/compile
            t0 = time.perf_counter()
            cert = certify(Q, sR, 0.0, res.primal, fast="auto")
            cert_ok = bool(jax.device_get(cert.certified))
            out["scale_cert_s"] = round(time.perf_counter() - t0, 3)
            out["scale_certified"] = cert_ok
            out["scale_certified_primal"] = float(res.primal)
    # n=6144 beyond-dense-memory flagship: attach the recorded campaign
    # summary (benchmarks/n6k_bench.py writes it; too long to re-run per
    # bench invocation — docs/PERFORMANCE.md has the methodology)
    try:
        import json as _json
        p = ("assets_work/n6k/summary.json"
             if os.path.exists("assets_work/n6k/summary.json")
             else "benchmarks/recorded/n6k_summary.json")
        with open(p) as f:
            n6 = _json.load(f)
        out["n6k_recorded"] = n6
    except OSError:
        pass
    # round-5 recorded campaign headlines (xm2_bench.py / staircase_bench.py
    # write the full JSONs; too long to re-run per bench invocation)
    try:
        import json as _json
        with open("benchmarks/recorded/xm2.json") as f:
            x = _json.load(f)
        out["xm2_recorded"] = {
            "implicit_s": x["implicit"]["value"],
            "dense_s": x["dense"]["value"], "n": x["implicit"]["n"]}
    except (OSError, KeyError):
        pass
    try:
        import json as _json
        with open("benchmarks/recorded/staircase_n2048_tpu.json") as f:
            st = _json.load(f)
        out["staircase_recorded"] = {
            "n": st["n"], "total_s": st["value"], "rank": st["rank"],
            "certified": st["certified"],
            "escapes": sum(1 for s in st["stages"]
                           if not s.get("certified"))}
    except (OSError, KeyError):
        pass
    return out


if __name__ == "__main__":
    main()
