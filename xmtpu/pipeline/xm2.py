"""XM^2: outlier-rejecting two-pass solve with adaptive scale regularization.

Re-design of the XM^2 blocks in the reference drivers
(/root/reference/3_test_colmap_glomap.py:299-351 and, for the learned-depth
relative-error variant, 4_test_unidepth.py:310-325).

Flow:
  1. first solve (rank staircase, ``lam = |E| / N``),
  2. per-observation residual ``w * || p_j - (s_i R_i x_ij + t_i) ||^2``
     (optionally divided by the observation depth^2 for learned depth),
  3. drop the top decile,
  4. re-clean the view graph, re-assemble,
  5. rank-3 probe solve with ``lam = 0``; if the scale statistics look
     degenerate (``|mean(s) - 1| > 2 std(s)`` or more than 10 scales < 0.1)
     re-enable ``lam = |E| / N`` for the final staircase solve
     (3_test:338-351),
  6. final staircase solve + recovery.

Everything runs in memory through :func:`xmtpu.solver.staircase.solve_arrays`
— no ``.bin`` round trips.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from xmtpu.assembly.creatematrix import create_matrix_arrays
from xmtpu.pipeline.graph import checklandmarks
from xmtpu.pipeline.recover import recover_XM
from xmtpu.solver.staircase import solve_arrays


class XM2Result(NamedTuple):
    R_real: np.ndarray    # (3, 3N) c2w rotation blocks
    s_real: np.ndarray    # (N,)
    p_est: np.ndarray     # (3, M)
    t_est: np.ndarray     # (3, N)
    edges: np.ndarray
    weights: np.ndarray
    landmarks: np.ndarray
    rgbs: np.ndarray
    indices_all: np.ndarray
    lam: float
    first_pass: tuple     # (R_real, s_real, p_est, t_est) before the cut


def xm2_residuals(edges, weights, landmarks, R_real, s_real, t_est, p_est,
                  relative: bool = False) -> np.ndarray:
    """Per-observation weighted squared residual (3_test:303-317).

    ``relative=True`` divides the difference by the observation depth
    (4_test_unidepth.py:321) — appropriate for learned monocular depth whose
    error grows with distance.
    """
    src = edges[:, 0] - 1
    dst = edges[:, 1] - 1
    N = s_real.shape[0]
    Rb = R_real.reshape(3, N, 3).transpose(1, 0, 2)
    transformed = (s_real[src, None] * np.einsum("nij,nj->ni", Rb[src], landmarks)
                   + t_est[:, src].T)
    diff = p_est[:, dst].T - transformed
    if relative:
        diff = diff / landmarks[:, 2][:, None]
    return weights * np.sum(diff**2, axis=1)


def choose_implicit(N: int, M: int, budget_bytes: int | None = None) -> bool:
    """Operator policy: dense C vs factored SchurQ.

    On this hardware the dense 3Nx3N matvec rides the MXU (~2.3 ms at
    N=1934) while the implicit operator's per-edge gathers/scatters cost
    ~100 ms under f64 emulation — dense wins 4x end-to-end at the BAL-1934
    operating point (docs/PERFORMANCE.md). Implicit is for problems whose
    dense form doesn't fit: estimated assembly footprint
    ``(9N^2 + 2*3N(N+M)) * 8`` bytes against a budget (default 4 GB,
    override with ``XMTPU_DENSE_BUDGET`` bytes).
    """
    import os

    if budget_bytes is None:
        budget_bytes = int(os.environ.get("XMTPU_DENSE_BUDGET", 4 << 30))
    est = (9 * N * N + 2 * 3 * N * (N + M)) * 8
    return est > budget_bytes


def _assemble_operator(weights, edges, landmarks, verbose, implicit,
                       precision: str = "f64"):
    """Build the cost operator once; reusable across a probe + final solve
    on the same observation set (the reference re-reads Q.bin from disk for
    each of its solve calls, 3_test:338-351).

    ``precision="mixed"`` runs the dense assembly's heavy middle in hardware
    f32 (~1e-6 relative C error — assembly was the largest warm phase at
    n=1934, see benchmarks/README.md); SchurQ stays f64 (its factors feed
    the matvec certificate)."""
    if implicit == "auto":
        N = int(np.asarray(edges)[:, 0].max())
        M = int(np.asarray(edges)[:, 1].max())
        implicit = choose_implicit(N, M)
        if verbose:
            print(f"[xm2] operator: {'SchurQ (implicit)' if implicit else 'dense C'}")
    if implicit:
        import jax

        from xmtpu.ops.schurq import SchurQ

        Q = SchurQ.build(weights, edges, landmarks)
        if jax.default_backend() == "tpu":
            # f32 casts derived from this operator (the ladder's f32 phase,
            # inner-f32 tCG applies) run their segment sums through the
            # Pallas kernel; exact f64 applies are bit-identical
            Q = Q.with_pallas()
        return Q, None, True
    from xmtpu.ops.qop import DenseQ

    C, Abar = create_matrix_arrays(weights, edges, landmarks,
                                   precision=precision)
    # full-f64 assembly is the same Schur-complement-of-squares build as the
    # reference's Q.bin: structurally PSD, so the certificate gets the O(n)
    # Delta-bound acceptance shortcut.  The mixed assembly's ~1e-6 relative
    # rounding exceeds the acceptance bound — no hint there.
    return DenseQ(C, psd_hint=(precision == "f64")), Abar, False


def _solve_recover(op, Abar, implicit, max_rank, tol, lam, max_time, verbose,
                   precision, rank3_probe=False):
    if implicit:
        from xmtpu.pipeline.recover import recover_XM_implicit

        # production policy: at the pipeline's loose tolerances the implicit
        # operator's f64-emulated edge reductions dominate; run the tCG
        # Hessian applies in f32 (the f64 rho test guards the model —
        # measured 2.2x on the n=1934 testbed at identical optima) and the
        # outer-iteration applies on the fully two-float operator
        # (round 5: SchurQTF, ~1e-7 relative operator error with the
        # f32-pair VT GEMM; certificate/recovery stay exact-anchored, and
        # the staircase re-reads the final primal through the exact
        # operator)
        inner_f32 = tol >= 1e-3
        if rank3_probe:
            return solve_arrays(op, 3, tol, lam, max_time, rank3_only=True,
                                verbose=verbose, precision=precision,
                                inner_f32=inner_f32, edge_tf=inner_f32), None
        res = solve_arrays(op, max_rank, tol, lam, max_time, verbose=verbose,
                           precision=precision, inner_f32=inner_f32,
                           edge_tf=inner_f32)
        return res, recover_XM_implicit(op, res.R, res.s_ex, lam,
                                        verbose=verbose)
    if rank3_probe:
        return solve_arrays(op, 3, tol, lam, max_time, rank3_only=True,
                            verbose=verbose, precision=precision), None
    res = solve_arrays(op, max_rank, tol, lam, max_time, verbose=verbose,
                       precision=precision)
    return res, recover_XM(op, res.R, res.s_ex, Abar, lam, verbose=verbose)


def xm2_solve(edges, weights, landmarks, rgbs, N, M,
              max_rank: int = 5, tol: float = 1e-1, max_time: float = 1000.0,
              relative: bool = False, percentile: float = 90.0,
              verbose: bool = True, implicit="auto",
              precision: str = "f64", timer=None) -> XM2Result:
    """Full XM^2 pipeline on a cleaned-or-raw observation set.

    ``implicit`` routes assembly/solve/recovery through the factored
    SchurQ operator (no dense C or Abar — the beyond-memory path);
    the default ``"auto"`` picks dense C while it fits
    (:func:`choose_implicit`). ``precision="mixed"`` enables the f32/f64
    ladder.  ``timer``: optional PhaseTimer the caller reads back
    (benchmarks) — by default a fresh one reported at ``verbose``.
    """
    from xmtpu.utils.timer import PhaseTimer

    timer = timer if timer is not None else PhaseTimer()
    with timer.phase("clean1"):
        edges, landmarks, weights, rgbs, indices_all = checklandmarks(
            edges, landmarks, weights, rgbs, N, M)

    # ---- pass 1 ----
    lam = edges.shape[0] / int(edges[:, 0].max())
    with timer.phase("pass1_assemble"):
        op1, Abar1, impl1 = _assemble_operator(weights, edges, landmarks,
                                               verbose, implicit, precision)
    with timer.phase("pass1_solve_recover"):
        res, rec = _solve_recover(op1, Abar1, impl1, max_rank, tol, lam,
                                  max_time, verbose, precision)
    R_real, s_real, p_est, t_est = rec
    first_pass = (R_real, s_real, p_est, t_est)

    # ---- residual cut ----
    with timer.phase("residuals"):
        error = xm2_residuals(edges, weights, landmarks, R_real, s_real,
                              t_est, p_est, relative=relative)
    if verbose:
        print("sum of error: ", float(np.sum(error)))
    keep = error <= np.percentile(error, percentile)
    edges, weights, rgbs, landmarks = (edges[keep], weights[keep], rgbs[keep],
                                       landmarks[keep])

    # ---- re-clean + pass 2 ----
    N2 = s_real.shape[0]
    M2 = p_est.shape[1]
    with timer.phase("clean2"):
        edges, landmarks, weights, rgbs, indices = checklandmarks(
            edges, landmarks, weights, rgbs, N2, M2)
    live = indices_all > -1
    indices_all[live] = indices[indices_all[live]]

    # rank-3 probe with lam = 0, then adaptive regularization (3_test:338-351)
    # The operator is assembled ONCE for the probe + final solve — same
    # observation set; the reference re-reads Q.bin from disk per solve.
    lam = 0.0
    with timer.phase("pass2_assemble"):
        op2, Abar2, impl2 = _assemble_operator(weights, edges, landmarks,
                                               verbose, implicit, precision)
    with timer.phase("pass2_probe"):
        probe, _ = _solve_recover(op2, Abar2, impl2, 3, tol, lam, max_time,
                                  verbose, precision, rank3_probe=True)
    s = probe.s_ex
    s_avg, s_std = np.mean(s[1:]), np.std(s[1:])
    if np.abs(s_avg - 1) > 2 * s_std or np.sum(s < 0.1) > 10:
        if verbose:
            print("s is too small, run again")
        lam = edges.shape[0] / int(edges[:, 0].max())
    elif verbose:
        print("s is good")
    with timer.phase("pass2_solve_recover"):
        res, rec = _solve_recover(op2, Abar2, impl2, max_rank, tol, lam,
                                  max_time, verbose, precision)
    R_real, s_real, p_est, t_est = rec
    if verbose:
        print("[xm2 phases]\n" + timer.report())

    return XM2Result(R_real, s_real, p_est, t_est, edges, weights, landmarks,
                     rgbs, indices_all, lam, first_pass)
