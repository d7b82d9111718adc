"""Accuracy-results regression tests (VERDICT r2 items 8-9).

Every number asserted here is the committed value in RESULTS.md — these
tests are the oracle that keeps the table honest.  Medians follow the
reference driver's printed-medians convention
(/root/reference/3_test_colmap_glomap.py:383-427 through
``xmtpu.pipeline.metrics.evaluate``).
"""

import numpy as np
import pytest

from xmtpu.pipeline import metrics
from xmtpu.pipeline.synthetic import make_scene


def _w2c(R_gt, t_gt):
    """Driver GT convention: w2c rotation stack (3, 3N) + w2c translations."""
    R_flat = np.concatenate([R.T for R in R_gt], axis=1)
    t_w2c = -np.einsum("nba,nb->na", R_gt, t_gt).T
    return R_flat, t_w2c


def test_results_xm2_synthetic_bal_medians():
    """XM2 two-pass solve on a 60-camera BAL-class scene with 5% planted
    gross outliers (example-3 configuration, RESULTS.md row 'XM2 BAL-60')."""
    from xmtpu.pipeline.xm2 import xm2_solve

    scene = make_scene(n_cameras=60, n_points=300, obs_per_camera=30,
                       noise=1e-3, seed=7)
    rng = np.random.default_rng(0)
    E = len(scene.edges)
    bad = rng.choice(E, size=E // 20, replace=False)
    landmarks = scene.landmarks.copy()
    landmarks[bad] += rng.normal(size=(len(bad), 3)) * 5.0

    out = xm2_solve(scene.edges.copy(), scene.weights.copy(), landmarks,
                    scene.rgbs.copy(), scene.N, scene.M, max_rank=4,
                    tol=1e-6, verbose=False)
    live = out.indices_all > -1
    idx = out.indices_all[live]
    N2 = out.s_real.shape[0]
    Rb = out.R_real.reshape(3, N2, 3).transpose(1, 0, 2)[idx]
    R_est = np.concatenate(list(Rb), axis=1)
    R_gt_flat, t_w2c = _w2c(scene.R_gt[live], scene.t_gt[live])
    m = metrics.evaluate(R_est, out.t_est[:, idx], R_gt_flat, t_w2c)

    # committed medians (RESULTS.md); loose relative windows — the medians
    # are stable but the solve is iterative floating-point
    assert m["ATE_R_deg"] < 0.7     # committed 0.558
    assert m["ATE_T"] < 0.025       # committed 0.0180
    assert m["RPE_R_deg"] < 1.3     # committed 1.019
    assert m["RPE_T"] < 0.045       # committed 0.0339


def test_results_refine_matches_converged_optimum():
    """Refine (Ceres-analog) parity evidence (VERDICT r2 item 9): from a
    perturbed init, the JAX LM must reach the SAME reprojection cost as a
    deep-converged gold run started at GT — stationary-point equivalence,
    the property a correct Ceres run has on the identical least-squares
    problem (utils/ceresforXM.py:65-73 configuration).  RESULTS.md row
    'refine parity'."""
    import jax.numpy as jnp

    from xmtpu.pipeline.refine import _expm_so3, refine_bundle

    rng = np.random.default_rng(0)
    scene = make_scene(n_cameras=8, n_points=60, obs_per_camera=40,
                       noise=0.0, seed=50)
    f = scene.edges[:, 0] - 1
    l = scene.edges[:, 1] - 1
    Rw2c = scene.R_gt.transpose(0, 2, 1)
    t_w2c = -np.einsum("nab,nb->na", Rw2c, scene.t_gt)
    x = np.einsum("eab,eb->ea", Rw2c[f], scene.p_gt[l]) + t_w2c[f]
    keep = x[:, 2] > 1.0
    edges = scene.edges[keep]
    obs2d = x[keep, :2] / x[keep, 2:3] + rng.normal(
        size=(int(keep.sum()), 2)) * 1e-3
    N, M = scene.N, scene.M
    R_gt_flat = scene.R_gt.transpose(1, 0, 2).reshape(3, 3 * N)

    gold = refine_bundle(edges, obs2d, R_gt_flat, scene.t_gt.T,
                         scene.p_gt.T, max_iters=60)
    dw = rng.normal(size=(N, 3)) * 0.03
    R0 = np.asarray(_expm_so3(jnp.asarray(dw))) @ scene.R_gt
    t0 = scene.t_gt + rng.normal(size=(N, 3)) * 0.03
    p0 = scene.p_gt + rng.normal(size=(M, 3)) * 0.03
    test = refine_bundle(edges, obs2d, R0.transpose(1, 0, 2).reshape(3, 3 * N),
                         t0.T, p0.T, max_iters=60)

    # same stationary point: cost within 1e-3 relative of the gold optimum
    # (measured 1.4e-5; committed in RESULTS.md)
    assert abs(test.final_cost - gold.final_cost) < 1e-3 * gold.final_cost

    # accuracy medians improve by an order of magnitude over the init
    Rg_flat, t_gt_w2c = _w2c(scene.R_gt, scene.t_gt)
    m0 = metrics.evaluate(R0.transpose(1, 0, 2).reshape(3, 3 * N), t0.T,
                          Rg_flat, t_gt_w2c)
    m1 = metrics.evaluate(test.R_est, test.t_est, Rg_flat, t_gt_w2c)
    assert m1["ATE_R_deg"] < m0["ATE_R_deg"] / 10   # 3.30 deg -> 0.176 deg
    assert m1["ATE_R_deg"] < 0.3
    assert m1["ATE_T"] < 0.012                      # committed 0.0075


@pytest.mark.slow
def test_results_simple2_certified_primal(simple2_data):
    """SIMPLE2 (real BAL-93 reference fixture, example-2 configuration):
    certified optimum pinned (RESULTS.md row 'SIMPLE2').  No GT poses ship
    with the fixture, so the committed evidence is the certified primal and
    the recovered-geometry consistency median."""
    from xmtpu.assembly.creatematrix import create_matrix_arrays
    from xmtpu.pipeline.graph import checklandmarks
    from xmtpu.pipeline.recover import recover_XM
    from xmtpu.solver.staircase import solve_arrays

    data = simple2_data
    edges = data[:, :2].astype(int)
    _, uniq = np.unique(edges, axis=0, return_index=True)
    edges = edges[uniq]
    data = data[uniq]
    weights = data[:, 5]
    landmarks = data[:, 2:5]
    rgbs = np.zeros((len(edges), 3))
    N = int(edges[:, 0].max())
    M = int(edges[:, 1].max())
    edges, landmarks, weights, rgbs, _ = checklandmarks(
        edges, landmarks, weights, rgbs, N, M, frame_min_obs=0)
    C, Abar = create_matrix_arrays(weights, edges, landmarks)
    res = solve_arrays(C, max_rank=5, tol=1e-1, lam=0.0, max_time=1000,
                       verbose=False)
    assert res.certified and res.rank == 3
    np.testing.assert_allclose(res.primal, 4.8372846934e-02, rtol=1e-5)

    R_real, s_real, p_est, t_est = recover_XM(C, res.R, res.s_ex, Abar, 0.0,
                                              verbose=False)
    d_est = np.linalg.norm(p_est.T[edges[:, 1] - 1]
                           - t_est.T[edges[:, 0] - 1], axis=1)
    d_obs = np.linalg.norm(landmarks, axis=1)
    med = float(np.median(np.abs(d_est - d_obs) / d_obs))
    assert med < 2e-3       # committed 1.09e-3
