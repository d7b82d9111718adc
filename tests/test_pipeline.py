"""End-to-end pipeline tests on synthetic scenes: assembly -> solve ->
recovery -> metrics, plus the XM^2 outlier loop."""

import numpy as np
import pytest

from xmtpu.assembly.creatematrix import create_matrix_arrays
from xmtpu.pipeline import metrics
from xmtpu.pipeline.graph import checklandmarks
from xmtpu.pipeline.recover import recover_XM
from xmtpu.pipeline.synthetic import make_scene
from xmtpu.pipeline.xm2 import xm2_residuals, xm2_solve
from xmtpu.solver.staircase import solve_arrays


@pytest.fixture(scope="module")
def solved_scene():
    scene = make_scene(n_cameras=10, n_points=60, obs_per_camera=25,
                       noise=1e-4, seed=21)
    C, Abar = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    res = solve_arrays(C, max_rank=4, tol=1e-8, lam=0.0, verbose=False)
    out = recover_XM(C, res.R, res.s_ex, Abar, 0.0, verbose=False)
    return scene, C, Abar, res, out


def test_recovered_poses_match_gt(solved_scene):
    scene, C, Abar, res, (R_real, s_real, p_est, t_est) = solved_scene
    N = scene.N
    # R_real blocks are c2w after gauge fix to camera 0; GT R_0 = I
    Rb = R_real.reshape(3, N, 3).transpose(1, 0, 2)
    rel_est = np.einsum("ab,nbc->nac", Rb[0].T, Rb)
    rel_gt = scene.R_gt  # R_gt[0] = I already
    prod = np.einsum("nab,ncb->nac", rel_est, rel_gt)
    cos = np.clip((np.trace(prod, axis1=1, axis2=2) - 1) / 2, -1, 1)
    assert np.degrees(np.arccos(cos)).max() < 0.5

    # scales match GT up to the anchored normalization
    np.testing.assert_allclose(s_real / s_real[0],
                               scene.s_gt / scene.s_gt[0], rtol=2e-3)


def test_recovered_structure_matches_gt(solved_scene):
    scene, C, Abar, res, (R_real, s_real, p_est, t_est) = solved_scene
    # landmark estimates live in the anchored estimate frame; compare to GT
    # after the same gauge (camera0 has R=I, t=0 in both) up to global O(3)
    # sign — use distances to camera centers which are invariant
    d_est = np.linalg.norm(p_est.T[scene.edges[:, 1] - 1]
                           - t_est.T[scene.edges[:, 0] - 1], axis=1)
    d_gt = np.linalg.norm(scene.p_gt[scene.edges[:, 1] - 1]
                          - scene.t_gt[scene.edges[:, 0] - 1], axis=1)
    np.testing.assert_allclose(d_est, d_gt, rtol=5e-3)


def test_metrics_near_zero_on_recovered(solved_scene):
    scene, C, Abar, res, (R_real, s_real, p_est, t_est) = solved_scene
    N = scene.N
    # driver convention (readgt_*: "transform to world-2-camera"): the GT
    # dict holds w2c rotations and translations
    R_gt_flat = np.concatenate([R.T for R in scene.R_gt], axis=1)
    t_w2c = -np.einsum("nba,nb->na", scene.R_gt, scene.t_gt).T
    m = metrics.evaluate(R_real, t_est, R_gt_flat, t_w2c)
    assert m["ATE_R_deg"] < 1.0
    assert m["ATE_T"] < 0.05
    assert m["RPE_R_deg"] < 1.0
    assert m["RPE_T"] < 0.05


def test_xm2_removes_planted_outliers():
    # dense view graph (~8 obs per point) so a gross outlier cannot dominate
    # its landmark's position estimate
    scene = make_scene(n_cameras=10, n_points=40, obs_per_camera=35,
                       noise=1e-4, seed=33)
    # plant gross outliers in 5% of observations
    rng = np.random.default_rng(0)
    E = len(scene.edges)
    bad = rng.choice(E, size=E // 20, replace=False)
    landmarks = scene.landmarks.copy()
    landmarks[bad] += rng.normal(size=(len(bad), 3)) * 5.0

    out = xm2_solve(scene.edges.copy(), scene.weights.copy(), landmarks,
                    scene.rgbs.copy(), scene.N, scene.M, max_rank=4,
                    tol=1e-6, verbose=False)

    def rot_err_deg(R_real, s_real):
        N2 = s_real.shape[0]
        Rb = R_real.reshape(3, N2, 3).transpose(1, 0, 2)
        live = out.indices_all > -1
        gt_rel = scene.R_gt[live]
        est_rel = Rb[out.indices_all[live]]
        est_rel = np.einsum("ab,nbc->nac", est_rel[0].T, est_rel)
        gt_rel = np.einsum("ab,nbc->nac", gt_rel[0].T, gt_rel)
        prod = np.einsum("nab,ncb->nac", est_rel, gt_rel)
        cos = np.clip((np.trace(prod, axis1=1, axis2=2) - 1) / 2, -1, 1)
        return np.degrees(np.arccos(cos)).max()

    first = rot_err_deg(out.first_pass[0], out.first_pass[1])
    second = rot_err_deg(out.R_real, out.s_real)
    # the cut must improve rotation accuracy by a wide margin and land in a
    # usable range (one 90th-percentile cut is a heuristic, not an oracle --
    # the reference applies it once too, 3_test:321)
    assert second < first / 3
    assert second < 5.0


def test_residuals_zero_at_consistent_solution():
    scene = make_scene(n_cameras=6, n_points=30, obs_per_camera=12,
                       noise=0.0, seed=40)
    # residuals at ground truth must vanish
    R_real = np.concatenate(list(scene.R_gt), axis=1)
    err = xm2_residuals(scene.edges, scene.weights, scene.landmarks,
                        R_real, scene.s_gt, scene.t_gt.T,
                        scene.p_gt.T)
    assert float(np.abs(err).max()) < 1e-18
