"""Assembly tests: the assembled C must equal the translation/landmark-
eliminated cost, and Abar must reproduce the optimal (t, p)."""

import numpy as np
import pytest

from xmtpu.assembly.creatematrix import create_matrix_arrays
from xmtpu.pipeline.synthetic import make_scene


def _direct_min_cost(edges, weights, x, sR, N, M, o):
    """Independent dense evaluation: min over (t, p), t_0 = 0, of
    sum_e w_e || p_l - sR_f^T x_e - t_f ||^2, via lstsq on the stacked
    linear system.  Returns (min_cost, y_opt) with y = [t_1..t_N, p_1..p_M]
    stacked as (N+M-1, o)."""
    E = len(edges)
    f = edges[:, 0] - 1
    l = edges[:, 1] - 1
    # unknowns: t_i (i=1..N-1) then p_j (j=0..M-1), each o-dim
    n_unk = (N - 1) + M
    A = np.zeros((E, n_unk))
    b = np.zeros((E, o))
    sw = np.sqrt(weights)
    for e in range(E):
        z = sR[3 * f[e]:3 * f[e] + 3, :].T @ x[e]        # sR_f^T x_e  (o,)
        A[e, (N - 1) + l[e]] = sw[e]
        if f[e] > 0:
            A[e, f[e] - 1] = -sw[e]
        b[e] = sw[e] * z
    y, res, *_ = np.linalg.lstsq(A, b, rcond=None)
    r = A @ y - b
    return float(np.sum(r**2)), y


@pytest.mark.parametrize("o", [3, 4])
def test_C_equals_eliminated_cost(o):
    scene = make_scene(n_cameras=6, n_points=25, obs_per_camera=12, seed=3)
    C, Abar = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    N = scene.edges[:, 0].max()
    rng = np.random.default_rng(0)
    sR = rng.normal(size=(3 * N, o))
    quad = float(np.sum(sR * (C @ sR)))
    direct, _ = _direct_min_cost(scene.edges, scene.weights, scene.landmarks,
                                 sR, N, scene.edges[:, 1].max(), o)
    np.testing.assert_allclose(quad, direct, rtol=1e-8)


def test_Abar_recovers_optimal_y():
    scene = make_scene(n_cameras=5, n_points=20, obs_per_camera=10, seed=4)
    C, Abar = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    N = scene.edges[:, 0].max()
    M = scene.edges[:, 1].max()
    o = 3
    rng = np.random.default_rng(1)
    sR = rng.normal(size=(3 * N, o))
    _, y_opt = _direct_min_cost(scene.edges, scene.weights, scene.landmarks,
                                sR, N, M, o)
    y_abar = Abar @ sR       # (N+M-1, o)
    np.testing.assert_allclose(y_abar, y_opt, rtol=1e-7, atol=1e-9)


def test_zero_cost_at_ground_truth():
    """At the noiseless ground truth the eliminated cost vanishes."""
    scene = make_scene(n_cameras=6, n_points=30, obs_per_camera=15, noise=0.0,
                       seed=5)
    C, _ = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    # the eliminated cost is min over (t,p) of sum w ||p_l - sR_f^T x - t_f||^2;
    # at GT, s_f R_f x = p_l - t_f, so the block must be sR_f = s_f R_f^T
    sR = np.concatenate([s * R.T for s, R in zip(scene.s_gt, scene.R_gt)], axis=0)
    # the quadratic form evaluates min over (t,p) which is <= cost at GT = 0
    val = float(np.sum(sR * (C @ sR)))
    assert abs(val) < 1e-6


def test_C_symmetric_psd():
    scene = make_scene(n_cameras=6, n_points=25, obs_per_camera=12, seed=6)
    C, _ = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    np.testing.assert_allclose(C, C.T, atol=1e-9)
    w = np.linalg.eigvalsh(C)
    assert w.min() > -1e-7 * max(1.0, w.max())


def test_mixed_precision_assembly_close_and_certifiable():
    """precision='mixed' assembly (hardware-f32 heavy middle) produces a C
    within ~1e-5 relative of the f64 assembly, and the staircase certifies
    the perturbed problem at a matching optimum."""
    import numpy as np

    from xmtpu.assembly.creatematrix import create_matrix_arrays
    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.solver.staircase import solve_arrays

    scene = make_scene(n_cameras=40, n_points=200, obs_per_camera=30,
                       noise=1e-3, seed=7)
    C64, A64 = create_matrix_arrays(scene.weights, scene.edges,
                                    scene.landmarks)
    C32, A32 = create_matrix_arrays(scene.weights, scene.edges,
                                    scene.landmarks, precision="mixed")
    assert C32.dtype == np.float64  # outputs always f64
    scale = np.abs(C64).max()
    assert np.abs(C32 - C64).max() / scale < 1e-4
    assert np.abs(A32 - A64).max() / max(np.abs(A64).max(), 1.0) < 1e-3

    r64 = solve_arrays(C64, max_rank=4, tol=1e-6, lam=0.0, verbose=False)
    r32 = solve_arrays(C32, max_rank=4, tol=1e-6, lam=0.0, verbose=False)
    assert r64.certified and r32.certified
    # the optimum objective sits at residual level (~1e-3 of ||C||), so a
    # 1e-5-relative C perturbation moves it by a few percent relatively
    np.testing.assert_allclose(r32.primal, r64.primal, rtol=5e-2)
