"""LM bundle-refinement tests (the Ceres-equivalent stage of driver 5)."""

import numpy as np
import pytest

from xmtpu.pipeline.refine import refine_bundle
from xmtpu.pipeline.synthetic import make_scene


def _project_scene(scene):
    """Normalized 2-D observations from GT (unit pinhole): for obs e,
    x_cam = R_i^w2c p + t^w2c; obs = x[:2]/x[2]."""
    f = scene.edges[:, 0] - 1
    l = scene.edges[:, 1] - 1
    Rw2c = scene.R_gt.transpose(0, 2, 1)
    t_w2c = -np.einsum("nab,nb->na", Rw2c, scene.t_gt)
    x = np.einsum("eab,eb->ea", Rw2c[f], scene.p_gt[l]) + t_w2c[f]
    keep = x[:, 2] > 1.0   # well in front of the camera (stable projection)
    return scene.edges[keep], x[keep, :2] / x[keep, 2:3], keep


@pytest.fixture(scope="module")
def noisy_problem():
    rng = np.random.default_rng(0)
    scene = make_scene(n_cameras=6, n_points=40, obs_per_camera=30,
                       noise=0.0, seed=50)
    edges, obs2d, keep = _project_scene(scene)
    N, M = scene.N, scene.M
    # perturb the GT to build an imperfect initial guess
    from xmtpu.pipeline.refine import _expm_so3
    import jax.numpy as jnp
    dw = rng.normal(size=(N, 3)) * 0.02
    R0 = np.asarray(_expm_so3(jnp.asarray(dw))) @ scene.R_gt
    t0 = scene.t_gt + rng.normal(size=(N, 3)) * 0.02
    p0 = scene.p_gt + rng.normal(size=(M, 3)) * 0.02
    R0_flat = R0.transpose(1, 0, 2).reshape(3, 3 * N)
    return scene, edges, obs2d, R0_flat, t0.T, p0.T


def _mean_reproj_error(edges, obs2d, R_flat, t_centers, p):
    N = t_centers.shape[1]
    Rb = R_flat.reshape(3, N, 3).transpose(1, 0, 2)     # c2w
    Rw2c = Rb.transpose(0, 2, 1)
    tw2c = -np.einsum("nab,nb->na", Rw2c, t_centers.T)
    f = edges[:, 0] - 1
    l = edges[:, 1] - 1
    x = np.einsum("eab,eb->ea", Rw2c[f], p.T[l]) + tw2c[f]
    proj = x[:, :2] / x[:, 2:3]
    return float(np.mean(np.linalg.norm(proj - obs2d, axis=1)))


def test_refine_reduces_reprojection_error(noisy_problem):
    scene, edges, obs2d, R0, t0, p0 = noisy_problem
    err0 = _mean_reproj_error(edges, obs2d, R0, t0, p0)
    res = refine_bundle(edges, obs2d, R0, t0, p0, max_iters=30)
    err1 = _mean_reproj_error(edges, obs2d, res.R_est, res.t_est, res.p_est)
    assert err1 < err0 / 50
    assert res.final_cost < 1e-6


def test_refine_only_landmarks_freezes_poses(noisy_problem):
    scene, edges, obs2d, R0, t0, p0 = noisy_problem
    res = refine_bundle(edges, obs2d, R0, t0, p0, only_landmarks=True,
                        max_iters=15)
    np.testing.assert_allclose(res.R_est, R0, atol=1e-12)
    np.testing.assert_allclose(res.t_est, t0, atol=1e-12)
    # points still moved
    assert np.abs(res.p_est - p0).max() > 1e-6


def test_refine_matches_scipy_least_squares(noisy_problem):
    """External cross-validation of the Ceres-equivalence claim (VERDICT r3
    item 7): scipy.optimize.least_squares — an independent trust-region
    optimizer, not part of this framework — is run on the IDENTICAL
    residual/parameterization (rotation-vector increments about the same
    initial w2c poses, additive dt/dp).  Both must reach the same nonzero
    optimum cost of the noisy problem (utils/ceresforXM.py:65-73 analog)."""
    from scipy.optimize import least_squares

    scene, edges, obs2d, R0_flat, t0c, p0 = noisy_problem
    rng = np.random.default_rng(7)
    obs_noisy = obs2d + rng.normal(size=obs2d.shape) * 2e-3

    # cg_iters >= param dim -> exact Gauss-Newton steps; the default
    # truncated-CG steps reach the same basin but stall the relative-change
    # stopping rule ~1.5e-4 above the stationary cost
    res = refine_bundle(edges, obs_noisy, R0_flat, t0c, p0, max_iters=300,
                        cg_iters=300)
    cost_lm = res.final_cost
    assert cost_lm > 1e-8  # noisy problem: optimum must be nonzero

    # identical residual in plain numpy for scipy
    N = t0c.shape[1]
    M = p0.shape[1]
    Rb = R0_flat.reshape(3, N, 3).transpose(1, 0, 2)          # c2w blocks
    R0 = Rb.transpose(0, 2, 1)                                # w2c
    t0 = -np.einsum("nab,nb->na", R0, t0c.T)      # t_w2c = -R_w2c c
    f = edges[:, 0] - 1
    l = edges[:, 1] - 1

    def expm(w):
        th = np.linalg.norm(w, axis=-1, keepdims=True)[..., None]
        K = np.zeros(w.shape[:-1] + (3, 3))
        K[..., 0, 1], K[..., 0, 2] = -w[..., 2], w[..., 1]
        K[..., 1, 0], K[..., 1, 2] = w[..., 2], -w[..., 0]
        K[..., 2, 0], K[..., 2, 1] = -w[..., 1], w[..., 0]
        th = np.maximum(th, 1e-30)
        return (np.eye(3) + np.sin(th) / th * K
                + (1 - np.cos(th)) / th**2 * (K @ K))

    def resid(v):
        dw = v[:3 * N].reshape(N, 3)
        dt = v[3 * N:6 * N].reshape(N, 3)
        dp = v[6 * N:].reshape(M, 3)
        R = expm(dw) @ R0
        t = t0 + dt
        p = p0.T + dp
        x = np.einsum("eab,eb->ea", R[f], p[l]) + t[f]
        proj = x[:, :2] / x[:, 2:3]
        return (proj - obs_noisy).reshape(-1)

    sp = least_squares(resid, np.zeros(6 * N + 3 * M), method="trf",
                       xtol=1e-14, ftol=1e-14, gtol=1e-12)
    assert abs(cost_lm - sp.cost) / sp.cost < 1e-5, (cost_lm, sp.cost)
