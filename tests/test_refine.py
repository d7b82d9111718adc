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
