"""Bundle adjustment + retriangulation tests (reference stages 5-8,
global_mapper.cc:188-390, disabled there; estimators
bundle_adjustment.{h,cc} and track_retriangulation.{h,cc}).

Fake-backend pattern per SURVEY.md section 4: synthetic ring scenes with
known poses/points, perturb, solve, assert error bounds.
"""

import numpy as np
import pytest

from xmtpu.pipeline.bundle_adjustment import (BundleAdjusterOptions,
                                              bundle_adjustment,
                                              generic_params,
                                              run_bundle_adjustment)
from xmtpu.pipeline.triangulation import (TriangulatorOptions,
                                          retriangulate, triangulate_tracks)
from xmtpu.pipeline.undistort import Camera


def _rig(rng, n_cams=8, n_pts=40, radius=4.0):
    """Cameras on a ring looking at the origin; all points in front."""
    angles = np.linspace(0, 2 * np.pi, n_cams, endpoint=False)
    centers = np.stack([radius * np.cos(angles), radius * np.sin(angles),
                        1.0 + 0.1 * rng.standard_normal(n_cams)], axis=1)
    R = np.zeros((n_cams, 3, 3))
    for i, c in enumerate(centers):
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 0.0, 1.0], z)
        x /= np.linalg.norm(x)
        R[i] = np.stack([x, np.cross(z, x), z], axis=0)
    t = -np.einsum("nab,nb->na", R, centers)
    pts = rng.uniform(-1, 1, (n_pts, 3))
    i_idx = np.repeat(np.arange(n_cams), n_pts)
    j_idx = np.tile(np.arange(n_pts), n_cams)
    x_cam = np.einsum("eab,eb->ea", R[i_idx], pts[j_idx]) + t[i_idx]
    assert (x_cam[:, 2] > 0.5).all()
    return R, t, pts, i_idx, j_idx, x_cam


def _pixels(x_cam, cam_params, k=None):
    xy = x_cam[:, :2] / x_cam[:, 2:3]
    if k is not None:
        r2 = (xy ** 2).sum(1)
        xy = xy * (1 + r2 * (k[0] + k[1] * r2))[:, None]
    return cam_params[:2] * xy + cam_params[2:4]


def _perturb_rot(R, rng, scale):
    from xmtpu.pipeline.refine import _expm_so3
    import jax.numpy as jnp
    dw = rng.normal(scale=scale, size=(len(R), 3))
    return np.asarray(_expm_so3(jnp.asarray(dw)) @ R)


def test_ba_recovers_perturbed_scene():
    rng = np.random.default_rng(0)
    R, t, pts, i, j, x_cam = _rig(rng)
    cam = np.array([[500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]])
    uv = _pixels(x_cam, cam[0])

    Rp = _perturb_rot(R, rng, 0.02)
    tp = t + rng.normal(scale=0.05, size=t.shape)
    xp = pts + rng.normal(scale=0.05, size=pts.shape)

    res = bundle_adjustment(
        i, uv, j, Rp, tp, xp, cam, np.zeros(len(R), int),
        BundleAdjusterOptions(optimize_intrinsics=False, max_iterations=60))
    assert res.success
    assert res.cost_final < 1e-10 * res.cost_initial
    # gauge: first image pose must not move
    np.testing.assert_allclose(res.R[i[0]], Rp[i[0]], atol=1e-12)
    np.testing.assert_allclose(res.t[i[0]], tp[i[0]], atol=1e-12)


def test_ba_huber_downweights_outliers():
    rng = np.random.default_rng(1)
    R, t, pts, i, j, x_cam = _rig(rng)
    cam = np.array([[500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]])
    uv = _pixels(x_cam, cam[0])
    out = rng.choice(len(uv), 15, replace=False)
    uv_noisy = uv.copy()
    uv_noisy[out] += rng.normal(scale=300.0, size=(15, 2))

    xp = pts + rng.normal(scale=0.03, size=pts.shape)
    res = bundle_adjustment(
        i, uv_noisy, j, R, t, xp, cam, np.zeros(len(R), int),
        BundleAdjusterOptions(optimize_rotations=False,
                              optimize_translation=False,
                              optimize_intrinsics=False, max_iterations=80))
    # inlier reprojections must be tight despite the gross outliers
    x_c = np.einsum("eab,eb->ea", R[i], res.xyz[j]) + t[i]
    uv_hat = _pixels(x_c, cam[0])
    inl = np.ones(len(uv), bool)
    inl[out] = False
    assert np.median(np.linalg.norm(uv_hat[inl] - uv[inl], axis=1)) < 0.1


def test_ba_intrinsics_recovery():
    rng = np.random.default_rng(2)
    R, t, pts, i, j, x_cam = _rig(rng, n_cams=10, n_pts=60)
    cam_gt = np.array([500.0, 500.0, 320.0, 240.0, 0.05, -0.01, 0, 0])
    uv = _pixels(x_cam, cam_gt, k=cam_gt[4:6])

    cam0 = cam_gt.copy()
    cam0[:2] = 520.0
    cam0[4:] = 0.0
    res = bundle_adjustment(
        i, uv, j, R, t, pts.copy(), cam0[None], np.zeros(len(R), int),
        BundleAdjusterOptions(max_iterations=100))
    assert res.cost_final < 1e-6
    # focal and radial terms recovered (poses/points free, so up to gauge;
    # projection equality is the meaningful check)
    x_c = np.einsum("eab,eb->ea", res.R[i], res.xyz[j]) + res.t[i]
    uv_hat = _pixels(x_c, res.cam_params[0], k=res.cam_params[0, 4:6])
    assert np.abs(uv_hat - uv).max() < 1e-3


def test_run_bundle_adjustment_staged():
    rng = np.random.default_rng(3)
    R, t, pts, i, j, x_cam = _rig(rng)
    cam = np.array([[500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]])
    uv = _pixels(x_cam, cam[0]) + rng.normal(scale=0.2, size=(len(i), 2))

    Rp = _perturb_rot(R, rng, 0.01)
    tp = t + rng.normal(scale=0.02, size=t.shape)
    xp = pts + rng.normal(scale=0.02, size=pts.shape)
    alive, R2, t2, x2, c2 = run_bundle_adjustment(
        i, uv, j, Rp, tp, xp, cam, np.zeros(len(R), int),
        opts=BundleAdjusterOptions(optimize_intrinsics=False,
                                   max_iterations=40))
    assert alive.sum() > 0.8 * len(alive)
    x_c = np.einsum("eab,eb->ea", R2[i[alive]], x2[j[alive]]) + t2[i[alive]]
    uv_hat = _pixels(x_c, c2[0])
    # residuals at the noise floor
    assert np.median(np.linalg.norm(uv_hat - uv[alive], axis=1)) < 1.0


def test_generic_params_models():
    cam = Camera(model="OPENCV",
                 params=[500.0, 510.0, 320.0, 240.0, 0.1, -0.05, 1e-3, -2e-3],
                 width=640, height=480)
    p = generic_params(cam)
    np.testing.assert_allclose(
        p, [500.0, 510.0, 320.0, 240.0, 0.1, -0.05, 1e-3, -2e-3])
    fisheye = Camera(model="OPENCV_FISHEYE",
                     params=[500.0, 500.0, 320.0, 240.0, 0.1, 0, 0, 0],
                     width=640, height=480)
    with pytest.raises(ValueError):
        generic_params(fisheye)


def test_triangulate_tracks_exact():
    rng = np.random.default_rng(4)
    R, t, pts, i, j, x_cam = _rig(rng)
    xy = x_cam[:, :2] / x_cam[:, 2:3]
    xyz, valid = triangulate_tracks(i, j, xy, R, t, len(pts))
    assert valid.all()
    np.testing.assert_allclose(xyz, pts, atol=1e-9)
    # a track with a single observation is invalid
    xyz1, valid1 = triangulate_tracks(i[:1], j[:1], xy[:1], R, t, len(pts))
    assert not valid1[j[0]]


def test_retriangulate_rejects_outliers():
    rng = np.random.default_rng(5)
    R, t, pts, i, j, x_cam = _rig(rng)
    cam = np.array([[500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0]])
    uv = _pixels(x_cam, cam[0]) + rng.normal(scale=0.5, size=(len(i), 2))
    out = rng.choice(len(uv), 20, replace=False)
    uv[out] += rng.normal(scale=200.0, size=(20, 2))

    res = retriangulate(i, uv, j, R, t, cam, np.zeros(len(R), int),
                        TriangulatorOptions())
    assert res.keep_obs[out].sum() == 0
    inl = np.ones(len(uv), bool)
    inl[out] = False
    assert res.keep_obs[inl].mean() > 0.8
    good = res.valid
    assert good.sum() > 0.8 * len(pts)
    assert np.abs(res.xyz[good] - pts[good]).max() < 0.05


def test_global_mapper_full_stages(tmp_path):
    """Stages 0-8 end to end on a synthetic database (the upstream-GLOMAP
    flow the XM fork disables)."""
    import test_colmap_db as tdb
    from xmtpu.pipeline import colmap_db as cdb
    from xmtpu.pipeline.global_mapper import (GlobalMapperOptions,
                                              global_mapper_solve)

    rng = np.random.default_rng(6)
    f, w, h = 500.0, 640, 480
    R, t, pts, keypoints, K = tdb._ring_scene(rng)
    db_path = tmp_path / "database.db"
    tdb._write_scene_db(db_path, R, t, keypoints, f, w, h)
    vg = cdb.database_to_view_graph(cdb.read_database(str(db_path)))

    opts = GlobalMapperOptions(
        skip_global_positioning=False,
        skip_bundle_adjustment=False,
        skip_retriangulation=False,
        skip_pruning=False,
        bundle=BundleAdjusterOptions(optimize_intrinsics=False,
                                     max_iterations=40))
    res = global_mapper_solve(vg, opts)
    assert res.R_global is not None and res.xyz is not None
    assert res.registered.sum() == len(R)
    # rotations: compare up to a global rotation (gauge)
    good = np.isfinite(res.xyz).all(axis=1)
    assert good.sum() > 0.8 * res.n_tracks
    # reprojection consistency of the final model
    i, j = res.obs_image, res.obs_track
    x_c = (np.einsum("eab,eb->ea", res.R_global[i], res.xyz[j])
           + res.t_global[i])
    assert (x_c[:, 2] > 0).all()
    xy = x_c[:, :2] / x_c[:, 2:3]
    uv_hat = f * xy + np.array([w / 2, h / 2])
    err = np.linalg.norm(uv_hat - res.obs_xy, axis=1)
    assert np.median(err) < 1.0
