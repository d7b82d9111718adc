"""Global positioning (BATA) and gravity refinement tests.

Reference behavior: deps/glomap/glomap/estimators/global_positioning.cc and
gravity_refinement.cc (stages disabled in XM's truncated pipeline; xmtpu
covers the capability).
"""

import numpy as np

from xmtpu.pipeline.global_positioning import (PositionerOptions,
                                               camera_constraints,
                                               global_positioning,
                                               point_constraints)
from xmtpu.pipeline.gravity import (GravityRefinerOptions, gravity_to_ralign,
                                    refine_gravity)


def _rotmat(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def _align(est, gt):
    """similarity-align est to gt (the BATA gauge: translation + scale)."""
    est = est - est.mean(axis=0)
    gt0 = gt - gt.mean(axis=0)
    s = np.sum(est * gt0) / max(np.sum(est * est), 1e-12)
    return s * est, gt0


def test_only_points_recovers_centers():
    rng = np.random.default_rng(0)
    N, M = 12, 80
    centers = rng.normal(size=(N, 3))
    points = rng.uniform([-3, -3, 5], [3, 3, 10], size=(M, 3))
    # dense random visibility (every track comfortably >= 3 views)
    cam, trk = np.nonzero(np.ones((N, M)) * (rng.random((N, M)) < 0.8))
    d = points[trk] - centers[cam]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # world-frame bearings with identity rotations
    ci, ti, dd, keep = point_constraints(cam, trk, d, np.tile(np.eye(3), (N, 1, 1)),
                                         N, min_num_view_per_track=3)
    assert keep.all()
    out = global_positioning(ci, ti, dd, N, M,
                             opts=PositionerOptions(outer_iters=96, seed=3))
    est, gt = _align(out["positions"], centers)
    err = np.linalg.norm(est - gt, axis=1)
    scene = np.linalg.norm(gt, axis=1).mean()
    assert err.max() < 1e-3 * max(scene, 1.0), err.max()
    est_p, gt_p = _align(
        np.concatenate([out["positions"], out["points"]]),
        np.concatenate([centers, points]))
    assert np.linalg.norm(est_p - gt_p, axis=1).max() < 1e-2


def test_camera_constraints_direction_convention():
    rng = np.random.default_rng(1)
    N = 8
    centers = rng.normal(size=(N, 3)) * 2
    Rw = np.stack([_rotmat(rng.normal(size=3), rng.random()) for _ in range(N)])
    pi, pj = np.triu_indices(N, 1)
    # cam2_from_cam1 translation: t_ij = -R_j^T (c_j - c_i) in cam-j frame
    t_rel = -np.einsum("kba,kb->ka", Rw[pj].transpose(0, 2, 1),
                       (centers[pj] - centers[pi]))
    t_rel = np.einsum("kab,kb->ka", Rw[pj].transpose(0, 2, 1),
                      centers[pi] - centers[pj])
    ci, cj, d = camera_constraints(pi, pj, Rw, t_rel)
    # d should be parallel to (c_j - c_i)
    diff = centers[cj] - centers[ci]
    cross = np.linalg.norm(np.cross(d, diff), axis=1)
    assert cross.max() < 1e-10

    out = global_positioning(ci, cj, d, N, 0,
                             opts=PositionerOptions(
                                 constraint_type="ONLY_CAMERAS",
                                 outer_iters=96, seed=5))
    est, gt = _align(out["positions"], centers)
    assert np.linalg.norm(est - gt, axis=1).max() < 1e-6


def test_huber_downweights_outliers():
    rng = np.random.default_rng(2)
    N, M = 10, 60
    centers = rng.normal(size=(N, 3))
    points = rng.uniform([-3, -3, 5], [3, 3, 10], size=(M, 3))
    cam, trk = np.nonzero(rng.random((N, M)) < 0.6)
    d = points[trk] - centers[cam]
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # corrupt 5% of directions
    n_bad = len(d) // 20
    bad = rng.choice(len(d), n_bad, replace=False)
    d[bad] = rng.normal(size=(n_bad, 3))
    d[bad] /= np.linalg.norm(d[bad], axis=1, keepdims=True)
    ci, ti, dd, _ = point_constraints(cam, trk, d, np.tile(np.eye(3), (N, 1, 1)), N)
    out = global_positioning(ci, ti, dd, N, M,
                             opts=PositionerOptions(outer_iters=128, seed=7))
    est, gt = _align(out["positions"], centers)
    robust_err = np.linalg.norm(est - gt, axis=1)

    # non-robust reference: huge Huber delta = plain least squares
    out_ls = global_positioning(ci, ti, dd, N, M,
                                opts=PositionerOptions(outer_iters=128, seed=7,
                                                       huber_delta=1e9))
    est_ls, gt_ls = _align(out_ls["positions"], centers)
    ls_err = np.linalg.norm(est_ls - gt_ls, axis=1)

    # Huber bounds the outliers' influence: clearly better than plain LS
    assert np.median(robust_err) < 0.05
    assert robust_err.max() < 0.6 * ls_err.max(), (robust_err.max(),
                                                   ls_err.max())


def test_short_tracks_dropped():
    cam = np.array([0, 1, 2, 0, 1])
    trk = np.array([0, 0, 0, 1, 1])  # track 1 has 2 views < 3
    d = np.ones((5, 3))
    ci, ti, dd, keep = point_constraints(cam, trk, d, np.tile(np.eye(3), (3, 1, 1)), 3)
    assert keep.tolist() == [True, False]
    assert len(ci) == 3
    assert (ti == 3).all()


# ---------------------------------------------------------------- gravity

def test_gravity_to_ralign_column():
    g = np.array([0.3, -0.8, 0.5])
    R = gravity_to_ralign(g)
    assert np.allclose(R[:, 1], g / np.linalg.norm(g))
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(R) > 0


def test_refine_gravity_fixes_corrupted_image():
    rng = np.random.default_rng(3)
    N = 10
    g_world = np.array([0.0, 1.0, 0.0])
    Rws = np.stack([_rotmat(rng.normal(size=3), rng.random()) for _ in range(N)])
    G = np.einsum("nab,b->na", Rws, g_world)  # camera-frame gravities
    pi, pj = np.triu_indices(N, 1)
    R_rel = Rws[pj] @ Rws[pi].transpose(0, 2, 1)

    G_noisy = G.copy()
    G_noisy[4] = _rotmat([1.0, 0.2, 0.1], 0.5) @ G[4]  # ~28 deg off

    G_out, refined, prone = refine_gravity(pi, pj, R_rel, G_noisy)
    assert prone[4] and refined[4]
    assert not prone[np.arange(N) != 4].any()
    err = np.degrees(np.arccos(np.clip(G_out[4] @ G[4], -1, 1)))
    assert err < 0.1, err
    # untouched images unchanged
    assert np.allclose(G_out[:4], G[:4])


def test_refine_gravity_rejects_when_neighbors_disagree():
    rng = np.random.default_rng(4)
    N = 9
    Rws = np.stack([_rotmat(rng.normal(size=3), rng.random()) for _ in range(N)])
    G = np.einsum("nab,b->na", Rws, np.array([0.0, 1.0, 0.0]))
    pi, pj = np.triu_indices(N, 1)
    # garbage relative rotations -> neighbor observations disagree wildly
    R_rel = np.stack([_rotmat(rng.normal(size=3), rng.uniform(0.5, 3.0))
                      for _ in range(len(pi))])
    G_out, refined, prone = refine_gravity(
        pi, pj, R_rel, G, opts=GravityRefinerOptions(min_num_neighbors=5))
    # nothing should be accepted: no consensus to refine toward
    assert not refined.any()
    assert np.allclose(G_out, G / np.linalg.norm(G, axis=1, keepdims=True))
