"""View-graph processor tests (pair inlier counting + filters).

Reference behavior: deps/glomap/glomap/processors/image_pair_inliers.cc,
relpose_filter.cc, math/two_view_geometry.cc.
"""

import numpy as np

from xmtpu.pipeline.viewgraph import (InlierThresholds, check_cheirality,
                                      essential_from_motion,
                                      filter_pairs_by_inliers, pair_inliers,
                                      sampson_error)


def _rotmat(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def _make_pair(n=200, n_out=20, seed=0):
    rng = np.random.default_rng(seed)
    R = _rotmat([0.1, 1.0, 0.2], 0.4)
    t = np.array([1.0, 0.1, 0.2])
    X = rng.uniform([-2, -2, 3], [2, 2, 8], size=(n, 3))
    b1 = X / np.linalg.norm(X, axis=1, keepdims=True)
    X2 = X @ R.T + t
    b2 = X2 / np.linalg.norm(X2, axis=1, keepdims=True)
    if n_out:
        # corrupt the last n_out matches
        junk = rng.normal(size=(n_out, 3))
        junk[:, 2] = np.abs(junk[:, 2]) + 0.5
        b2[-n_out:] = junk / np.linalg.norm(junk, axis=1, keepdims=True)
    return R, t, b1, b2


def test_epipolar_constraint_and_sampson():
    R, t, b1, b2 = _make_pair(n_out=0)
    E = essential_from_motion(R, t)
    resid = np.abs(np.einsum("ni,ij,nj->n", b2, E, b1))
    assert resid.max() < 1e-12
    assert sampson_error(E, b1, b2).max() < 1e-20


def test_cheirality_separates_forward_points():
    R, t, b1, b2 = _make_pair(n_out=0)
    ok = check_cheirality(R, t, b1, b2)
    assert ok.all()
    # rays pointing away fail
    assert not check_cheirality(R, t, -b1, b2).any()


def test_pair_inliers_counts_outliers():
    R, t, b1, b2 = _make_pair(n=200, n_out=30)
    inl, score = pair_inliers(R, t, b1, b2, 500.0, 500.0)
    assert inl[:170].mean() > 0.95
    assert inl[170:].mean() < 0.2
    assert score > 0.0


def test_filter_pairs_by_inliers_defaults():
    # glomap defaults: min_inlier_num=30, min_inlier_ratio=0.25
    keep = filter_pairs_by_inliers([100, 29, 100, 10], [200, 40, 500, 20])
    assert keep.tolist() == [True, False, False, False]


def test_threshold_scales_with_focal():
    R, t, b1, b2 = _make_pair(n_out=0, seed=3)
    # add 1-pixel-ish noise at f=500 in normalized space
    rng = np.random.default_rng(4)
    b2n = b2 + rng.normal(scale=1.0 / 500.0, size=b2.shape) * 0.4
    b2n /= np.linalg.norm(b2n, axis=1, keepdims=True)
    inl_tight, _ = pair_inliers(R, t, b1, b2n, 5000.0, 5000.0)
    inl_loose, _ = pair_inliers(R, t, b1, b2n, 200.0, 200.0)
    assert inl_loose.sum() > inl_tight.sum()
