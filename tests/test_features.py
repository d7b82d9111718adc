"""OpenCV front-end tests on synthetic textured views."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from xmtpu.pipeline.features import (
    build_tracks,
    extract_features,
    match_exhaustive,
    match_pair,
    two_view_geometry,
)


def _texture(seed=0, size=480):
    rng = np.random.default_rng(seed)
    img = (rng.random((size, size)) * 255).astype(np.uint8)
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    return cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX)


def _rotate_view(img, K, R):
    """Warp by the infinite-homography K R K^-1 (pure rotation view change)."""
    H = K @ R @ np.linalg.inv(K)
    return cv2.warpPerspective(img, H, img.shape[::-1])


@pytest.fixture(scope="module")
def pair():
    img = _texture()
    K = np.array([[400.0, 0, 240], [0, 400.0, 240], [0, 0, 1]])
    ang = np.radians(3.0)
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0],
                  [0, 0, 1.0]])
    return img, _rotate_view(img, K, R), K, R


def test_extract_and_match(pair):
    a, b, K, R = pair
    fa = extract_features(a)
    fb = extract_features(b)
    assert len(fa.keypoints) > 200
    m = match_pair(fa, fb)
    assert len(m) > 50


def test_two_view_pose_recovered_from_points():
    """Essential-matrix pose recovery on synthetic 3-D correspondences (a
    pure-rotation image pair is degenerate for E, so use real parallax)."""
    rng = np.random.default_rng(0)
    K = np.array([[400.0, 0, 240], [0, 400.0, 240], [0, 0, 1]])
    pts = rng.normal(size=(200, 3)) * [1.0, 1.0, 0.3] + [0, 0, 6.0]
    ang = np.radians(5.0)
    R_gt = np.array([[np.cos(ang), 0, np.sin(ang)],
                     [0, 1, 0],
                     [-np.sin(ang), 0, np.cos(ang)]])
    t_gt = np.array([0.5, 0.05, 0.02])

    def project(P):
        x = P / P[:, 2:3]
        return (K @ x.T).T[:, :2]

    pa = project(pts)
    pb = project((R_gt @ pts.T).T + t_gt)
    R, t, inl = two_view_geometry(pa, pb, K)
    assert R is not None and inl.mean() > 0.9
    cos = (np.trace(R @ R_gt.T) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.5
    # translation direction up to scale
    assert abs(np.dot(t / np.linalg.norm(t), t_gt / np.linalg.norm(t_gt))) > 0.99


def test_tracks_chain_across_three_views(pair):
    a, b, K, R = pair
    c = _rotate_view(a, K, R @ R)
    feats = [extract_features(x) for x in (a, b, c)]
    matches, relposes = match_exhaustive(feats, K, verify=False)
    assert len(matches) >= 2
    images, fidx, tracks = build_tracks(matches, 3)
    # some tracks span all three views
    from collections import defaultdict
    span = defaultdict(set)
    for im, tr in zip(images, tracks):
        span[tr].add(im)
    assert any(len(s) == 3 for s in span.values())
