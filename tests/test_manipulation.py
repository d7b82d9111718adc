"""Tests for track filters, normalization, and view-graph manipulation.

Covers the glomap processors ported in xmtpu/pipeline/{track_filter,
normalize,manipulation}.py (reference: deps/glomap/glomap/processors/
track_filter.cc, reconstruction_normalizer.cc, reconstruction_pruning.cc,
view_graph_manipulation.cc, math/tree.cc).
"""

import numpy as np
import pytest

from xmtpu.pipeline import manipulation as vm
from xmtpu.pipeline.normalize import normalize_reconstruction
from xmtpu.pipeline import track_filter as tf


def _synthetic_scene(rng, n_cams=6, n_pts=40):
    """Cameras on a ring looking at points near the origin."""
    angles = np.linspace(0, 2 * np.pi, n_cams, endpoint=False)
    centers = np.stack([3 * np.cos(angles), 3 * np.sin(angles),
                        0.3 * rng.standard_normal(n_cams)], axis=1)
    R = np.zeros((n_cams, 3, 3))
    for i, c in enumerate(centers):
        z = -c / np.linalg.norm(c)                      # look at origin
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R[i] = np.stack([x, y, z], axis=0)
    t = -np.einsum("nab,nb->na", R, centers)
    pts = 0.5 * rng.standard_normal((n_pts, 3))
    edges = np.array([(i, j) for i in range(n_cams) for j in range(n_pts)])
    return R, t, centers, pts, edges


def test_reprojection_filter_keeps_perfect_drops_perturbed():
    rng = np.random.default_rng(0)
    R, t, _, pts, edges = _synthetic_scene(rng)
    pc = np.einsum("eab,eb->ea", R[edges[:, 0]], pts[edges[:, 1]]) \
        + t[edges[:, 0]]
    feats = pc / pc[:, 2:3]
    bad = rng.random(len(edges)) < 0.2
    feats[bad, :2] += 0.1
    keep = tf.filter_tracks_by_reprojection(edges, feats, R, t, pts, 1e-3)
    assert keep[~bad].all()
    assert not keep[bad].any()


def test_reprojection_filter_pixel_space():
    from xmtpu.pipeline.undistort import Camera, distort

    rng = np.random.default_rng(1)
    R, t, _, pts, edges = _synthetic_scene(rng)
    cam = Camera(model="SIMPLE_RADIAL", width=640, height=480,
                 params=[500.0, 320.0, 240.0, 0.05])
    pc = np.einsum("eab,eb->ea", R[edges[:, 0]], pts[edges[:, 1]]) \
        + t[edges[:, 0]]
    uv = distort(cam, pc[:, :2] / pc[:, 2:3])
    bad = rng.random(len(edges)) < 0.2
    uv[bad] += 5.0
    keep = tf.filter_tracks_by_reprojection(
        edges, uv, R, t, pts, 1.0, cameras={0: cam},
        camera_of_frame=np.zeros(len(R), dtype=int),
        in_normalized_image=False)
    assert keep[~bad].all()
    assert not keep[bad].any()


def test_angle_filter_uncalibrated_threshold_is_looser():
    rng = np.random.default_rng(2)
    R, t, _, pts, edges = _synthetic_scene(rng)
    pc = np.einsum("eab,eb->ea", R[edges[:, 0]], pts[edges[:, 1]]) \
        + t[edges[:, 0]]
    bearings = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    # rotate every bearing by ~1.5 degrees about x
    a = np.radians(1.5)
    rot = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                    [0, np.sin(a), np.cos(a)]])
    bearings = bearings @ rot.T
    keep_cal = tf.filter_tracks_by_angle(edges, bearings, R, t, pts, 1.0)
    keep_unc = tf.filter_tracks_by_angle(
        edges, bearings, R, t, pts, 1.0,
        has_prior_focal=np.zeros(len(R), dtype=bool))
    # 1.5 deg error: fails the 1-deg calibrated gate, passes the 2-deg one
    assert not keep_cal.any()
    assert keep_unc.all()


def test_triangulation_angle_filter():
    # two cameras with a wide baseline see point A; point B is seen twice
    # from nearly the same spot -> tiny triangulation angle
    R = np.tile(np.eye(3), (3, 1, 1))
    centers = np.array([[0.0, 0, 0], [2.0, 0, 0], [0.01, 0, 0]])
    t = -np.einsum("nab,nb->na", R, centers)
    xyz = np.array([[1.0, 0, 4.0], [0.0, 0, 4.0]])
    edges = np.array([[0, 0], [1, 0], [0, 1], [2, 1]])
    keep_obs, keep_track = tf.filter_track_triangulation_angle(
        edges, R, t, xyz, min_angle_deg=1.0)
    assert keep_track[0] and not keep_track[1]
    assert keep_obs.tolist() == [True, True, False, False]


def test_normalize_reconstruction_extent_and_center():
    rng = np.random.default_rng(3)
    R, t, centers, pts, _ = _synthetic_scene(rng, n_cams=20)
    Rn, tn, pn, tform = normalize_reconstruction(R, t, points=pts,
                                                 extent=10.0)
    cn = -np.einsum("nba,nb->na", Rn, tn)
    # robust bbox diagonal == extent
    coords = np.sort(cn, axis=0)
    P0, P1 = int(0.1 * 19), int(0.9 * 19)
    diag = np.linalg.norm(coords[P1] - coords[P0])
    assert diag == pytest.approx(10.0, rel=1e-9)
    # trimmed mean at origin
    assert np.abs(coords[P0:P1 + 1].mean(axis=0)).max() < 1e-9
    # points transformed consistently: camera->point vectors scale uniformly
    d_old = np.linalg.norm(pts[0] - centers[0])
    d_new = np.linalg.norm(pn[0] - cn[0])
    assert d_new / d_old == pytest.approx(tform.scale, rel=1e-9)


def test_keep_largest_component_and_mark():
    # two components: {0,1,2} (triangle) and {3,4}
    pairs = np.array([[0, 1], [1, 2], [0, 2], [3, 4]])
    valid = np.ones(4, dtype=bool)
    reg, vnew, n = vm.keep_largest_connected_component(pairs, valid, 6)
    assert n == 3
    assert reg.tolist() == [True, True, True, False, False, False]
    assert vnew.tolist() == [True, True, True, False]
    cluster, num = vm.mark_connected_components(pairs, valid, 6,
                                                min_num_img=2)
    assert num == 2
    assert cluster[0] == cluster[1] == cluster[2] == 0
    assert cluster[3] == cluster[4] == 1
    assert cluster[5] == -1


def test_sparsify_keeps_low_degree_edges():
    rng = np.random.default_rng(4)
    n = 30
    pairs = np.array([(i, j) for i in range(n) for j in range(i + 1, n)])
    valid = np.ones(len(pairs), dtype=bool)
    reg, vnew, chosen = vm.sparsify_graph(pairs, valid, n,
                                          expected_degree=5,
                                          rng=np.random.default_rng(0))
    assert chosen < len(pairs)          # actually sparsified
    assert reg.all()                    # stays connected on one component
    # a chain graph is never sparsified (all degrees <= expected)
    chain = np.array([(i, i + 1) for i in range(n - 1)])
    _, vchain, _ = vm.sparsify_graph(chain, np.ones(n - 1, bool), n,
                                     expected_degree=5)
    assert vchain.all()


def test_establish_strong_clusters_merges_via_moderate_edges():
    # clusters {0,1} and {2,3} strongly intra-connected; joined by two
    # moderate edges -> must merge (view_graph_manipulation.cc:92-148)
    pairs = np.array([[0, 1], [2, 3], [1, 2], [0, 3]])
    weights = np.array([100.0, 100.0, 80.0, 80.0])
    valid = np.ones(4, dtype=bool)
    cluster, vnew, num = vm.establish_strong_clusters(
        pairs, valid, weights, 4, min_thres=90.0, min_num_images=2)
    assert num == 1
    assert (cluster == 0).all()
    assert vnew.all()
    # with only ONE moderate bridge the clusters stay separate
    weights2 = np.array([100.0, 100.0, 80.0, 10.0])
    cluster2, vnew2, num2 = vm.establish_strong_clusters(
        pairs, valid, weights2, 4, min_thres=90.0, min_num_images=2)
    assert num2 == 2
    assert cluster2[0] == cluster2[1]
    assert cluster2[2] == cluster2[3]
    assert cluster2[0] != cluster2[2]
    assert not vnew2[2] and not vnew2[3]


def test_update_image_pairs_config_majority_vote():
    # camera 0+1 mostly calibrated pairs -> promote their UNCALIBRATED pair
    pairs = np.array([[0, 1], [0, 2], [1, 2], [0, 3]])
    config = np.array([vm.CALIBRATED, vm.CALIBRATED, vm.CALIBRATED,
                       vm.UNCALIBRATED])
    valid = np.ones(4, dtype=bool)
    # image 3 shares camera 1: both cameras of pair [0,3] have a >50%
    # calibrated majority, so the pair is promoted
    cam_of = np.array([0, 1, 2, 1])
    prior = np.ones(3, dtype=bool)
    new, promoted = vm.update_image_pairs_config(pairs, valid, config,
                                                 cam_of, prior)
    assert promoted.tolist() == [False, False, False, True]
    assert new[3] == vm.CALIBRATED
    # a camera seen only in UNCALIBRATED pairs can never be promoted
    # (view_graph_manipulation.cc:203-210)
    cam_of2 = np.array([0, 1, 2, 3])
    new2, promoted2 = vm.update_image_pairs_config(
        pairs, valid, config, cam_of2, np.ones(4, dtype=bool))
    assert not promoted2.any()


def test_pose_from_essential_recovers_motion():
    from xmtpu.pipeline.viewgraph import essential_from_motion

    rng = np.random.default_rng(5)
    a = np.radians(10.0)
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]])
    t = np.array([1.0, 0.2, 0.1])
    t /= np.linalg.norm(t)
    X = rng.standard_normal((50, 3)) * 0.5 + np.array([0, 0, 4.0])
    b1 = X / np.linalg.norm(X, axis=1, keepdims=True)
    X2 = X @ R.T + t
    b2 = X2 / np.linalg.norm(X2, axis=1, keepdims=True)
    E = essential_from_motion(R, t)
    R_est, t_est, votes = vm.pose_from_essential(E, b1, b2)
    assert votes >= 45
    assert np.allclose(R_est, R, atol=1e-6)
    assert np.allclose(t_est, t, atol=1e-6)


def test_maximum_spanning_tree_prefers_heavy_edges():
    # square 0-1-2-3 with a weak diagonal; MST from 0 must use the heavy
    # edges only
    pairs = np.array([[0, 1], [1, 2], [2, 3], [0, 3], [0, 2]])
    weights = np.array([10.0, 10.0, 10.0, 10.0, 1.0])
    parents = vm.maximum_spanning_tree(pairs, np.ones(5, bool), weights, 4,
                                       root=0)
    assert parents[0] == 0
    assert parents[2] != 0          # weak diagonal not used
    assert set(parents[1:].tolist()) <= {0, 1, 2, 3}


def test_prune_weakly_connected_images():
    rng = np.random.default_rng(6)
    # images 0..3 share many tracks; image 4 shares only a couple
    edges = []
    for tr in range(40):
        for i in range(4):
            edges.append((i, tr))
    for tr in range(40, 43):
        edges.append((4, tr))
        edges.append((0, tr))
        edges.append((1, tr))
    cluster, num = vm.prune_weakly_connected_images(np.array(edges), 5)
    assert num >= 1
    assert cluster[0] == cluster[1] == cluster[2] == cluster[3] == 0
    assert cluster[4] == -1
