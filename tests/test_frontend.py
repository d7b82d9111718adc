"""Front-end adapter tests: tempdata parsing, view graph, depth lifting,
relpose filter, visualization export."""

import numpy as np

from xmtpu.pipeline.frontend import (
    build_view_graph,
    lift_depth,
    parse_glomap_tempdata,
    quat2rot,
)
from xmtpu.pipeline.relpose_filter import relpose_filter
from xmtpu.pipeline.synthetic import make_scene
from xmtpu.pipeline.visualization import export_ply


def test_quat2rot_identity_and_orthonormal():
    np.testing.assert_allclose(quat2rot(1, 0, 0, 0), np.eye(3), atol=1e-15)
    R = quat2rot(0.7, 0.1, -0.3, 0.2)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(R) > 0


def test_parse_glomap_tempdata(tmp_path):
    (tmp_path / "output.txt").write_text(
        "1 10.5 20.5 1\n1 30.0 40.0 2\n2 11.0 21.0 1\n2 50.0 60.0 3\n")
    (tmp_path / "filename.txt").write_text("2 b.jpg\n1 a.jpg\n")
    (tmp_path / "relative_pose.txt").write_text(
        "1 2 1 0 0 0 0.1 0.2 0.3\n")
    exp = parse_glomap_tempdata(str(tmp_path))
    assert exp.N == 2 and exp.M == 3
    assert exp.filenames[0] == "a.jpg" and exp.filenames[1] == "b.jpg"
    R, t = exp.relposes[(1, 2)]
    np.testing.assert_allclose(R, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(t, [0.1, 0.2, 0.3])

    vg = build_view_graph(exp.matches)
    assert len(vg.frame) == 4
    assert vg.N == 2 and vg.M == 3


def test_build_view_graph_dedupes():
    m = np.array([[1, 5.0, 6.0, 1], [1, 5.5, 6.5, 1], [2, 1.0, 2.0, 2]])
    vg = build_view_graph(m)
    assert len(vg.frame) == 2  # duplicate (1,1) collapsed


def test_lift_depth():
    K = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
    depth = np.zeros((80, 100))
    depth[40, 50] = 2.0     # principal point, depth 2
    depth[10, 20] = 0.0     # invalid depth -> dropped
    conf = np.full_like(depth, 0.5)
    pts, w, tr = lift_depth([50, 20], [40, 10], [7, 8], depth, conf, K)
    assert pts.shape == (1, 3)
    np.testing.assert_allclose(pts[0], [0, 0, 2.0], atol=1e-12)
    np.testing.assert_allclose(w, [0.25])
    assert tr.tolist() == [7]


def test_relpose_filter_flags_planted_outliers():
    scene = make_scene(n_cameras=6, n_points=50, obs_per_camera=40,
                       noise=1e-4, seed=60)
    rng = np.random.default_rng(1)
    E = len(scene.edges)
    bad = rng.choice(E, size=6, replace=False)
    landmarks = scene.landmarks.copy()
    landmarks[bad] += rng.normal(size=(len(bad), 3)) * 10.0

    # GT relative poses in the filter's convention: maps camera-i coords to
    # camera-j coords (up to the per-camera scale the filter estimates):
    # x_j = R_ji x_i + t  with R_ji = R_j^T R_i (c2w blocks)
    relposes = {}
    for i in range(scene.N):
        for j in range(i + 1, scene.N):
            R_ji = scene.R_gt[j].T @ scene.R_gt[i]
            relposes[(i + 1, j + 1)] = (R_ji, np.zeros(3))

    e2, w2, l2, r2 = relpose_filter(scene.edges, scene.weights, landmarks,
                                    scene.rgbs, relposes, verbose=False)
    removed = E - len(e2)
    assert removed >= 1
    # the planted outlier observations must be gone
    kept_rows = set(map(tuple, np.column_stack([e2, l2]).tolist()))
    for b in bad:
        row = tuple(np.concatenate([scene.edges[b], landmarks[b]]).tolist())
        assert row not in kept_rows


def test_export_ply(tmp_path):
    ext = np.eye(4)
    export_ply(str(tmp_path / "viz"), [ext], points=np.zeros((5, 3)))
    cams = (tmp_path / "viz_cameras.ply").read_text()
    pts = (tmp_path / "viz_points.ply").read_text()
    assert "element vertex 5" in pts
    assert "element edge 8" in cams
