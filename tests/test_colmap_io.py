"""COLMAP text-model export, gravity I/O, tempdata roundtrip, mapper CLI.

Covers xmtpu/pipeline/colmap_io.py (reference:
deps/glomap/glomap/io/colmap_io.cc, gravity_io.cc) and the
global_mapper tempdata export (controllers/global_mapper.cc:134-184).
"""

import numpy as np
import pytest

from xmtpu.pipeline import colmap_io as cio
from xmtpu.pipeline.undistort import Camera


def _random_rotations(rng, n):
    R = []
    for _ in range(n):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        R.append(q)
    return np.stack(R)


def test_rot2quat_roundtrip():
    from xmtpu.pipeline.frontend import quat2rot

    rng = np.random.default_rng(0)
    for R in _random_rotations(rng, 20):
        q = cio.rot2quat(R)
        assert q[0] >= 0
        np.testing.assert_allclose(quat2rot(*q), R, atol=1e-12)


def test_write_colmap_model_roundtrip(tmp_path):
    from xmtpu.pipeline.datasets import (load_camera_models,
                                         load_image_data)

    rng = np.random.default_rng(1)
    N, M = 5, 12
    R = _random_rotations(rng, N)
    t = rng.standard_normal((N, 3))
    pts = rng.standard_normal((M, 3))
    names = [f"frame{i}.png" for i in range(N)]
    cams = {1: Camera("PINHOLE", [500.0, 510.0, 320.0, 240.0],
                      width=640, height=480)}
    # every point seen by 3 images (tracks of length 3 survive the
    # length-2 cut, colmap_converter.cc:85)
    edges = np.array([(i, j) for j in range(M) for i in (0, 1, 2)])
    xy = rng.random((len(edges), 2)) * 100

    cio.write_colmap_model(str(tmp_path), cams, R, t, names,
                           points=pts, obs_edges=edges, obs_xy=xy)

    cams2 = load_camera_models(str(tmp_path / "cameras.txt"))
    assert cams2[1].model == "PINHOLE"
    np.testing.assert_allclose(cams2[1].params, cams[1].params)

    imgs = load_image_data(str(tmp_path / "images.txt"))
    assert set(imgs) == set(names)
    for i, name in enumerate(names):
        _, cam_id, quat, tt = imgs[name]
        from xmtpu.pipeline.frontend import quat2rot
        np.testing.assert_allclose(quat2rot(*quat), R[i], atol=1e-12)
        np.testing.assert_allclose(tt, t[i], atol=1e-12)

    # points3D parse: id x y z rgb error track...
    lines = [ln for ln in open(tmp_path / "points3D.txt")
             if not ln.startswith("#")]
    assert len(lines) == M
    first = lines[0].split()
    j = int(first[0]) - 1
    np.testing.assert_allclose([float(v) for v in first[1:4]], pts[j])
    assert len(first[8:]) == 6            # 3 track elements (image, idx)


def test_unregistered_images_skipped(tmp_path):
    rng = np.random.default_rng(2)
    R = _random_rotations(rng, 3)
    t = rng.standard_normal((3, 3))
    cams = {1: Camera("SIMPLE_PINHOLE", [500.0, 320.0, 240.0], 640, 480)}
    cio.write_colmap_model(str(tmp_path), cams, R, t,
                           ["a.png", "b.png", "c.png"],
                           registered=np.array([True, False, True]))
    from xmtpu.pipeline.datasets import load_image_data
    imgs = load_image_data(str(tmp_path / "images.txt"))
    assert set(imgs) == {"a.png", "c.png"}


def test_gravity_roundtrip(tmp_path):
    names = ["x.png", "y.png", "z.png"]
    g = {0: np.array([0.0, 9.8, 0.1]), 2: np.array([0.1, 9.7, 0.0])}
    path = tmp_path / "gravity.txt"
    cio.write_gravity(str(path), names, g)
    out = cio.read_gravity(str(path), names)
    assert set(out) == {0, 2}
    np.testing.assert_allclose(out[0], g[0])
    np.testing.assert_allclose(out[2], g[2])
    # unknown names are skipped (gravity_io.cc:33-40)
    out2 = cio.read_gravity(str(path), ["x.png", "other.png"])
    assert set(out2) == {0}


def test_mapper_cli_and_tempdata_roundtrip(tmp_path):
    """database.db -> `python -m xmtpu mapper` -> parse_glomap_tempdata."""
    from tests.test_colmap_db import _ring_scene, _write_scene_db

    from xmtpu.__main__ import main
    from xmtpu.pipeline.frontend import parse_glomap_tempdata

    rng = np.random.default_rng(3)
    f, w, h = 500.0, 640, 480
    R, t, pts, keypoints, K = _ring_scene(rng, n_cams=6, n_pts=30)
    db = tmp_path / "database.db"
    _write_scene_db(db, R, t, keypoints, f, w, h)
    out_dir = tmp_path / "tempdata"

    rc = main(["mapper", "--database_path", str(db),
               "--output_path", str(out_dir), "--quiet"])
    assert rc == 0

    exp = parse_glomap_tempdata(str(out_dir))
    assert exp.N == 6
    assert exp.M >= 25                    # tracks survive selection
    assert len(exp.filenames) == 6
    assert exp.filenames[0] == "img000.png"
    # relative poses match ground truth (1-based ids)
    R12, t12 = exp.relposes[(1, 2)]
    R_gt = R[1] @ R[0].T
    np.testing.assert_allclose(R12, R_gt, atol=1e-4)
    # observations carry the database's pixel coordinates verbatim
    all_kp = np.concatenate(keypoints)
    assert exp.matches[:, 1].max() <= all_kp[:, 0].max() + 1e-3
    assert exp.matches[:, 2].max() <= all_kp[:, 1].max() + 1e-3


def test_mapper_cli_namespaced_flags(tmp_path):
    """The reference driver's exact glomap invocation style
    (3_test_colmap_glomap.py:103-110 passes --image_path and
    --TrackEstablishment.max_num_view_per_track) must work verbatim,
    including the boost-program-options namespaced flags
    (option_manager.cc:60-240)."""
    from tests.test_colmap_db import _ring_scene, _write_scene_db

    from xmtpu.__main__ import main
    from xmtpu.pipeline.frontend import parse_glomap_tempdata

    rng = np.random.default_rng(4)
    f, w, h = 500.0, 640, 480
    R, t, pts, keypoints, K = _ring_scene(rng, n_cams=6, n_pts=30)
    db = tmp_path / "database.db"
    _write_scene_db(db, R, t, keypoints, f, w, h)
    out_dir = tmp_path / "tempdata"

    rc = main(["mapper",
               "--database_path", str(db),
               "--output_path", str(out_dir),
               "--image_path", str(tmp_path),
               "--TrackEstablishment.max_num_view_per_track", "1000000",
               "--TrackEstablishment.min_num_view_per_track", "3",
               "--Thresholds.min_inlier_num", "10",
               "--skip_view_graph_calibration", "1",
               "--quiet"])
    assert rc == 0
    exp = parse_glomap_tempdata(str(out_dir))
    assert exp.N == 6 and exp.M >= 25


def test_mapper_cli_track_selection_cap(tmp_path):
    """TrackEstablishment.min_num_tracks_per_view triggers the greedy
    FindTracksForProblem selection (track_establishment.cc:152-226)."""
    from tests.test_colmap_db import _ring_scene, _write_scene_db

    from xmtpu.pipeline.colmap_db import database_to_view_graph, read_database
    from xmtpu.pipeline.global_mapper import (GlobalMapperOptions,
                                              global_mapper_solve)

    rng = np.random.default_rng(5)
    f, w, h = 500.0, 640, 480
    R, t, pts, keypoints, K = _ring_scene(rng, n_cams=6, n_pts=40)
    db = tmp_path / "database.db"
    _write_scene_db(db, R, t, keypoints, f, w, h)
    vg = database_to_view_graph(read_database(str(db)))

    full = global_mapper_solve(vg, GlobalMapperOptions())
    capped = global_mapper_solve(vg, GlobalMapperOptions(
        min_num_tracks_per_view=5))
    assert capped.n_tracks < full.n_tracks
    # every image still covered by > min tracks (the selection goal)
    per_img = np.bincount(capped.obs_image, minlength=6)
    assert (per_img > 5).all()


def test_example03_real_export_arm(tmp_path):
    """VERDICT r4 item 6: example 03's real-export arm runs end-to-end from
    the tempdata written by `python -m xmtpu mapper` plus per-frame depth
    maps — no manual wiring.  GT depth at the observed pixels recovers the
    GT poses."""
    import importlib.util
    import os

    from tests.test_colmap_db import _ring_scene, _write_scene_db

    from xmtpu.__main__ import main

    rng = np.random.default_rng(7)
    f, w, h = 500.0, 640, 480
    R, t, pts, keypoints, K = _ring_scene(rng, n_cams=8, n_pts=50)
    db = tmp_path / "database.db"
    _write_scene_db(db, R, t, keypoints, f, w, h)
    out_dir = tmp_path / "tempdata"
    rc = main(["mapper", "--database_path", str(db),
               "--output_path", str(out_dir),
               "--TrackEstablishment.max_num_view_per_track", "1000000",
               "--quiet"])
    assert rc == 0

    # per-frame GT depth maps: z of each observed point at its (truncated)
    # pixel; zeros elsewhere (lift_depth drops d <= 0)
    depth_dir = tmp_path / "depth"
    os.makedirs(depth_dir)
    np.savetxt(depth_dir / "K.txt", K)
    for i in range(len(R)):
        pc = pts @ R[i].T + t[i]
        uv = keypoints[i].astype(int)
        ok = ((uv[:, 0] >= 0) & (uv[:, 0] < w)
              & (uv[:, 1] >= 0) & (uv[:, 1] < h))
        d = np.zeros((h, w))
        d[uv[ok, 1], uv[ok, 0]] = pc[ok, 2]
        np.save(depth_dir / f"img{i:03d}.png.depth.npy", d)
    # gt_poses.npz convention (matching pipeline.synthetic scenes): c2w
    # rotations + camera centers
    centers = -np.einsum("nba,nb->na", R, t)
    np.savez(depth_dir / "gt_poses.npz", R_gt=R.transpose(0, 2, 1),
             t_gt=centers)

    spec = importlib.util.spec_from_file_location(
        "ex3", os.path.join(os.path.dirname(__file__), "..", "examples",
                            "03_full_pipeline.py"))
    ex3 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ex3)

    out, m = ex3.run_real_export(str(out_dir), str(depth_dir),
                                 max_rank=4, tol=1e-6, verbose=False)
    assert m is not None
    # GT depth at GT pixels (1 px truncation noise): rotations recover
    assert m["ATE_R_deg"] < 2.0, m   # degrees (median, robust-aligned)
