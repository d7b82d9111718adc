"""COLMAP database ingestion + in-process global mapper tests.

Covers xmtpu/pipeline/colmap_db.py (reference:
deps/glomap/glomap/io/colmap_converter.cc:178-310) and
xmtpu/pipeline/global_mapper.py (controllers/global_mapper.cc:17-186):
a synthetic scene is written as a real sqlite ``database.db`` and pushed
through database -> view graph -> stages 0-4 -> observations.
"""

import numpy as np
import pytest

from xmtpu.pipeline import colmap_db as cdb
from xmtpu.pipeline.global_mapper import (GlobalMapperOptions, MapperResult,
                                          global_mapper_solve)
from xmtpu.pipeline.undistort import Camera
from xmtpu.pipeline.viewgraph import essential_from_motion


def test_pair_id_roundtrip():
    for a, b in [(1, 2), (7, 3), (100, 100), (1, 2147483646)]:
        pid = cdb.pair_id_from_images(a, b)
        lo, hi = min(a, b), max(a, b)
        assert cdb.images_from_pair_id(pid) == (lo, hi)


def _ring_scene(rng, n_cams=8, n_pts=60, f=500.0, w=640, h=480):
    """Cameras on a ring looking inward at a point cloud; returns poses,
    points and per-image pixel keypoints (one keypoint per visible point)."""
    angles = np.linspace(0, 2 * np.pi, n_cams, endpoint=False)
    centers = np.stack([4 * np.cos(angles), 4 * np.sin(angles),
                        0.2 * rng.standard_normal(n_cams)], axis=1)
    R = np.zeros((n_cams, 3, 3))
    for i, c in enumerate(centers):
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 0.0, 1.0], z)
        x /= np.linalg.norm(x)
        R[i] = np.stack([x, np.cross(z, x), z], axis=0)
    t = -np.einsum("nab,nb->na", R, centers)
    pts = rng.standard_normal((n_pts, 3)) * 0.8
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])

    keypoints = []   # per image: (n_pts, 2) pixel coords (all points seen)
    for i in range(n_cams):
        pc = pts @ R[i].T + t[i]
        uv = (pc / pc[:, 2:3]) @ K.T
        keypoints.append(uv[:, :2])
    return R, t, pts, keypoints, K


def _write_scene_db(path, R, t, keypoints, f, w, h):
    n_cams = len(R)
    cameras = {1: Camera(model="SIMPLE_PINHOLE",
                         params=[f, w / 2, h / 2], width=w, height=h)}
    images = {i + 1: (f"img{i:03d}.png", 1) for i in range(n_cams)}
    kps = {i + 1: keypoints[i] for i in range(n_cams)}
    tvgs = {}
    for i in range(n_cams):
        for j in range(i + 1, n_cams):
            Rij = R[j] @ R[i].T                      # cam2_from_cam1
            tij = t[j] - Rij @ t[i]
            n_pts = len(keypoints[i])
            m = np.stack([np.arange(n_pts), np.arange(n_pts)], axis=1)
            tvgs[(i + 1, j + 1)] = {
                "matches": m, "config": cdb.CALIBRATED,
                "E": essential_from_motion(Rij, tij / np.linalg.norm(tij)),
            }
    cdb.write_database(str(path), cameras, images, keypoints=kps,
                       two_view_geometries=tvgs)


def test_database_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    f, w, h = 500.0, 640, 480
    R, t, pts, keypoints, K = _ring_scene(rng)
    db_path = tmp_path / "database.db"
    _write_scene_db(db_path, R, t, keypoints, f, w, h)

    db = cdb.read_database(str(db_path))
    assert len(db.images) == 8
    assert db.cameras[1].model == "SIMPLE_PINHOLE"
    assert db.cameras[1].focal == pytest.approx(f)
    assert len(db.pairs) == 8 * 7 // 2
    np.testing.assert_allclose(db.images[1].keypoints, keypoints[0],
                               rtol=0, atol=1e-4)
    pr = db.pairs[(1, 2)]
    assert pr.config == cdb.CALIBRATED
    assert pr.matches.shape[1] == 2
    assert pr.E is not None


def test_database_to_view_graph_masks_bad_configs(tmp_path):
    rng = np.random.default_rng(1)
    f, w, h = 500.0, 640, 480
    R, t, pts, keypoints, K = _ring_scene(rng, n_cams=4)
    db_path = tmp_path / "db.db"
    _write_scene_db(db_path, R, t, keypoints, f, w, h)
    # mark one pair WATERMARK: must be masked invalid
    # (colmap_converter.cc:253-260)
    import sqlite3
    con = sqlite3.connect(str(db_path))
    con.execute("UPDATE two_view_geometries SET config=? WHERE pair_id=?",
                (cdb.WATERMARK, cdb.pair_id_from_images(1, 2)))
    con.commit()
    con.close()

    vg = cdb.database_to_view_graph(cdb.read_database(str(db_path)))
    assert len(vg.image_ids) == 4
    p12 = [k for k in range(len(vg.pairs))
           if tuple(vg.pairs[k]) == (0, 1)][0]
    assert not vg.valid[p12]
    assert vg.valid.sum() == len(vg.pairs) - 1
    # out-of-range match indices are dropped (cc:289-303)
    assert all(m.max(initial=-1) < len(keypoints[0]) for m in vg.matches)


def test_global_mapper_end_to_end(tmp_path):
    rng = np.random.default_rng(2)
    f, w, h = 500.0, 640, 480
    R, t, pts, keypoints, K = _ring_scene(rng)
    db_path = tmp_path / "database.db"
    _write_scene_db(db_path, R, t, keypoints, f, w, h)

    vg = cdb.database_to_view_graph(cdb.read_database(str(db_path)))
    res = global_mapper_solve(vg, GlobalMapperOptions(
        min_num_view_per_track=3))
    assert isinstance(res, MapperResult)
    assert res.registered.all()
    assert res.pair_valid.sum() > 0
    # every point is seen by every camera -> tracks survive selection
    assert res.n_tracks > 50
    assert len(res.obs_image) == res.n_tracks * 8

    # decomposed relative rotations match ground truth on valid pairs
    for p in np.flatnonzero(res.pair_valid)[:5]:
        i, j = vg.pairs[p]
        R_gt = R[j] @ R[i].T
        assert np.allclose(res.R_rel[p], R_gt, atol=1e-4)

    # exported observations reproject exactly: u,v are the db keypoints
    obs_uv = res.obs_xy
    assert obs_uv.shape == (len(res.obs_image), 2)
    assert obs_uv[:, 0].min() >= 0 and obs_uv[:, 0].max() <= w


def test_global_mapper_refines_focal(tmp_path):
    """With fundamental matrices and no prior focal, stage 1 recovers the
    true focal (view-graph calibration, global_mapper.cc:38-46)."""
    from xmtpu.pipeline.calibration import fundamental_from_pose

    rng = np.random.default_rng(3)
    f, w, h = 500.0, 640, 480
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    # random general-position relative poses — a look-at-center ring is
    # degenerate for focal self-calibration (optical axes intersect)
    cameras = {1: Camera(model="SIMPLE_PINHOLE",
                         params=[420.0, w / 2, h / 2], width=w, height=h)}
    images = {i + 1: (f"img{i:03d}.png", 1) for i in range(6)}
    kps = {i + 1: rng.random((10, 2)) * [w, h] for i in range(6)}
    tvgs = {}
    for i in range(6):
        for j in range(i + 1, 6):
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            a = 0.2 + 0.4 * rng.random()
            Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                           [-axis[1], axis[0], 0]])
            Rij = np.eye(3) + np.sin(a) * Kx + (1 - np.cos(a)) * Kx @ Kx
            tij = rng.normal(size=3)
            m = np.stack([np.arange(10)] * 2, axis=1)
            tvgs[(i + 1, j + 1)] = {
                "matches": m, "config": cdb.UNCALIBRATED,
                "F": fundamental_from_pose(K, K, Rij,
                                           tij / np.linalg.norm(tij)),
            }
    db_path = tmp_path / "database.db"
    cdb.write_database(str(db_path), cameras, images, keypoints=kps,
                       two_view_geometries=tvgs, prior_focal={1: False})

    vg = cdb.database_to_view_graph(cdb.read_database(str(db_path)))
    assert not vg.has_prior_focal[0]
    res = global_mapper_solve(vg, GlobalMapperOptions(
        skip_relative_pose_estimation=True, skip_rotation_averaging=True,
        skip_track_establishment=True))
    assert res.focals[0] == pytest.approx(f, rel=0.05)


def test_reads_official_colmap_schema_database(tmp_path):
    """Ingest a database written with COLMAP's OWN schema and conventions
    (colmap/src/colmap/scene/database.cc), built here with raw SQL —
    deliberately NOT through xmtpu's writer — so reader/writer co-drift
    cannot hide a convention mismatch (VERDICT r3 missing-4; pycolmap is
    not in this image, so the official CREATE TABLE statements and blob
    layouts are reproduced verbatim instead):

    * ``images`` carries COLMAP's seven prior_* pose columns;
    * ``keypoints`` are the full 6-column affine form (x, y, a11..a22) f32;
    * a ``descriptors`` table exists (uint8, ignored by the reader);
    * ``pair_id = 2147483647 * id1 + id2`` with id1 < id2, matches uint32
      row-major, two_view_geometries with config/F/E/H/qvec/tvec.
    """
    import sqlite3

    from xmtpu.pipeline.colmap_db import read_database

    path = str(tmp_path / "official.db")
    con = sqlite3.connect(path)
    con.executescript("""
CREATE TABLE cameras (camera_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    model INTEGER NOT NULL, width INTEGER NOT NULL, height INTEGER NOT NULL,
    params BLOB, prior_focal_length INTEGER NOT NULL);
CREATE TABLE images (image_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    name TEXT NOT NULL UNIQUE, camera_id INTEGER NOT NULL,
    prior_qw REAL, prior_qx REAL, prior_qy REAL, prior_qz REAL,
    prior_tx REAL, prior_ty REAL, prior_tz REAL);
CREATE TABLE keypoints (image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB);
CREATE TABLE descriptors (image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB);
CREATE TABLE matches (pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB);
CREATE TABLE two_view_geometries (pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    config INTEGER NOT NULL, F BLOB, E BLOB, H BLOB, qvec BLOB, tvec BLOB);
""")
    # SIMPLE_RADIAL (model 2): f, cx, cy, k
    params = np.array([320.0, 320.0, 240.0, 0.01], np.float64)
    con.execute("INSERT INTO cameras VALUES (1, 2, 640, 480, ?, 1)",
                (params.tobytes(),))
    for iid, name in ((1, "a.jpg"), (2, "b.jpg")):
        con.execute(
            "INSERT INTO images VALUES (?, ?, 1, NULL, NULL, NULL, NULL, "
            "NULL, NULL, NULL)", (iid, name))
    rng = np.random.default_rng(0)
    kps = {}
    for iid, k in ((1, 37), (2, 41)):
        kp6 = np.zeros((k, 6), np.float32)
        kp6[:, :2] = rng.uniform(0, 640, size=(k, 2)).astype(np.float32)
        kp6[:, 2] = kp6[:, 5] = 1.0            # identity affine shape
        kps[iid] = kp6
        con.execute("INSERT INTO keypoints VALUES (?, ?, 6, ?)",
                    (iid, k, kp6.tobytes()))
        desc = rng.integers(0, 256, size=(k, 128), dtype=np.uint8)
        con.execute("INSERT INTO descriptors VALUES (?, ?, 128, ?)",
                    (iid, k, desc.tobytes()))
    pair_id = 2147483647 * 1 + 2
    m = np.array([[0, 3], [5, 1], [10, 7], [36, 40]], np.uint32)
    con.execute("INSERT INTO matches VALUES (?, ?, 2, ?)",
                (pair_id, len(m), m.tobytes()))
    F = np.arange(9, dtype=np.float64).reshape(3, 3)
    E = F + 1.0
    H = F + 2.0
    qvec = np.array([1.0, 0, 0, 0])
    tvec = np.array([0.1, 0.2, 0.3])
    inl = m[:3]
    con.execute(
        "INSERT INTO two_view_geometries VALUES (?, ?, 2, ?, 3, ?, ?, ?, "
        "?, ?)", (pair_id, len(inl), inl.tobytes(), F.tobytes(), E.tobytes(),
                  H.tobytes(), qvec.tobytes(), tvec.tobytes()))
    con.commit()
    con.close()

    db = read_database(path)
    cam = db.cameras[1]
    assert cam.model == "SIMPLE_RADIAL"
    assert (cam.width, cam.height) == (640, 480)
    np.testing.assert_allclose(cam.params, params)
    assert db.prior_focal[1] is True
    assert {i: im.name for i, im in db.images.items()} == {1: "a.jpg",
                                                           2: "b.jpg"}
    # 6-column affine keypoints: reader must take x, y only
    np.testing.assert_allclose(db.images[1].keypoints,
                               kps[1][:, :2].astype(np.float64))
    assert db.images[2].keypoints.shape == (41, 2)
    pair = db.pairs[(1, 2)]
    assert pair.config == 3                    # CALIBRATED
    np.testing.assert_array_equal(pair.matches, inl.astype(np.int64))
    np.testing.assert_allclose(pair.F, F)
    np.testing.assert_allclose(pair.E, E)
    np.testing.assert_allclose(pair.H, H)

    # raw-matches fallback path (use_two_view_geometries=False)
    db2 = read_database(path, use_two_view_geometries=False)
    np.testing.assert_array_equal(db2.pairs[(1, 2)].matches,
                                  m.astype(np.int64))
