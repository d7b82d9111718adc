"""Camera model / undistortion tests.

Reference behavior: deps/glomap/glomap/processors/image_undistorter.cc
(features -> unit bearings via colmap CamFromImg) and the COLMAP camera
model family.
"""

import numpy as np
import pytest

from xmtpu.pipeline.undistort import (Camera, cam_from_img, distort,
                                      undistort, undistorted_bearings,
                                      undistort_images)

MODELS = [
    ("SIMPLE_PINHOLE", [500.0, 320.0, 240.0]),
    ("PINHOLE", [500.0, 510.0, 320.0, 240.0]),
    ("SIMPLE_RADIAL", [500.0, 320.0, 240.0, -0.08]),
    ("RADIAL", [500.0, 320.0, 240.0, -0.08, 0.02]),
    ("OPENCV", [500.0, 510.0, 320.0, 240.0, -0.08, 0.02, 1e-3, -5e-4]),
    ("FULL_OPENCV", [500.0, 510.0, 320.0, 240.0, -0.08, 0.02, 1e-3, -5e-4,
                     0.005, -0.01, 0.002, -0.001]),
    ("OPENCV_FISHEYE", [400.0, 405.0, 320.0, 240.0, 0.05, -0.01, 0.002,
                        -0.0005]),
]


@pytest.mark.parametrize("model,params", MODELS, ids=[m for m, _ in MODELS])
def test_undistort_inverts_distort(model, params):
    cam = Camera(model, params)
    rng = np.random.default_rng(0)
    xy = rng.uniform(-0.4, 0.4, size=(200, 2))
    xyd = distort(cam, xy)
    back = undistort(cam, xyd)
    assert np.max(np.abs(back - xy)) < 1e-9


@pytest.mark.parametrize("model,params", MODELS, ids=[m for m, _ in MODELS])
def test_bearings_unit_and_consistent(model, params):
    cam = Camera(model, params)
    rng = np.random.default_rng(1)
    xy = rng.uniform(-0.3, 0.3, size=(50, 2))
    # project: distort then apply K
    xyd = distort(cam, xy)
    K = cam.K
    uv = xyd * np.array([K[0, 0], K[1, 1]]) + K[:2, 2]
    b = undistorted_bearings(cam, uv)
    assert np.allclose(np.linalg.norm(b, axis=1), 1.0, atol=1e-12)
    # bearings parallel to (x, y, 1)
    expect = np.concatenate([xy, np.ones((50, 1))], axis=1)
    expect /= np.linalg.norm(expect, axis=1, keepdims=True)
    assert np.max(np.abs(b - expect)) < 1e-8


def test_pinhole_passthrough():
    cam = Camera("PINHOLE", [500.0, 510.0, 320.0, 240.0])
    uv = np.array([[320.0, 240.0], [820.0, 750.0]])
    xy = cam_from_img(cam, uv)
    assert np.allclose(xy, [[0.0, 0.0], [1.0, 1.0]])


def test_undistort_images_batch():
    cams = {1: Camera("SIMPLE_RADIAL", [500.0, 320.0, 240.0, -0.05]),
            2: Camera("PINHOLE", [600.0, 600.0, 320.0, 240.0])}
    kps = {1: np.array([[100.0, 50.0]]), 2: np.array([[320.0, 240.0]])}
    out = undistort_images(cams, kps)
    assert set(out) == {1, 2}
    assert np.allclose(out[2][0], [0.0, 0.0, 1.0])


def test_camera_model_loader(tmp_path):
    from xmtpu.pipeline.datasets import load_camera_data, load_camera_models
    p = tmp_path / "cameras.txt"
    p.write_text("# comment\n"
                 "1 SIMPLE_RADIAL 640 480 500.0 320.0 240.0 -0.05\n"
                 "2 PINHOLE 640 480 500.0 510.0 320.0 240.0\n")
    cams = load_camera_models(str(p))
    assert cams[1].model == "SIMPLE_RADIAL"
    assert cams[1].dist.tolist() == [-0.05]
    assert cams[2].K[1, 1] == 510.0
    # the K-only loader now accepts distortion models too
    k_only = load_camera_data(str(p))
    assert k_only[1][0][0, 0] == 500.0


def test_unknown_model_rejected():
    with pytest.raises(ValueError):
        Camera("THIN_PRISM_FISHEYE", [1.0])
