"""File-based entry points: solve / solve_rank3 / solve_with_init write and
read the reference's dataset layout (Q.bin in, R.bin/s.bin out)."""

import os

import numpy as np
import pytest

from xmtpu.assembly.creatematrix import create_matrix
from xmtpu.io.bin_format import load_matrix_from_bin, save_matrix_to_bin
from xmtpu.pipeline.synthetic import make_scene
from xmtpu.solver.staircase import solve, solve_rank3, solve_with_init


@pytest.fixture()
def dataset(tmp_path):
    scene = make_scene(n_cameras=6, n_points=30, obs_per_camera=15, seed=8)
    create_matrix(scene.weights, scene.edges, scene.landmarks, str(tmp_path))
    return tmp_path, scene


def test_solve_writes_R_s(dataset):
    path, scene = dataset
    res = solve(str(path), max_rank=4, tol=1e-8, lam=0.0, verbose=False)
    assert res.certified
    R, rows = load_matrix_from_bin(path / "R.bin")
    s, _ = load_matrix_from_bin(path / "s.bin")
    assert rows == 3 * scene.N
    assert s.shape == (scene.N, 1)
    assert s[0, 0] == 1.0
    # blocks orthonormal
    B = R.reshape(scene.N, 3, R.shape[1])
    G = np.einsum("nko,nlo->nkl", B, B)
    np.testing.assert_allclose(G, np.broadcast_to(np.eye(3), G.shape),
                               atol=1e-9)


def test_solve_rank3(dataset):
    path, scene = dataset
    res = solve_rank3(str(path), tol=1e-8, verbose=False)
    R, _ = load_matrix_from_bin(path / "R.bin")
    assert R.shape[1] == 3


def test_solve_with_init(dataset):
    path, scene = dataset
    # warm start: scales from a prior solve (solve_rebuttle semantics:
    # only the scales survive into the o=3 stage)
    res0 = solve(str(path), max_rank=4, tol=1e-8, lam=0.0, verbose=False)
    s_prev, _ = load_matrix_from_bin(path / "s.bin")
    save_matrix_to_bin(path / "s_ini.bin", s_prev)
    save_matrix_to_bin(path / "R_ini.bin",
                       np.zeros((3 * scene.N, 3)))
    status = solve_with_init(str(path), max_rank=4, tol=1e-8, lam=0.0,
                             verbose=False)
    assert status == 1  # certified


def test_xm_compat_shim(tmp_path):
    """`import XM; XM.solve(path, ...)` runs reference scripts unchanged
    (1_test_solve.py:42 shape: same signatures, file contract, returns)."""
    import os
    import shutil

    import pytest

    import XM
    from xmtpu.io.bin_format import load_matrix_from_bin

    src = "/root/reference/assets/SIMPLE1/Q.bin"
    if not os.path.exists(src):
        pytest.skip("reference SIMPLE1 fixture not available")
    path = tmp_path / "SIMPLE1"
    path.mkdir()
    shutil.copy(src, path)
    assert XM.solve(str(path), 3, 1e-8, 0.0, 1000) is None
    R, _ = load_matrix_from_bin(str(path / "R.bin"))
    s, _ = load_matrix_from_bin(str(path / "s.bin"))
    assert R.shape[0] == 3 * s.shape[0]
    shutil.copy(path / "s.bin", path / "s_ini.bin")  # rebuttle warm start
    status = XM.solve_rebuttle(str(path), 3, 1e-8, 0.0, 1000)
    assert status in (-2, 1, 2)
    assert XM.solve_rank3(str(path), 3, 1e-8, 0.0, 1000) is None
