import numpy as np

from xmtpu.io.bin_format import (
    load_array_from_bin,
    load_matrix_from_bin,
    save_array_to_bin,
    save_matrix_to_bin,
)


def test_matrix_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    m = rng.normal(size=(7, 5))
    p = tmp_path / "m.bin"
    save_matrix_to_bin(p, m)
    loaded, rows = load_matrix_from_bin(p)
    assert rows == 7
    np.testing.assert_array_equal(loaded, m)


def test_matrix_bytes_match_reference_layout(tmp_path):
    # header int32 rows, cols; payload column-major f64 (utils/io.py:17-54)
    m = np.arange(6.0).reshape(2, 3)
    p = tmp_path / "m.bin"
    save_matrix_to_bin(p, m)
    raw = p.read_bytes()
    assert np.frombuffer(raw[:8], dtype=np.int32).tolist() == [2, 3]
    np.testing.assert_array_equal(
        np.frombuffer(raw[8:], dtype=np.float64),
        m.flatten(order="F"))


def test_array_roundtrip(tmp_path):
    a = np.linspace(0, 1, 11)
    p = tmp_path / "a.bin"
    save_array_to_bin(p, a)
    np.testing.assert_array_equal(load_array_from_bin(p), a)


def test_load_simple1(simple1_Q):
    Q = simple1_Q
    assert Q.shape == (447, 447)
    # the prebuilt SIMPLE1 cost matrix is (numerically) symmetric
    assert np.abs(Q - Q.T).max() < 1e-6 * np.abs(Q).max()


def test_load_simple2(simple2_data):
    data = simple2_data
    # columns: frame, landmark, x, y, z, weight, (extras e.g. rgb)
    assert data.shape[1] >= 6
    assert data[:, 0].min() >= 1 and data[:, 1].min() >= 1
