import jax.numpy as jnp
import numpy as np

from xmtpu.ops.lanczos import lanczos_min_eig_dense


def _random_sym(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return (A + A.T) / 2


def test_matches_eigh():
    A = _random_sym(300, 1)
    lam, v, resid = lanczos_min_eig_dense(jnp.asarray(A), num_iters=80)
    w, V = np.linalg.eigh(A)
    np.testing.assert_allclose(float(lam), w[0], rtol=1e-8)
    # eigenvector up to sign
    dot = abs(float(np.dot(np.asarray(v), V[:, 0])))
    assert dot > 1 - 1e-6
    assert float(resid) < 1e-6 * np.abs(w).max()


def test_clustered_spectrum():
    """Near-degenerate minimum eigenvalues: the Ritz value must still land on
    the cluster (any vector in the cluster subspace is a valid escape)."""
    rng = np.random.default_rng(2)
    n = 200
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    w = np.linspace(1.0, 5.0, n)
    w[0] = -1.0
    w[1] = -1.0 + 1e-9
    A = (Q * w) @ Q.T
    lam, v, resid = lanczos_min_eig_dense(jnp.asarray(A), num_iters=80)
    np.testing.assert_allclose(float(lam), -1.0, rtol=1e-7)
    # v lies in the 2-dim cluster subspace
    proj = Q[:, :2].T @ np.asarray(v)
    assert np.linalg.norm(proj) > 1 - 1e-5


def test_psd_case():
    """PSD matrix: min eig ~ 0 reported as small nonnegative-ish value."""
    rng = np.random.default_rng(3)
    B = rng.normal(size=(150, 30))
    A = B @ B.T   # rank 30, min eig exactly 0 with multiplicity 120
    lam, v, resid = lanczos_min_eig_dense(jnp.asarray(A), num_iters=60)
    assert abs(float(lam)) < 1e-8
