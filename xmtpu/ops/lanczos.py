"""Lanczos extreme-eigenpair solver for the dual certificate.

The reference computes the certificate's minimum eigenvalue with a *full*
symmetric eigendecomposition of the 3n x 3n dual matrix Z (cusolverDnXsyevd,
/root/reference/XM/include/XM/checkeig.h:303-316) — O(n^3) work and O(n^2)
eigenvector storage for ONE eigenpair.  That syevd is the reference's stated
scaling wall (SURVEY.md section 5.7).

Here: Lanczos with full reorthogonalization (the certificate only needs the
extreme pair; full reorth keeps the basis numerically orthogonal so the
returned Ritz pair is trustworthy), followed by an eigendecomposition of the
tiny tridiagonal.  The basis is kept in a (k, dim) buffer updated inside a
``lax.fori_loop`` — everything jit-compatible, matvec-driven, and row-sharded
matvecs parallelize it across chips unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def lanczos_min_eig(matvec, dim: int, num_iters: int = 96, seed: int = 0,
                    v0=None):
    """Smallest eigenpair of a symmetric operator.

    Args:
      matvec: ``x (dim,) -> A x (dim,)``.
      num_iters: Krylov dimension (clamped to ``dim``).
      v0: optional start vector (e.g. the previous escape direction).

    Returns ``(lam_min, v, resid)`` where ``resid = ||A v - lam v||``.
    """
    k = min(num_iters, dim)

    if v0 is None:
        v0 = jax.random.normal(jax.random.PRNGKey(seed), (dim,),
                               dtype=jnp.float64)
    v0 = v0 / jnp.linalg.norm(v0)

    V = jnp.zeros((k + 1, dim), jnp.float64).at[0].set(v0)
    alphas = jnp.zeros((k,), jnp.float64)
    betas = jnp.zeros((k,), jnp.float64)

    def body(j, carry):
        V, alphas, betas = carry
        v = V[j]
        w = matvec(v)
        alpha = jnp.vdot(v, w)
        w = w - alpha * v - jnp.where(j > 0, betas[j - 1], 0.0) * V[j - 1]
        # full reorthogonalization against the whole basis (two passes)
        mask = (jnp.arange(k + 1) <= j)[:, None]
        for _ in range(2):
            w = w - V.T @ (mask[:, 0] * (V @ w))
        beta = jnp.linalg.norm(w)
        # beta underflow (invariant subspace): restart direction is arbitrary
        w = jnp.where(beta > 1e-14, w / jnp.maximum(beta, 1e-300),
                      jnp.zeros_like(w))
        V = V.at[j + 1].set(w)
        alphas = alphas.at[j].set(alpha)
        betas = betas.at[j].set(beta)
        return V, alphas, betas

    V, alphas, betas = jax.lax.fori_loop(0, k, body, (V, alphas, betas))

    T = (jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1))
    w_T, y_T = jnp.linalg.eigh(T)
    lam = w_T[0]
    v = V[:k].T @ y_T[:, 0]
    v = v / jnp.linalg.norm(v)
    resid = jnp.linalg.norm(matvec(v) - lam * v)
    return lam, v, resid


@partial(jax.jit, static_argnames=("num_iters",))
def lanczos_min_eig_dense(A, num_iters: int = 96, seed: int = 0):
    """Convenience wrapper for a dense symmetric matrix."""
    return lanczos_min_eig(lambda x: A @ x, A.shape[0], num_iters, seed)
