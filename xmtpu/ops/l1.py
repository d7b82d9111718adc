"""L1-norm least-deviations solver: ADMM with matrix-free CG inner solves.

TPU-native equivalent of the reference GLOMAP fork's Theia/Boyd L1 solver
(/root/reference/deps/glomap/glomap/math/l1_solver.h): minimize
``|| A x - b ||_1`` by ADMM —

    x^{k+1} = argmin_x ||A x - (b + z - u)||_2     (normal equations)
    z^{k+1} = shrink(alpha A x + (1-alpha)(z+b) - b + u, 1/rho)
    u^{k+1} = u + (ax_hat - z - b)

with the reference's over-relaxation ``alpha``, penalty ``rho`` and the
standard primal/dual stopping rule (l1_solver.h:46-95). The reference
factorizes ``A^T A`` once with CHOLMOD (l1_solver.h:36-38,103); here the
x-update is a matrix-free conjugate-gradient solve so the whole ADMM runs
as one ``lax.while_loop`` — no sparse factorization, no host round trips,
and ``A`` only ever appears through caller-supplied ``A_mul``/``At_mul``
closures (segment-sum graph operators in the rotation-averaging use).

Everything is shaped for jit: fixed-trip-count CG with a live guard, and a
while-loop whose bound ``max_iters`` may be a traced scalar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shrinkage(v, kappa):
    """Soft-threshold (l1_solver.h:105-112)."""
    return jnp.maximum(v - kappa, 0.0) - jnp.maximum(-v - kappa, 0.0)


def _tree_vdot(a, b):
    return sum(jnp.vdot(x, y) for x, y in
               zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def _tree_axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda a, b: alpha * a + b, x, y)


def _tree_norm(a):
    return jnp.sqrt(_tree_vdot(a, a))


def make_l1_admm(A_mul, At_mul, n_rows: int, n_cols: int,
                 rho: float = 1.0, alpha: float = 1.0,
                 absolute_tolerance: float = 1e-4,
                 relative_tolerance: float = 1e-2,
                 cg_iters: int = 50):
    """Build an L1 solver ``solve(b, x0, max_iters) -> x`` for jit use.

    ``A_mul(x)`` and ``At_mul(y)`` may consume/produce arbitrary pytrees of
    arrays (``x`` in the column space, ``y`` in the row space); ``n_rows`` /
    ``n_cols`` are the total element counts used by the tolerance scaling
    (l1_solver.h:50-54). Options mirror ``L1SolverOptions``
    (l1_solver.h:19-28).
    """

    def cg_solve(rhs, x0):
        """CG on the SPD normal operator x -> At(A x)."""

        def AtA(x):
            return At_mul(A_mul(x))

        r0 = _tree_axpy(-1.0, AtA(x0), rhs)

        def body(_, carry):
            x, r, p, rs = carry
            live = rs > 1e-30
            Ap = AtA(p)
            pAp = _tree_vdot(p, Ap)
            a = jnp.where(live, rs / jnp.where(pAp == 0, 1.0, pAp), 0.0)
            x = _tree_axpy(a, p, x)
            r = _tree_axpy(-a, Ap, r)
            rs_new = _tree_vdot(r, r)
            beta = jnp.where(live, rs_new / rs, 0.0)
            p = _tree_axpy(beta, p, r)
            return x, r, p, rs_new

        x, _, _, _ = jax.lax.fori_loop(
            0, cg_iters, body, (x0, r0, r0, _tree_vdot(r0, r0)))
        return x

    primal_abs_eps = jnp.sqrt(float(n_rows)) * absolute_tolerance
    dual_abs_eps = jnp.sqrt(float(n_cols)) * absolute_tolerance

    def solve(b, x0, max_iters):
        rhs_norm = _tree_norm(b)
        zeros_rows = jax.tree_util.tree_map(jnp.zeros_like, b)

        def cond(carry):
            x, z, u, k, done = carry
            return (~done) & (k < max_iters)

        def body(carry):
            x, z, u, k, _ = carry
            # x-update: AtA x = At(b + z - u)
            rhs = At_mul(jax.tree_util.tree_map(
                lambda bb, zz, uu: bb + zz - uu, b, z, u))
            x = cg_solve(rhs, x)
            ax = A_mul(x)
            ax_hat = jax.tree_util.tree_map(
                lambda a_, z_, b_: alpha * a_ + (1.0 - alpha) * (z_ + b_),
                ax, z, b)
            z_old = z
            z = jax.tree_util.tree_map(
                lambda ah, b_, u_: _shrinkage(ah - b_ + u_, 1.0 / rho),
                ax_hat, b, u)
            u = jax.tree_util.tree_map(
                lambda u_, ah, z_, b_: u_ + ah - z_ - b_, u, ax_hat, z, b)

            # convergence (l1_solver.h:75-92)
            r_norm = _tree_norm(jax.tree_util.tree_map(
                lambda a_, z_, b_: a_ - z_ - b_, ax, z, b))
            s_norm = rho * _tree_norm(At_mul(jax.tree_util.tree_map(
                lambda zn, zo: zn - zo, z, z_old)))
            max_norm = jnp.maximum(jnp.maximum(_tree_norm(ax),
                                               _tree_norm(z)), rhs_norm)
            primal_eps = primal_abs_eps + relative_tolerance * max_norm
            dual_eps = (dual_abs_eps + relative_tolerance
                        * rho * _tree_norm(At_mul(u)))
            done = (r_norm < primal_eps) & (s_norm < dual_eps)
            return x, z, u, k + 1, done

        x, _, _, _, _ = jax.lax.while_loop(
            cond, body, (x0, zeros_rows, zeros_rows, jnp.asarray(0),
                         jnp.asarray(False)))
        return x

    return solve


def l1_solve_dense(A, b, max_iters: int = 1000, **kw):
    """Convenience dense-matrix form of :func:`make_l1_admm` (the
    template-instantiation analog of ``L1Solver<Eigen::MatrixXd>``)."""
    A = jnp.asarray(A)
    solve = make_l1_admm(lambda x: A @ x, lambda y: A.T @ y,
                         A.shape[0], A.shape[1], **kw)
    x0 = jnp.zeros(A.shape[1], dtype=A.dtype)
    return solve(jnp.asarray(b), x0, max_iters)
