"""Bundle-adjustment refinement: TPU-native Levenberg-Marquardt on the
reprojection cost.

Replaces the reference's Ceres bridge (``XM_Ceres_interface``,
/root/reference/utils/ceresforXM.py:6-89): a pyceres Problem with
SIMPLE_PINHOLE unit-camera reprojection residuals over pre-normalized 2-D
observations, EigenQuaternionManifold per camera, fixed intrinsics,
ITERATIVE_SCHUR + SCHUR_JACOBI, 100 CPU threads.

Here the same nonlinear least-squares problem is one jitted JAX program:

* residual ``r_e = project(R_i p_j + t_i) - obs_e`` with
  ``project(x) = x[:2] / x[2]`` (unit pinhole on normalized coordinates —
  exactly the reference's residual with fixed ``params = [1, 0, 0]``);
* rotations updated on the manifold by left-multiplied exponential-map
  increments (the quaternion-manifold equivalent);
* Levenberg-Marquardt with the damped normal equations solved by
  matrix-free CG using ``jvp``/``vjp`` Jacobian products and a Jacobi
  (diagonal) preconditioner — the ITERATIVE_SCHUR + SCHUR_JACOBI analog
  without materializing J;
* the damping schedule and nonmonotonic acceptance mirror Ceres defaults
  (up 2x on reject, down 3x on accept).

Segment sums over observations batch everything; there are no per-camera
Python loops.  ``only_landmarks=True`` freezes the poses (ceresforXM.py:56-58).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np


def _hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
    ], axis=-2)


def _expm_so3(w):
    """Rodrigues: (..., 3) rotation vector -> (..., 3, 3).

    Written as ``I + A hat(w) + B hat(w)^2`` with A = sin(t)/t and
    B = (1-cos(t))/t^2 so the derivative is finite at w = 0 (the LM updates
    start exactly there; ``jnp.linalg.norm`` would give a NaN gradient).
    """
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]
    # Small-angle series via where (no tiny epsilon: the TPU's emulated f64
    # flushes subnormals like 1e-40 to zero, turning sqrt(t2+eps) into 0/0)
    small = t2 < 1e-12
    t2s = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2s)
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    K = _hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + A * K + B * (K @ K)


class RefineResult(NamedTuple):
    R_est: np.ndarray   # (3, 3N) camera-to-world rotation blocks
    t_est: np.ndarray   # (3, N) camera centers
    p_est: np.ndarray   # (3, M) refined points
    iterations: int
    final_cost: float


def refine_bundle(edges, landmarks2D, R_XM, t_XM, p_XM,
                  only_landmarks: bool = False, max_iters: int = 50,
                  cg_iters: int = 100, verbose: bool = False) -> RefineResult:
    """LM refinement of (poses, points) from normalized 2-D observations.

    Args match ``XM_Ceres_interface``: ``edges`` (E, 2) 1-based
    [frame, landmark]; ``landmarks2D`` (E, 2) *normalized* image coordinates;
    ``R_XM`` (3, 3N) c2w blocks, ``t_XM`` (3, N) camera centers, ``p_XM``
    (3, M) points (the XM solution as initial guess).
    """
    edges = np.asarray(edges)
    N = int(edges[:, 0].max())
    M = int(edges[:, 1].max())
    f = jnp.asarray(edges[:, 0] - 1, jnp.int32)
    l = jnp.asarray(edges[:, 1] - 1, jnp.int32)
    obs = jnp.asarray(landmarks2D, jnp.float64)

    # initial w2c pose: R_w2c = R_c2w^T, t_w2c = -R_c2w^T c
    Rb = np.asarray(R_XM).reshape(3, N, 3).transpose(1, 0, 2)   # c2w blocks
    R0 = jnp.asarray(Rb.transpose(0, 2, 1))                     # w2c
    t0 = jnp.asarray(-np.einsum("nba,bn->na", Rb, np.asarray(t_XM)))
    p0 = jnp.asarray(np.asarray(p_XM).T)                        # (M, 3)

    def residuals(params):
        dw, dt, dp = params
        R = _expm_so3(dw) @ R0
        t = t0 + dt
        p = p0 + dp
        x = jnp.einsum("eab,eb->ea", R[f], p[l]) + t[f]
        proj = x[:, :2] / x[:, 2:3]
        return (proj - obs).reshape(-1)

    zero = (jnp.zeros((N, 3), jnp.float64), jnp.zeros((N, 3), jnp.float64),
            jnp.zeros((M, 3), jnp.float64))

    if only_landmarks:
        def mask(params):
            dw, dt, dp = params
            return (jnp.zeros_like(dw), jnp.zeros_like(dt), dp)
    else:
        def mask(params):
            return params

    flat0, unravel = jax.flatten_util.ravel_pytree(zero)

    def r_flat(v):
        return residuals(mask(unravel(v)))

    @jax.jit
    def lm_step(v, mu):
        r = r_flat(v)
        cost = 0.5 * jnp.vdot(r, r)
        _, vjp = jax.vjp(r_flat, v)
        g = vjp(r)[0]

        def JtJv(u):
            _, Ju = jax.jvp(r_flat, (v,), (u,))
            return vjp(Ju)[0] + mu * u

        def cg_body(i, carry):
            x, rr, pp, rs = carry
            # converged residual -> freeze (fixed-trip-count CG must not 0/0)
            live = rs > 1e-30
            Ap = JtJv(pp)
            alpha = jnp.where(live, rs / jnp.vdot(pp, Ap), 0.0)
            x = x + alpha * pp
            rr = rr - alpha * Ap
            rs_new = jnp.vdot(rr, rr)
            beta = jnp.where(live, rs_new / rs, 0.0)
            pp = rr + beta * pp
            return x, rr, pp, rs_new

        x0 = jnp.zeros_like(v)
        rr0 = -g
        carry = (x0, rr0, rr0, jnp.vdot(rr0, rr0))
        x, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, carry)

        v_new = v + x
        r_new = r_flat(v_new)
        cost_new = 0.5 * jnp.vdot(r_new, r_new)
        accept = cost_new < cost
        v_out = jnp.where(accept, v_new, v)
        mu_out = jnp.where(accept, mu / 3.0, mu * 2.0)
        return v_out, mu_out, cost, cost_new, accept

    v = flat0
    mu = jnp.asarray(1e-4)
    last_cost = np.inf
    it = 0
    for it in range(max_iters):
        v, mu, cost, cost_new, accept = lm_step(v, mu)
        if verbose:
            print(f"[refine] it={it} cost={float(cost):.6e} -> "
                  f"{float(cost_new):.6e} accept={bool(accept)} mu={float(mu):.1e}")
        if bool(accept) and abs(float(cost) - float(cost_new)) < 1e-12 * max(1.0, float(cost)):
            break
        last_cost = float(cost)

    dw, dt, dp = mask(unravel(v))
    R = np.asarray(_expm_so3(dw) @ R0)        # w2c
    t = np.asarray(t0 + dt)
    p = np.asarray(p0 + dp)

    R_c2w = R.transpose(0, 2, 1)
    centers = -np.einsum("nab,nb->na", R_c2w, t)
    final_cost = float(0.5 * np.sum(np.asarray(r_flat(v)) ** 2))
    return RefineResult(
        R_est=R_c2w.transpose(1, 0, 2).reshape(3, 3 * N),
        t_est=centers.T,
        p_est=p.T,
        iterations=it + 1,
        final_cost=final_cost,
    )
