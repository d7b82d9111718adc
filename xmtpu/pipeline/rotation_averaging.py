"""Robust global rotation averaging — the GLOMAP stage XM uses to filter
bad relative poses.

Re-design of the vendored Theia-style ``RotationEstimator``
(/root/reference/deps/glomap/glomap/estimators/global_rotation_averaging.{h,cc}):
given relative rotations ``R_rel = R_j R_i^T`` (cam2_from_cam1 on
world-to-camera rotations) on a view graph, estimate global rotations by the
reference's exact three-phase scheme:

1. **Maximum-spanning-tree initialization** (cc:63-111): chain relative
   rotations down the inlier-count-weighted MST (BFS order).
2. **L1 phase** (``SolveL1Regression``, cc:277-331): repeatedly solve the
   linearized system ``x_j - x_i = r_e`` (+ fixed-camera pin rows,
   cc:253-267) in the L1 norm with the ADMM solver — here
   :mod:`xmtpu.ops.l1`, matrix-free over segment-sum graph operators instead
   of a CHOLMOD factorization — with the reference's doubling inner-iteration
   cap (10 -> 100, cc:326-328) and average-step-size stop.
3. **IRLS phase** (``SolveIRLS``, cc:334-419): Geman-McClure weights
   ``w = sigma^2 / (e^2 + sigma^2)^2`` with sigma = 5 degrees
   (RotationEstimatorOptions, h:36-63), weighted normal equations solved by
   matrix-free CG (the reference refactorizes CHOLMOD per sweep).

Residual convention matches ComputeResiduals (cc:441-470):
``r_e = -log(R_j^T R_rel R_i)`` per pair plus ``r_fix = log(R_fix0^T
R_fix)`` pin rows; updates are right-multiplied ``R <- R exp(-x)``
(UpdateGlobalRotations, cc:421-438). Both solve phases run as single
``lax.while_loop`` programs — no per-sweep host round trips.

``filter_pairs`` reproduces the downstream use: drop relative poses whose
post-averaging residual angle exceeds a threshold (the XM flow runs the
stage twice purely as a filter, global_mapper.cc:77-111).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

from xmtpu.pipeline.refine import _expm_so3  # zero-safe Rodrigues
import jax
import jax.numpy as jnp

from xmtpu.ops.l1 import make_l1_admm


def _log_so3(R):
    """Batched SO(3) log map: (..., 3, 3) -> (..., 3)."""
    cos = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1) / 2, -1.0, 1.0)
    theta = jnp.arccos(cos)
    # axis from the skew part; safe at theta ~ 0 and theta ~ pi
    skew = 0.5 * (R - jnp.swapaxes(R, -1, -2))
    w = jnp.stack([skew[..., 2, 1], skew[..., 0, 2], skew[..., 1, 0]], axis=-1)
    sin = jnp.sin(theta)
    small = theta < 1e-6
    scale = jnp.where(small, 1.0, theta / jnp.where(small, 1.0, sin))
    near_pi = theta > np.pi - 1e-3
    # near pi: use the symmetric part diagonal
    A = 0.5 * (R + jnp.swapaxes(R, -1, -2)) - jnp.eye(3, dtype=R.dtype)
    diag = jnp.clip(1.0 + jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]],
                                    axis=-1), 0.0, None)
    axis_pi = jnp.sqrt(diag)
    sign = jnp.sign(jnp.where(jnp.abs(w) > 1e-12, w, 1.0))
    w_pi = theta[..., None] * axis_pi * sign
    return jnp.where(near_pi[..., None], w_pi, scale[..., None] * w)


@dataclass
class RotationEstimatorOptions:
    """Mirrors glomap RotationEstimatorOptions
    (global_rotation_averaging.h:36-72)."""

    max_num_l1_iterations: int = 5
    l1_step_convergence_threshold: float = 0.001
    max_num_irls_iterations: int = 100
    irls_step_convergence_threshold: float = 0.001
    irls_loss_parameter_sigma: float = 5.0     # degrees
    weight_type: str = "GEMAN_MCCLURE"         # | "HALF_NORM"
    skip_initialization: bool = False
    cg_iters: int = 64


class RotationAveragingResult(NamedTuple):
    rotations: np.ndarray   # (N, 3, 3) global rotations, R_0 = I
    residual_angles: np.ndarray  # (E,) per-pair residual angle (rad)


def _spanning_tree_init(i_idx, j_idx, R_rel, N, weights=None):
    """Chain relative rotations down the maximum spanning tree
    (InitializeFromMaximumSpanningTree, cc:63-111; inlier counts as weights).
    With unit weights this reduces to BFS chaining."""
    order = np.argsort(-(np.ones(len(i_idx)) if weights is None
                         else np.asarray(weights, dtype=np.float64)))
    # Kruskal on the sorted edges (maximum spanning forest)
    parent = np.arange(N)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    adj = [[] for _ in range(N)]
    for e in order:
        a, b = find(i_idx[e]), find(j_idx[e])
        if a != b:
            parent[a] = b
            adj[i_idx[e]].append((j_idx[e], e, False))
            adj[j_idx[e]].append((i_idx[e], e, True))

    R = np.tile(np.eye(3), (N, 1, 1))
    seen = np.zeros(N, bool)
    stack = [0]
    seen[0] = True
    while stack:
        i = stack.pop()
        for (j, e, inv) in adj[i]:
            if seen[j]:
                continue
            seen[j] = True
            # R_rel[e] = R_j R_i^T  =>  R_j = R_rel[e] R_i
            R[j] = (R_rel[e].T if inv else R_rel[e]) @ R[i]
            stack.append(j)
    return R, seen


def _build_solver(E, N, i_j, j_j, fix, opts):
    """One jitted program running both solve phases (static shapes)."""
    sigma = np.radians(opts.irls_loss_parameter_sigma)
    half_norm = opts.weight_type == "HALF_NORM"

    def A_mul(x):
        return (x[j_j] - x[i_j], x[fix])

    def At_mul(y):
        ye, yf = y
        out = (jax.ops.segment_sum(ye, j_j, N)
               - jax.ops.segment_sum(ye, i_j, N))
        return out.at[fix].add(yf)

    admm = make_l1_admm(A_mul, At_mul, 3 * (E + 1), 3 * N,
                        cg_iters=opts.cg_iters)

    def residuals(R, Rr, R_fix0):
        # r_e = -log(R_j^T R_rel R_i)  (ComputeResiduals, cc:467-469)
        Rerr = jnp.einsum("eba,ebc,ecd->ead", R[j_j], Rr, R[i_j])
        r_e = -_log_so3(Rerr)
        r_f = _log_so3(R_fix0.T @ R[fix])
        return r_e, r_f

    def update(R, x):
        # R <- R exp(-x)  (UpdateGlobalRotations, cc:429-433)
        return jnp.einsum("nab,nbc->nac", R, _expm_so3(-x))

    def avg_step(x):
        return jnp.mean(jnp.linalg.norm(x, axis=1))

    def cg_weighted(w_e, r_e, r_f):
        """CG on A^T W A x = A^T W r (SolveIRLS, cc:395-404)."""
        rhs = At_mul((w_e[:, None] * r_e, r_f))

        def AtWA(x):
            ye, yf = A_mul(x)
            return At_mul((w_e[:, None] * ye, yf))

        def body(_, carry):
            x, r, p, rs = carry
            live = rs > 1e-30
            Ap = AtWA(p)
            pAp = jnp.vdot(p, Ap)
            a = jnp.where(live, rs / jnp.where(pAp == 0, 1.0, pAp), 0.0)
            x = x + a * p
            r = r - a * Ap
            rs_new = jnp.vdot(r, r)
            beta = jnp.where(live, rs_new / rs, 0.0)
            return x, r, r + beta * p, rs_new

        x0 = jnp.zeros((N, 3), r_e.dtype)
        x, _, _, _ = jax.lax.fori_loop(
            0, opts.cg_iters, body, (x0, rhs, rhs, jnp.vdot(rhs, rhs)))
        return x

    @jax.jit
    def solve(R0, Rr):
        R_fix0 = R0[fix]

        # ---- L1 phase (SolveL1Regression, cc:277-331) ----
        def l1_cond(carry):
            R, k, cap, last_norm, done = carry
            return (~done) & (k < opts.max_num_l1_iterations)

        def l1_body(carry):
            R, k, cap, last_norm, _ = carry
            r_e, r_f = residuals(R, Rr, R_fix0)
            x = admm((r_e, r_f), jnp.zeros((N, 3), r_e.dtype), cap)
            curr_norm = jnp.linalg.norm(x)
            R = update(R, x)
            done = ((avg_step(x) < opts.l1_step_convergence_threshold)
                    | (jnp.abs(last_norm - curr_norm) < 1e-12))
            return R, k + 1, jnp.minimum(cap * 2, 100), curr_norm, done

        R, _, _, _, _ = jax.lax.while_loop(
            l1_cond, l1_body,
            (R0, jnp.asarray(0), jnp.asarray(10), jnp.asarray(0.0),
             jnp.asarray(opts.max_num_l1_iterations == 0)))

        # ---- IRLS phase (SolveIRLS, cc:334-419) ----
        def irls_cond(carry):
            R, k, done = carry
            return (~done) & (k < opts.max_num_irls_iterations)

        def irls_body(carry):
            R, k, _ = carry
            r_e, r_f = residuals(R, Rr, R_fix0)
            e2 = jnp.sum(r_e * r_e, axis=1)
            if half_norm:
                w = jnp.power(jnp.maximum(e2, 1e-20), (0.5 - 2.0) / 2.0)
            else:
                tmp = e2 + sigma * sigma
                w = sigma * sigma / (tmp * tmp)
            x = cg_weighted(w, r_e, r_f)
            R = update(R, x)
            done = avg_step(x) < opts.irls_step_convergence_threshold
            return R, k + 1, done

        R, _, _ = jax.lax.while_loop(
            irls_cond, irls_body,
            (R, jnp.asarray(0),
             jnp.asarray(opts.max_num_irls_iterations == 0)))

        r_e, _ = residuals(R, Rr, R_fix0)
        return R, jnp.linalg.norm(r_e, axis=1)

    return solve


def rotation_averaging(pairs, R_rel, N, weights=None,
                       opts: RotationEstimatorOptions | None = None
                       ) -> RotationAveragingResult:
    """Estimate global rotations from pairwise relative rotations.

    Args:
      pairs: (E, 2) 0-based camera index pairs (i, j).
      R_rel: (E, 3, 3) relative rotations with convention
        ``R_rel = R_j R_i^T`` (maps camera-i frame to camera-j frame).
      weights: optional (E,) MST weights (the reference uses pair inlier
        counts, cc:67).
    """
    opts = opts or RotationEstimatorOptions()
    pairs = np.asarray(pairs)
    R_rel = np.asarray(R_rel, dtype=np.float64)
    i_idx = pairs[:, 0]
    j_idx = pairs[:, 1]

    if opts.skip_initialization:
        R0, seen = np.tile(np.eye(3), (N, 1, 1)), np.ones(N, bool)
    else:
        R0, seen = _spanning_tree_init(i_idx, j_idx, R_rel, N, weights)
        if not seen.all():
            raise ValueError("view graph is not connected")

    solve = _build_solver(len(pairs), N, jnp.asarray(i_idx),
                          jnp.asarray(j_idx), 0, opts)
    R, ang = solve(jnp.asarray(R0), jnp.asarray(R_rel))

    # gauge-fix by right multiplication (preserves all relative rotations,
    # sets R_0 = I)
    R = np.asarray(R)
    R_out = R @ R[0].T[None]
    return RotationAveragingResult(R_out, np.asarray(ang))


def filter_pairs(pairs, R_rel, N, max_angle_deg: float = 10.0, weights=None,
                 opts: RotationEstimatorOptions | None = None):
    """Run rotation averaging and drop relative poses whose residual exceeds
    ``max_angle_deg`` — XM's use of the stage (global_mapper.cc:77-111 runs
    it twice purely as a filter)."""
    result = rotation_averaging(pairs, R_rel, N, weights=weights, opts=opts)
    keep = result.residual_angles < np.radians(max_angle_deg)
    return keep, result
