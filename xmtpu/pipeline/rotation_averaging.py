"""Robust global rotation averaging (L1-IRLS) — the GLOMAP stage XM uses to
filter bad relative poses.

Re-design of the vendored Theia-style solver
(/root/reference/deps/glomap/glomap/estimators/global_rotation_averaging.{h,cc}):
given relative rotations ``R_ij`` on a view graph, estimate global rotations
``R_i`` minimizing a robust norm of the residual rotations
``R_ij R_i R_j^T`` (world-to-camera convention: ``R_ij ~ R_j R_i^T`` maps
camera-i coords to camera-j coords... here we use the standard
``R_ij = R_j R_i^T`` convention on camera-to-world inverses).

Algorithm (matching the reference's two phases, used in XM's pipeline purely
to *filter* outlier pairs, global_mapper.cc:77-111):

1. spanning-tree initialization (BFS from the densest node);
2. iteratively reweighted least squares in the tangent space: each sweep
   solves the linear system ``w_ij (omega_i - omega_j) = w_ij log(R_err,ij)``
   by conjugate gradient on the weighted graph Laplacian, with L1/Huber
   weights — all batched jnp over edges, CG over the (3N) unknowns.

``filter_pairs`` reproduces the downstream use: drop relative poses whose
post-averaging residual angle exceeds a threshold (the reference runs
rotation averaging twice, filtering in between).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from xmtpu.pipeline.refine import _expm_so3  # zero-safe Rodrigues
import jax
import jax.numpy as jnp


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


class RotationAveragingResult(NamedTuple):
    rotations: np.ndarray   # (N, 3, 3) global rotations, R_0 = I
    residual_angles: np.ndarray  # (E,) per-pair residual angle (rad)


def _spanning_tree_init(i_idx, j_idx, R_rel, N):
    """BFS spanning-tree chaining of relative rotations (host-side)."""
    adj = [[] for _ in range(N)]
    for e, (i, j) in enumerate(zip(i_idx, j_idx)):
        adj[i].append((j, e, False))
        adj[j].append((i, e, True))
    R = np.tile(np.eye(3), (N, 1, 1))
    seen = np.zeros(N, bool)
    order = [0]
    seen[0] = True
    while order:
        i = order.pop()
        for (j, e, inv) in adj[i]:
            if seen[j]:
                continue
            seen[j] = True
            # R_rel[e] = R_j R_i^T  =>  R_j = R_rel[e] R_i
            R[j] = (R_rel[e].T if inv else R_rel[e]) @ R[i]
            order.append(j)
    return R, seen


def rotation_averaging(pairs, R_rel, N, iters: int = 32, cg_iters: int = 50,
                       huber_angle: float = 0.1) -> RotationAveragingResult:
    """Estimate global rotations from pairwise relative rotations.

    Args:
      pairs: (E, 2) 0-based camera index pairs (i, j).
      R_rel: (E, 3, 3) relative rotations with convention
        ``R_rel = R_j R_i^T`` (maps camera-i frame to camera-j frame).
      huber_angle: IRLS Huber width in radians (the reference's L1 behavior
        with a small smooth core).
    """
    pairs = np.asarray(pairs)
    R_rel = np.asarray(R_rel)
    i_idx = pairs[:, 0]
    j_idx = pairs[:, 1]

    R0, seen = _spanning_tree_init(i_idx, j_idx, R_rel, N)
    if not seen.all():
        raise ValueError("view graph is not connected")

    Ri = jnp.asarray(R0)
    i_j = jnp.asarray(i_idx)
    j_j = jnp.asarray(j_idx)
    Rr = jnp.asarray(R_rel)

    @jax.jit
    def sweep(R):
        # residual per edge: r_e = log( R_j^T R_rel R_i )  (zero at consistency)
        Rres = jnp.einsum("eba,ebc,ecd->ead", R[j_j], Rr, R[i_j])
        r = _log_so3(Rres)                                  # (E, 3)
        ang = jnp.linalg.norm(r, axis=-1)
        w = jnp.where(ang <= huber_angle, 1.0, huber_angle / jnp.maximum(ang, 1e-12))

        # weighted graph-Laplacian CG for tangent updates omega (N, 3):
        #   sum_e w_e (omega_i - omega_j + r_e) -> least squares
        def Lmul(om):
            d = om[i_j] - om[j_j]
            out = jax.ops.segment_sum(w[:, None] * d, i_j, R.shape[0])
            out = out - jax.ops.segment_sum(w[:, None] * d, j_j, R.shape[0])
            # gauge: pin camera 0
            return out.at[0].set(om[0])

        b = -(jax.ops.segment_sum(w[:, None] * r, i_j, R.shape[0])
              - jax.ops.segment_sum(w[:, None] * r, j_j, R.shape[0]))
        b = b.at[0].set(0.0)

        def cg_body(_, carry):
            x, rr, p, rs = carry
            live = rs > 1e-30
            Ap = Lmul(p)
            alpha = jnp.where(live, rs / jnp.vdot(p, Ap), 0.0)
            x = x + alpha * p
            rr = rr - alpha * Ap
            rs_new = jnp.vdot(rr, rr)
            beta = jnp.where(live, rs_new / rs, 0.0)
            return x, rr, rr + beta * p, rs_new

        x0 = jnp.zeros_like(b)
        x, _, _, _ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (x0, b, b, jnp.vdot(b, b)))
        # body-frame (right) update: with R_i <- R_i exp(phi_i) the linearized
        # residual is r + phi_i - phi_j (identity Jacobians); a left update
        # would need R_i^T-rotated Jacobians
        return jnp.einsum("nab,nbc->nac", R, _expm_so3(x)), ang

    ang = None
    for _ in range(iters):
        Ri, ang = sweep(Ri)

    # final residuals; gauge-fix by right multiplication (preserves all
    # relative rotations, sets R_0 = I)
    Rres = jnp.einsum("eba,ebc,ecd->ead", Ri[j_j], Rr, Ri[i_j])
    ang = np.asarray(jnp.linalg.norm(_log_so3(Rres), axis=-1))
    R_out = np.asarray(Ri) @ np.asarray(Ri[0]).T[None]
    return RotationAveragingResult(R_out, ang)


def filter_pairs(pairs, R_rel, N, max_angle_deg: float = 10.0, **kw):
    """Run rotation averaging and drop relative poses whose residual exceeds
    ``max_angle_deg`` — XM's use of the stage (global_mapper.cc:77-111 runs
    it twice purely as a filter)."""
    result = rotation_averaging(pairs, R_rel, N, **kw)
    keep = result.residual_angles < np.radians(max_angle_deg)
    return keep, result
