"""Global positioning: BATA translation/position averaging, TPU-native.

Re-design of the reference GLOMAP fork's Ceres-based ``GlobalPositioner``
(/root/reference/deps/glomap/glomap/estimators/global_positioning.cc:24-82;
cost /root/reference/deps/glomap/glomap/estimators/cost_function.h:11-41).
The reference stage is compiled but disabled in XM's truncated pipeline
(global_mapper.cc:188-390); xmtpu ships a working equivalent so the full
GLOMAP capability surface is covered.

The BATA residual per constraint k is ``r_k = d_k - s_k (x_{j(k)} - c_{i(k)})``
with a per-residual scale ``s_k >= 1e-5`` and a Huber loss (delta = 1e-1,
GlobalPositionerOptions ctor). Unknowns are camera centers (N, 3), point
positions (M, 3) and the scales. Instead of a general sparse Ceres solve,
this solves the same robust problem with an alternating scheme that is one
jitted XLA program:

* closed-form optimal scale ``s_k = max(1e-5, d_k . e_k / ||e_k||^2)`` —
  the expression the reference itself uses to seed scales
  (global_positioning.cc:273-277);
* Huber IRLS weights on the residual norm;
* a positions update by conjugate gradient on the weighted graph-Laplacian
  normal equations (matrix-free: two segment-sums per apply), with the
  global-translation gauge projected out.

Constraint families mirror the reference: camera->camera directions from
relative poses rotated into the world frame (``-R_j^T t_ij``,
global_positioning.cc:163-166) and camera->point bearings
(``R_i^T u_ik``, global_positioning.cc:262-266), selected by
``constraint_type`` exactly as GlobalPositionerOptions.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np


@dataclass
class PositionerOptions:
    """Mirrors GlobalPositionerOptions (global_positioning.h:9-47)."""

    constraint_type: str = "ONLY_POINTS"  # | ONLY_CAMERAS | POINTS_AND_CAMERAS
    #                                       | POINTS_AND_CAMERAS_BALANCED
    constraint_reweight_scale: float = 1.0
    min_num_view_per_track: int = 3
    huber_delta: float = 1e-1      # thres_loss_function (h:43-46)
    seed: int = 1
    position_scale: float = 100.0  # random init amplitude (cc:140-142)
    outer_iters: int = 64
    cg_iters: int = 12
    optimize_points: bool = True
    optimize_positions: bool = True
    optimize_scales: bool = True   # GlobalPositionerOptions (h:26-28); False
    #                                pins every per-residual scale at 1


def _solve_bata(src, dst, d, w_fix, n_var, u0, delta, outer_iters, cg_iters,
                free_mask, fix_scales=False):
    """Jitted IRLS + variable-projection Gauss-Newton BATA core.

    The per-residual scale is eliminated in closed form
    (``s* = max(d.e / ||e||^2, 1e-5)``, the expression the reference uses to
    seed its scales, global_positioning.cc:273-277), which makes the reduced
    residual ``r = (I - ee^T/e^Te) d`` and gives a Gauss-Newton step with the
    projected Jacobian ``J_k = s_k P_k B_k`` (Kaufman VarPro). Alternating
    scales/positions converges only linearly; VarPro-GN is quadratic on these
    near-zero-residual problems. Each GN system is solved matrix-free by CG
    (two segment-sums per apply), the translation gauge is projected out, and
    the scale gauge introduced by eliminating s is handled by projecting the
    step against the radial direction. A 3-point step backtracker keeps the
    robust cost monotone.

    src/dst: (K,) int32 indices into the stacked unknown array u (n_var, 3);
    d: (K, 3) observed directions; w_fix: (K,) static per-residual weights;
    free_mask: (n_var, 1) 1.0 where the unknown is optimized.
    """
    import jax
    import jax.numpy as jnp

    def edge_diff(u):
        return u[dst] - u[src]  # (K, 3)

    def gather_scatter(vals):
        # B^T vals: +vals at dst, -vals at src
        out = jnp.zeros((n_var, 3), vals.dtype)
        out = out.at[dst].add(vals)
        out = out.at[src].add(-vals)
        return out

    def project(u):
        # remove the global-translation gauge and freeze non-optimized vars
        return (u - jnp.mean(u, axis=0, keepdims=True)) * free_mask

    def scales_resid(u):
        e = edge_diff(u)
        ee = jnp.maximum(jnp.sum(e * e, axis=1), 1e-12)
        if fix_scales:
            s = jnp.ones(e.shape[0], e.dtype)
        else:
            s = jnp.maximum(jnp.sum(d * e, axis=1) / ee, 1e-5)
        r = d - s[:, None] * e
        return e, ee, s, r

    def robust_cost(u):
        _, _, _, r = scales_resid(u)
        rn = jnp.linalg.norm(r, axis=1)
        return jnp.sum(w_fix * jnp.where(rn <= delta, 0.5 * rn * rn,
                                         delta * (rn - 0.5 * delta)))

    def outer_body(_, u):
        e, ee, s, r = scales_resid(u)
        rn = jnp.linalg.norm(r, axis=1)
        w = w_fix * jnp.minimum(1.0, delta / jnp.maximum(rn, 1e-12))  # Huber
        ws2 = w * s * s

        def P(v):  # per-edge projector I - ee^T/e^Te
            return v - (jnp.sum(e * v, axis=1) / ee)[:, None] * e

        def H(v):
            return project(gather_scatter(ws2[:, None] * P(edge_diff(v))))

        b = project(gather_scatter((w * s)[:, None] * r))

        # CG for the GN step from zero
        r0 = b
        p0 = r0
        rs0 = jnp.vdot(r0, r0)

        def cg_body(_, carry):
            x, rr, p, rs = carry
            Hp = H(p)
            alpha = rs / jnp.maximum(jnp.vdot(p, Hp), 1e-30)
            x = x + alpha * p
            rr = rr - alpha * Hp
            rs_new = jnp.vdot(rr, rr)
            p = rr + (rs_new / jnp.maximum(rs, 1e-30)) * p
            return x, rr, p, rs_new

        step, _, _, _ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (jnp.zeros_like(u), r0, p0, rs0))
        if not fix_scales:
            # remove the radial (global scale) null direction of the reduced
            # cost (eliminating s makes the cost scale-invariant; with fixed
            # scales the radial direction is a real degree of freedom)
            un = project(u)
            uu = jnp.maximum(jnp.vdot(un, un), 1e-30)
            step = step - (jnp.vdot(step, un) / uu) * un

        # monotone multi-point backtracking on the robust cost
        alphas = jnp.array([1.0, 0.5, 0.25, 0.1, 0.01])
        cands = jnp.stack([project(u + a * step) for a in
                           [1.0, 0.5, 0.25, 0.1, 0.01]])
        costs = jax.vmap(robust_cost)(cands)
        costs = jnp.concatenate([costs, robust_cost(u)[None]])
        best = jnp.argmin(costs)
        return jnp.where(best == alphas.shape[0], project(u), cands[
            jnp.minimum(best, alphas.shape[0] - 1)])

    u = jax.lax.fori_loop(0, outer_iters, outer_body, project(u0))
    # final diagnostics
    _, _, s, r = scales_resid(u)
    rn = jnp.linalg.norm(r, axis=1)
    cost = jnp.sum(w_fix * jnp.where(rn <= delta, 0.5 * rn * rn,
                                     delta * (rn - 0.5 * delta)))
    return u, s, rn, cost


_solve_bata_jit = None


def global_positioning(cam_idx, tgt_idx, d_obs, n_cameras, n_points=0,
                       weights=None, init_positions=None, init_points=None,
                       opts: PositionerOptions = None):
    """Solve the BATA position problem.

    Args:
      cam_idx: (K,) camera index of each constraint's source camera.
      tgt_idx: (K,) target index; ``< n_cameras`` = another camera center,
        ``>= n_cameras`` = point ``tgt_idx - n_cameras``.
      d_obs: (K, 3) world-frame direction observations (need not be unit).
      weights: optional (K,) fixed per-residual weights (e.g. the 0.5
        down-weight for uncalibrated cameras, global_positioning.cc:283-296).
      init_positions/init_points: optional (N,3)/(M,3) initial values; when
        omitted, random as in the reference (cc:136-144, generate_random_*).

    Returns dict with ``positions`` (N,3) camera centers, ``points`` (M,3),
    ``scales`` (K,), ``residual_norms`` (K,), ``cost``.
    """
    import jax
    import jax.numpy as jnp

    opts = opts or PositionerOptions()
    cam_idx = np.asarray(cam_idx, dtype=np.int32)
    tgt_idx = np.asarray(tgt_idx, dtype=np.int32)
    d_obs = np.asarray(d_obs, dtype=np.float64).reshape(-1, 3)
    K = d_obs.shape[0]
    n_var = n_cameras + n_points
    if K == 0:
        raise ValueError("no constraints")
    if weights is None:
        weights = np.ones(K)
    weights = np.asarray(weights, dtype=np.float64)

    rng = np.random.default_rng(opts.seed)
    u0 = np.empty((n_var, 3))
    if init_positions is not None:
        u0[:n_cameras] = np.asarray(init_positions, dtype=np.float64)
    else:
        u0[:n_cameras] = opts.position_scale * rng.uniform(
            -1, 1, size=(n_cameras, 3))
    if n_points:
        if init_points is not None:
            u0[n_cameras:] = np.asarray(init_points, dtype=np.float64)
        else:
            u0[n_cameras:] = opts.position_scale * rng.uniform(
                -1, 1, size=(n_points, 3))

    free = np.ones((n_var, 1))
    if not opts.optimize_positions:
        free[:n_cameras] = 0.0
    if not opts.optimize_points:
        free[n_cameras:] = 0.0

    global _solve_bata_jit
    if _solve_bata_jit is None:
        _solve_bata_jit = jax.jit(_solve_bata,
                                  static_argnames=("n_var", "outer_iters",
                                                   "cg_iters", "fix_scales"))
    u, s, rn, cost = _solve_bata_jit(
        jnp.asarray(cam_idx), jnp.asarray(tgt_idx), jnp.asarray(d_obs),
        jnp.asarray(weights), n_var, jnp.asarray(u0),
        float(opts.huber_delta), int(opts.outer_iters), int(opts.cg_iters),
        jnp.asarray(free), fix_scales=not opts.optimize_scales)
    u = np.asarray(u)
    return {"positions": u[:n_cameras], "points": u[n_cameras:],
            "scales": np.asarray(s), "residual_norms": np.asarray(rn),
            "cost": float(cost)}


def camera_constraints(pair_i, pair_j, R_world, t_rel):
    """Camera->camera BATA directions from relative poses.

    ``t_rel[k]`` is the relative translation of pair (i, j) in camera-j
    coordinates (cam2_from_cam1); ``R_world[j]`` the world-from-camera-j
    rotation estimate. Direction is ``-R_j t_ij`` expressed in world frame
    (global_positioning.cc:163-166, with rotation.inverse() on the
    world2cam convention == our cam2world R)."""
    R_world = np.asarray(R_world, dtype=np.float64)
    t_rel = np.asarray(t_rel, dtype=np.float64).reshape(-1, 3)
    d = -np.einsum("kab,kb->ka", R_world[np.asarray(pair_j, int)], t_rel)
    return np.asarray(pair_i, int), np.asarray(pair_j, int), d


def point_constraints(obs_cam, obs_track, bearings, R_world, n_cameras,
                      min_num_view_per_track: int = 3):
    """Camera->point BATA directions from feature bearings.

    ``bearings[k]`` is the undistorted feature direction in camera
    ``obs_cam[k]``'s frame toward track ``obs_track[k]``; rotated into world
    by the camera rotation (global_positioning.cc:262-266). Tracks shorter
    than ``min_num_view_per_track`` are dropped (cc:231, h:32-33).

    Returns ``(cam_idx, tgt_idx, d, track_keep)`` where tgt_idx indexes the
    stacked unknown vector (points offset by n_cameras, reindexed densely)."""
    obs_cam = np.asarray(obs_cam, int)
    obs_track = np.asarray(obs_track, int)
    bearings = np.asarray(bearings, dtype=np.float64).reshape(-1, 3)
    R_world = np.asarray(R_world, dtype=np.float64)

    n_tracks = obs_track.max() + 1 if obs_track.size else 0
    counts = np.bincount(obs_track, minlength=n_tracks)
    track_keep = counts >= min_num_view_per_track
    keep = track_keep[obs_track]
    obs_cam, obs_track, bearings = (obs_cam[keep], obs_track[keep],
                                    bearings[keep])
    new_id = np.cumsum(track_keep) - 1
    tgt = n_cameras + new_id[obs_track]
    d = np.einsum("kab,kb->ka", R_world[obs_cam], bearings)
    return obs_cam, tgt.astype(int), d, track_keep
