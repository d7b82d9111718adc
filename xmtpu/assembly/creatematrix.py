"""Q-matrix assembly: build the SBA cost ``Q`` and recovery operator ``Abar``.

TPU-native re-design of ``create_matrix``
(/root/reference/utils/creatematrix.py:52-341).

Given the view graph (frame-landmark observation edges with weights) and the
depth-lifted 3-D landmark observations, translations and landmark positions
are eliminated in closed form (anchored Schur complement + Sherman-Morrison
rank-1 anchor correction), producing the single dense PSD cost matrix ``C``
(written as ``Q.bin`` by the reference) and the linear recovery operator
``Abar`` that reconstitutes translations/landmarks from the solved frames.

Where the reference fans out per-frame Gram blocks over a
``ProcessPoolExecutor`` (creatematrix.py:86-111) and per-column rank-1 updates
over a ``ThreadPoolExecutor`` (:298-305), this implementation is one jitted
XLA program: ``segment_sum`` scatter-adds for the per-frame reductions, MXU
GEMMs for the Schur back-substitution, and a single batched outer product for
the anchor correction.  The (N+M)x(N+M) translation/landmark block ``Qtp`` is
never materialized — it is applied implicitly through its diagonal + bipartite
structure.

Math map (reference line refs):
  V3  (N x M)  bipartite weight adjacency            (:67)
  Q2/Q3 diag   row / column sums of V3               (:71-72)
  Q1  (3N,3N)  per-frame weighted landmark Grams     (:17-31, 95-98)
  V1  (3N,N)   per-frame weighted landmark sums      (:27, 100-104)
  V2  (3N,M)   weighted landmark coordinates         (:28, 106-110)
  VT = Q2_bar - V3_bar_F V3_bar_F^T (anchored Schur) (:156-170)
  2 rounds of block back-substitution                (:275-280)
  rank-1 anchor correction via a0, v2, S             (:289-305)
  C = A^T Qtp A + Vtp A + (Vtp A)^T + Q1             (:313-324)

One divergence: the reference symmetrizes C only when the asymmetry exceeds
1e-8 x N^2 (:326-328); we always symmetrize (a no-op within that tolerance).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xmtpu.io.bin_format import save_matrix_to_bin


@partial(jax.jit, static_argnames=("N", "M", "dtype"))
def _assemble(w, f, l, x, N: int, M: int, dtype=jnp.float64):
    # f32 matmuls on TPU otherwise lower to bf16 passes (~3 decimal digits
    # -- measured: the n=1934 mixed assembly shifted the certified optimum
    # by 40% and flipped rotation dets); force full-f32 MXU accumulation
    with jax.default_matmul_precision("highest"):
        return _assemble_impl(w, f, l, x, N, M, dtype)


def _assemble_impl(w, f, l, x, N: int, M: int, dtype):
    """Core assembly.  w:(E,) weights, f/l:(E,) 0-based frame/landmark ids,
    x:(E,3) lifted landmark observations.

    ``dtype=jnp.float32`` runs the heavy middle (the O(N^2(N+M)) GEMMs and
    the VT Cholesky solves — ~150 s of emulated f64 at n~1900) in hardware
    f32; inputs quantize at ~1e-8 and the assembled C carries ~1e-6
    relative error, far below the pipeline's loose-tolerance operating
    points (the solve then certifies the perturbed problem consistently).
    Outputs are returned as f64 either way."""
    w = w.astype(dtype)
    x = x.astype(dtype)

    q2 = jax.ops.segment_sum(w, f, N)                    # Q2 diagonal
    q3 = jax.ops.segment_sum(w, l, M)                    # Q3 diagonal

    wx = w[:, None] * x                                  # (E,3)
    Q1 = jax.ops.segment_sum(wx[:, :, None] * x[:, None, :], f, N)   # (N,3,3)
    V1 = jax.ops.segment_sum(wx, f, N)                   # (N,3)
    V3 = jnp.zeros((N, M), dtype).at[f, l].add(w)
    V2 = jnp.zeros((N, 3, M), dtype).at[f, :, l].add(wx)  # (N,3,M)

    inv_sqrt_q3 = 1.0 / jnp.sqrt(q3)
    V3_bar = V3[1:]                                      # (N-1, M)
    V3_bar_F = V3_bar * inv_sqrt_q3[None, :]
    VT = jnp.diag(q2[1:]) - V3_bar_F @ V3_bar_F.T        # (N-1, N-1)

    # Vtp^T = [V1^T; -V2^T] : (N+M, 3N)
    V1_big = jnp.zeros((N, 3 * N), dtype)
    rows = jnp.arange(N)
    cols = (3 * rows[:, None] + jnp.arange(3)[None, :])
    V1_big = V1_big.at[rows[:, None], cols].set(V1)      # row i has v1_i in block i
    V2_flat = V2.reshape(3 * N, M)  # flat row = 3*frame + coord
    Vtp_T = jnp.concatenate([V1_big, -V2_flat.T], axis=0)  # (N+M, 3N)

    def qtp_apply(A):
        """Qtp @ A for A (N+M, k): Qtp = [[diag(q2), -V3], [-V3^T, diag(q3)]]."""
        At, Ap = A[:N], A[N:]
        top = q2[:, None] * At - V3 @ Ap
        bot = -V3.T @ At + q3[:, None] * Ap
        return jnp.concatenate([top, bot], axis=0)

    # RHS = [Qtp_bar^T Vtp^T, a0]  (N+M-1, 3N+1); Qtp symmetric so
    # Qtp_bar^T = Qtp[1:, :].
    a0 = jnp.concatenate([jnp.zeros((N - 1,), dtype), -V3[0]])   # (N+M-1,)
    RHS_left = qtp_apply(Vtp_T)[1:]                      # (N+M-1, 3N)
    RHS = jnp.concatenate([RHS_left, a0[:, None]], axis=1)

    RHS_A, RHS_B = RHS[: N - 1], RHS[N - 1:]
    cho = jax.scipy.linalg.cho_factor(VT)
    for _ in range(2):                                   # creatematrix.py:275-280
        RHS_B = RHS_B * inv_sqrt_q3[:, None]
        RHS_A = jax.scipy.linalg.cho_solve(cho, RHS_A + V3_bar_F @ RHS_B)
        RHS_B = RHS_B + V3_bar_F.T @ RHS_A
        RHS_B = RHS_B * inv_sqrt_q3[:, None]

    A = jnp.concatenate([
        jnp.zeros((1, 3 * N), dtype),
        -RHS_A[:, :-1],
        -RHS_B[:, :-1],
    ], axis=0)                                           # (N+M, 3N)
    v2 = jnp.concatenate([RHS_A[:, -1], RHS_B[:, -1]])   # (N+M-1,)

    S = 1.0 + jnp.dot(a0, v2)
    # rank-1 anchor correction, one batched outer product (:289-305)
    proj = a0 @ A[1:]                                    # (3N,)
    A = A.at[1:].add(-jnp.outer(v2, proj) / S)
    Abar = A[1:]

    QA = qtp_apply(A)                                    # (N+M, 3N)
    C = A.T @ QA
    T = Vtp_T.T @ A                                      # Vtp @ A  (3N, 3N)
    C = C + T + T.T

    # += Q1 block diagonal
    bi = 3 * jnp.arange(N)
    r3 = bi[:, None, None] + jnp.arange(3)[None, :, None]
    c3 = bi[:, None, None] + jnp.arange(3)[None, None, :]
    C = C.at[r3, c3].add(Q1)

    C = 0.5 * (C + C.T)
    return (C.astype(jnp.float64), Abar.astype(jnp.float64),
            S.astype(jnp.float64))


def create_matrix_arrays(weights, edges, landmarks, precision: str = "f64"):
    """Assemble (C, Abar) in memory.

    Args:
      weights: (E,) observation weights.
      edges: (E, 2) int array of 1-based ``[frame, landmark]`` ids (the
        reference's convention, creatematrix.py:63-67).
      landmarks: (E, 3) depth-lifted 3-D observations in camera frame.
      precision: "f64" (reference parity) or "mixed" (hardware-f32 heavy
        middle, ~1e-6 relative C error; falls back to f64 automatically if
        the f32 VT Cholesky breaks down).

    Returns:
      C: (3N, 3N) f64 cost matrix.  Abar: (N+M-1, 3N) f64 recovery operator.
      Both are device arrays (np.asarray() pulls them to host if needed).
    """
    edges = np.asarray(edges)
    weights = np.asarray(weights).ravel()
    landmarks = np.asarray(landmarks)
    f = jnp.asarray(edges[:, 0] - 1, jnp.int32)
    l = jnp.asarray(edges[:, 1] - 1, jnp.int32)
    N = int(edges[:, 0].max())
    M = int(edges[:, 1].max())
    dtype = jnp.float32 if precision == "mixed" else jnp.float64
    C, Abar, S = _assemble(jnp.asarray(weights), f, l, jnp.asarray(landmarks),
                           N, M, dtype=dtype)
    if dtype == jnp.float32:
        # one batched fetch (CLAUDE.md rule 5): detect f32 breakdown
        # anywhere — Cholesky NaNs (S) OR overflow in C/Abar (e.g.
        # w*x^2 > f32 max on unnormalized metric-scale scenes) — and redo
        # in f64
        ok, S_v = jax.device_get(
            (jnp.isfinite(C).all() & jnp.isfinite(Abar).all()
             & jnp.isfinite(S), S))
        if not bool(ok):
            C, Abar, S_v = _assemble(jnp.asarray(weights), f, l,
                                     jnp.asarray(landmarks), N, M)
    else:
        S_v = S
    if float(S_v) == 0.0:
        raise ValueError("S is 0")  # anchor guard (creatematrix.py:301-302)
    # keep device residency: C is (3N)^2 and Abar (N+M-1, 3N) — pulling them
    # through the remote tunnel costs ~720 MB at n~1900, and every consumer
    # (solver, certificate, recovery) operates on device
    return C, Abar


def create_matrix(weights, edges, landmarks, output_path):
    """File-emitting wrapper matching the reference signature
    (creatematrix.py:52): writes ``Q.bin`` and ``Abar.bin`` to
    ``output_path`` and also returns ``(C, Abar)``."""
    C, Abar = create_matrix_arrays(weights, edges, landmarks)
    save_matrix_to_bin(os.path.join(output_path, "Abar.bin"), Abar)
    save_matrix_to_bin(os.path.join(output_path, "Q.bin"), C)
    return C, Abar
