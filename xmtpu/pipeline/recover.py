"""Solution recovery / rounding: factor -> rotations, scales, poses, points.

Re-design of ``recover_XM`` (/root/reference/utils/recoversolution.py:4-85),
vectorized with batched numpy linalg (the reference loops per camera).

Steps:
* rank > 3: top-3 eigenpairs of ``X = sR sR^T`` via a thin SVD of the
  (3N, o) factor (the reference eigendecomposes the materialized X,
  :11-30), reporting suboptimality when the rank-4 tail is non-negligible;
* split each 3x3 block into scale ``s_i = ||B_i||_F / sqrt(3)`` and frame
  ``R_i = B_i / s_i`` (:42-44);
* gauge-fix to camera 0 (:46-48);
* global sign vote on ``det < 0`` then per-block SVD projection to O(3)->SO(3)
  (:50-73);
* recover translations and landmarks ``y = Abar (sR)^T`` with a zero column
  prepended for the anchor (:75-85).

This is host-side post-processing (runs once per solve) — numpy is the right
tool; the batched eigh/svd dominate and vectorize fine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def recover_XM_implicit(Q, R, s, lam, verbose: bool = True):
    """Recovery through the implicit SchurQ operator — no dense ``Abar``.

    Same outputs as :func:`recover_XM`; the translation/landmark solve is
    ``Q.recover_y`` (structural ``-Mbar^{-1} Vtp_bar^T sR``) and the
    suboptimality report uses two operator applies instead of a dense
    inner product.
    """
    R = np.asarray(R, np.float64)
    s = np.asarray(s, np.float64).ravel()
    N = s.shape[0]
    o = R.shape[1]

    sR_blocks = R.reshape(N, 3, o) * s[:, None, None]

    if o > 3:
        sR = sR_blocks.reshape(3 * N, o)
        # thin SVD of the (3N, o) factor == top eigenpairs of X = sR sR^T
        U, sv, _ = np.linalg.svd(sR, full_matrices=False)
        eig_vals = sv * sv
        sR_real3 = (U[:, :3] * sv[:3]).T
        if abs(eig_vals[3] / eig_vals[2]) < 1e-3:
            if verbose:
                print("Optimal rank is 3")
        else:
            a = jnp.asarray(sR_real3.T)
            b = jnp.asarray(sR)
            subopt = (float(jnp.vdot(a, Q.apply(a)) - jnp.vdot(b, Q.apply(b)))
                      + lam * np.sum((np.sum(sR_real3.T**2, axis=1) - 1) ** 2) / 3
                      - lam * np.sum((np.sum(sR**2, axis=1) - 1) ** 2) / 3)
            if verbose:
                print("suboptimality: ", subopt)
        B = sR_real3.reshape(3, N, 3).transpose(1, 0, 2)
    else:
        B = sR_blocks.transpose(0, 2, 1)

    s_real = np.linalg.norm(B, axis=(1, 2)) / np.sqrt(3.0)
    Rb = B / s_real[:, None, None]
    Rb = np.einsum("ab,nbc->nac", Rb[0].T.copy(), Rb)
    U, _, Vt = np.linalg.svd(Rb)
    dets = np.linalg.det(U @ Vt)
    negative = int(np.sum(dets < 0))
    if negative > 0 and verbose:
        print("warning: some det(R) < 0")
    if negative > N / 2:
        Rb = -Rb
        U, _, Vt = np.linalg.svd(Rb)
    Rb = U @ Vt
    sB = Rb * s_real[:, None, None]
    R_real = Rb.transpose(1, 0, 2).reshape(3, 3 * N)
    sR_real = sB.transpose(1, 0, 2).reshape(3, 3 * N)

    ybar_est = np.asarray(Q.recover_y(jnp.asarray(sR_real.T)))
    y_est = np.hstack((np.zeros((3, 1)), ybar_est.T))
    t_est = y_est[:, :N]
    p_est = y_est[:, N:]
    return R_real, s_real, p_est, t_est


def recover_XM(Q, R, s, Abar, lam, verbose: bool = True):
    """Recover rotations / scales / translations / landmark positions.

    Args:
      Q: (3N, 3N) cost matrix (used only for the suboptimality report).
      R: (3N, o) solved factor.
      s: (N,) or (N, 1) extended scales (``s.bin`` contents).
      Abar: (N+M-1, 3N) recovery operator.
      lam: scale regularization weight.

    Returns:
      ``(R_real, s_real, p_est, t_est)`` — R_real (3, 3N) with 3x3 camera-to-
      world blocks, s_real (N,), p_est (3, M), t_est (3, N).
    """
    R = np.asarray(R, np.float64)
    s = np.asarray(s, np.float64).ravel()
    N = s.shape[0]
    o = R.shape[1]

    sR_blocks = R.reshape(N, 3, o) * s[:, None, None]

    if o > 3:
        sR = sR_blocks.reshape(3 * N, o)
        # top-3 eigenpairs of X = sR sR^T are the left singular triplets of
        # the THIN (3N, o) factor — an O(3N o^2) economy SVD instead of the
        # reference's O((3N)^2) eigendecomposition of the materialized X
        # (recoversolution.py:11-30; same values exactly)
        U, sv, _ = np.linalg.svd(sR, full_matrices=False)
        eig_vals = sv * sv                                # descending
        sR_real = (U[:, :3] * sv[:3]).T
        if abs(eig_vals[3] / eig_vals[2]) < 1e-3:
            if verbose:
                print("Optimal rank is 3")
        else:
            # <Q, X_new - X> through the factors: tr(A^T Q A) - tr(B^T Q B)
            # — device matvecs, never materializing the (3N, 3N) X
            from xmtpu.ops.qop import as_qop

            qop = as_qop(Q)
            A = jnp.asarray(sR_real.T)
            B = jnp.asarray(sR)
            subopt = (float(jnp.vdot(A, qop.apply(A))
                            - jnp.vdot(B, qop.apply(B)))
                      + lam * np.sum((np.einsum("ij,ij->i",
                                                sR_real.T, sR_real.T) - 1) ** 2) / 3
                      - lam * np.sum((np.einsum("ij,ij->i", sR, sR) - 1) ** 2) / 3)
            if verbose:
                print("suboptimality: ", subopt)
        # column-blocks of the (3, 3N) matrix, as an (N, 3, 3) batch
        B = sR_real.reshape(3, N, 3).transpose(1, 0, 2)
    else:
        B = sR_blocks.transpose(0, 2, 1)                 # B_i = (s_i R_i)^T

    s_real = np.linalg.norm(B, axis=(1, 2)) / np.sqrt(3.0)
    Rb = B / s_real[:, None, None]                       # (N, 3, 3) c2w frames

    # gauge fix to camera 0 (:46-48)
    Rb = np.einsum("ab,nbc->nac", Rb[0].T.copy(), Rb)

    # global sign vote (:50-63)
    U, _, Vt = np.linalg.svd(Rb)
    dets = np.linalg.det(U @ Vt)
    negative = int(np.sum(dets < 0))
    if negative > 0 and verbose:
        print("warning: some det(R) < 0")
    if negative > N / 2:
        Rb = -Rb
        U, _, Vt = np.linalg.svd(Rb)

    # per-block SVD projection to the orthogonal group (:65-73)
    Rb = U @ Vt
    sB = Rb * s_real[:, None, None]

    R_real = Rb.transpose(1, 0, 2).reshape(3, 3 * N)
    sR_real = sB.transpose(1, 0, 2).reshape(3, 3 * N)

    # translations and landmarks (:75-85).  When Abar lives on the device
    # (in-memory pipeline), multiply there: pulling the (N+M-1, 3N) operator
    # through the remote tunnel costs ~450 MB at n~1900 while the product is
    # (N+M-1, 3) — tiny.
    if isinstance(Abar, jax.Array):
        ybar_est = np.asarray(
            jnp.matmul(Abar, jnp.asarray(sR_real.T),
                       precision=jax.lax.Precision.HIGHEST))
    else:
        ybar_est = np.asarray(Abar, np.float64) @ sR_real.T  # (N+M-1, 3)
    y_est = np.hstack((np.zeros((3, 1)), ybar_est.T))    # (3, N+M)
    t_est = y_est[:, :N]
    p_est = y_est[:, N:]
    return R_real, s_real, p_est, t_est
