"""Product-manifold primitives for the XM Burer-Monteiro factorization.

The search space is the product manifold

    M = (St_row(3, o))^n  x  R_{>0}^{n-1}

where ``St_row(3, o)`` is the set of 3 x o matrices with **orthonormal rows**
(so that ``R_i R_i^T = I_3`` and ``X_ii = s_i^2 I_3``), and the first camera's
scale is pinned to 1.  The Riemannian metric is the Frobenius metric on the
rotation-frame factors and the scale-invariant metric ``g_s(u, v) = sum_i
u_i v_i / s_i^2`` on the scale factor (reference:
``XM/include/XM/trustregion.h:67-74`` together with the ``DnMatDnMatDivide``
calls at ``:471,483,565,625,667``).

Conventions
-----------
* ``R``  : (n, 3, o) float array — per-camera frames, orthonormal rows.
* ``s_ex``: (n,) with ``s_ex[0] == 1`` pinned; free scales are ``s = s_ex[1:]``.
* Tangent vectors use the same shapes; scale tangents are length ``n-1``.
* "flat" layout (3n, o) = ``R.reshape(3n, o)`` interoperates with the Q matrix.

Every function here is pure jnp, shape-static, vectorized over the camera axis
(no Python loops, no vmap needed), and differentiable.  They replace the CUDA
primitive library ``XM/include/Dense/*`` (batchedQR.h, matdiagmul.h, matdot.h,
matdivide.h, transpose.h) with fused XLA ops.

A note on one semantic divergence: the reference's MATLAB comment for
``ehess2rhess`` (trustregion.h:258-266) writes ``rhs = ehesss .* s.^2 - su .*
egrads .* s`` but the CUDA code (trustregion.h:288-293) computes ``+``.  The
``+`` sign is the geometrically correct Riemannian Hessian for the ``1/s^2``
metric (Christoffel symbol ``Gamma = -1/s``), and it is what the shipped
binary executes, so xmtpu uses ``+``.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

# Formulation of the per-camera 3x3 contractions (gram3/apply3), the hot
# non-GEMM ops of every tCG iteration:
#   "einsum" — batched dot_general; lowers to MXU batch-matmuls whose 3xo
#       operands pad to full tiles (and, under f64, to the ~6-pass two-float
#       matmul emulation) — one kernel per contraction, poor fusion.
#   "elem"   — broadcast-multiply + axis reduction; pure VPU work that XLA
#       fuses with the surrounding elementwise chain (f64 stays cheap
#       two-float adds/muls instead of emulated matmuls).
# Measured on the TPU testbeds (docs/PERFORMANCE.md "tCG fusion"): elem wins
# on both; einsum kept for A/B via XMTPU_GRAM3=einsum.
_GRAM3_IMPL = os.environ.get("XMTPU_GRAM3", "elem")


def gram3(A: jax.Array, B: jax.Array) -> jax.Array:
    """Per-camera row-Gram ``S[i] = A_i B_i^T``: (n,3,o)x(n,3,o) -> (n,3,3)."""
    if _GRAM3_IMPL == "elem":
        return (A[:, :, None, :] * B[:, None, :, :]).sum(-1)
    return jnp.einsum("nko,nlo->nkl", A, B)


def apply3(S: jax.Array, R: jax.Array) -> jax.Array:
    """Per-camera block apply ``S_i R_i``: (n,3,3)x(n,3,o) -> (n,3,o)."""
    if _GRAM3_IMPL == "elem":
        return (S[:, :, :, None] * R[:, None, :, :]).sum(2)
    return jnp.einsum("nkl,nlo->nko", S, R)


def flatten(R: jax.Array) -> jax.Array:
    """(n, 3, o) -> (3n, o)."""
    n = R.shape[0]
    return R.reshape(3 * n, R.shape[2])


def unflatten(Rf: jax.Array) -> jax.Array:
    """(3n, o) -> (n, 3, o)."""
    return Rf.reshape(Rf.shape[0] // 3, 3, Rf.shape[1])


def identity_frames(n: int, o: int, dtype=jnp.float64) -> jax.Array:
    """Rank-``o`` identity initialization: each frame is ``[I_3 | 0]``.

    Matches the staircase's o=3 init (XM/src/XM_main.cu:230-237).
    """
    eye = jnp.concatenate(
        [jnp.eye(3, dtype=dtype), jnp.zeros((3, o - 3), dtype=dtype)], axis=1
    )
    return jnp.broadcast_to(eye, (n, 3, o))


def scale_blocks(R: jax.Array, s_ex: jax.Array) -> jax.Array:
    """Per-camera block scaling ``sR_i = s_i * R_i`` (Dense/matdiagmul.h:28-57)."""
    return R * s_ex[:, None, None]


def block_dots(A: jax.Array, B: jax.Array) -> jax.Array:
    """Per-camera full-block Frobenius dot ``<A_i, B_i>`` for i >= 1.

    Returns (n-1,), skipping the anchored camera 0
    (Dense/matdiagmul.h:61-90 ``dnmat_Ddot_colomn_batch``).
    """
    return jnp.einsum("nko,nko->n", A[1:], B[1:])


def sym3(M: jax.Array) -> jax.Array:
    """Batched 3x3 symmetrization ``(M + M^T)/2`` (Dense/transpose.h:41-58)."""
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def inner(aR: jax.Array, bR: jax.Array, a_s: jax.Array, b_s: jax.Array,
          s: jax.Array) -> jax.Array:
    """Riemannian inner product: ``<aR, bR>_F + sum(a_s * b_s / s^2)``."""
    return jnp.vdot(aR, bR) + jnp.sum(a_s * b_s / (s * s))


def project(R: jax.Array, s: jax.Array, gR: jax.Array, gs: jax.Array):
    """Tangent projection / euclidean-to-riemannian gradient conversion.

    ``pgR_i = gR_i - sym(R_i gR_i^T) R_i`` ;  ``pgs = s^2 * gs``
    (trustregion.h:297-317).
    """
    S = sym3(gram3(R, gR))
    pgR = gR - apply3(S, R)
    pgs = s * s * gs
    return pgR, pgs


def ehess2rhess(ehR: jax.Array, ehs: jax.Array, egR: jax.Array, egs: jax.Array,
                R: jax.Array, s: jax.Array, Ru: jax.Array, su: jax.Array,
                Segr: jax.Array | None = None):
    """Euclidean-to-Riemannian Hessian conversion (trustregion.h:258-295).

    ``rhR_i = P_Ri( ehR_i - sym(R_i egR_i^T) Ru_i )``
    ``rhs   = ehs * s^2 + su * s * egs``   (the CUDA ``+`` sign; see module doc)

    ``Segr`` optionally supplies the precomputed ``sym(R egR^T)`` — constant
    across a tCG inner loop (R and egR are fixed per outer iteration), so the
    solver hoists it out of the loop body.
    """
    if Segr is None:
        Segr = sym3(gram3(R, egR))
    rhR = ehR - apply3(Segr, Ru)
    S2 = sym3(gram3(R, rhR))
    rhR = rhR - apply3(S2, R)
    rhs = ehs * s * s + su * s * egs
    return rhR, rhs


def mgs_rows(A: jax.Array) -> jax.Array:
    """Batched modified Gram-Schmidt orthonormalization of the 3 rows of each
    (3, o) block — the frame retraction's QR step.

    Semantics mirror the hand-written one-thread-per-camera kernel
    (Dense/batchedQR.h:42-67): normalize row 0, orthogonalize rows 1,2 against
    it; normalize row 1, orthogonalize row 2; normalize row 2.  No sign fix
    (plain MGS), matching the kernel rather than the MATLAB comment at
    trustregion.h:319-327.
    """
    r0 = A[:, 0, :]
    r1 = A[:, 1, :]
    r2 = A[:, 2, :]

    r0 = r0 / jnp.linalg.norm(r0, axis=-1, keepdims=True)
    r1 = r1 - jnp.einsum("no,no->n", r0, r1)[:, None] * r0
    r2 = r2 - jnp.einsum("no,no->n", r0, r2)[:, None] * r0
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = r2 - jnp.einsum("no,no->n", r1, r2)[:, None] * r1
    r2 = r2 / jnp.linalg.norm(r2, axis=-1, keepdims=True)
    return jnp.stack([r0, r1, r2], axis=1)


def retract(R: jax.Array, s_ex: jax.Array, vR: jax.Array, vs: jax.Array,
            lr) -> tuple[jax.Array, jax.Array]:
    """Product-manifold retraction (trustregion.h:319-351).

    Frames: ``R_new = mgs_rows(R + lr * vR)``.
    Scales: ``s_new = s * exp(lr * vs / s)`` on the free scales
    (``positiveManifoldRetractionKernal``, trustregion.h:18-24); camera 0's
    scale stays pinned at 1.
    """
    R_new = mgs_rows(R + lr * vR)
    s = s_ex[1:]
    s_new = s * jnp.exp(lr * vs / s)
    s_ex_new = jnp.concatenate([s_ex[:1], s_new])
    return R_new, s_ex_new


def objective(qmul, R: jax.Array, s_ex: jax.Array, lam) -> jax.Array:
    """``f = <sR, Q sR> + lam * sum((s_i^2 - 1)^2)`` (trustregion.h:162-170).

    ``qmul`` maps a flat (3n, o) array to ``Q @ Y``.
    """
    sR = flatten(scale_blocks(R, s_ex))
    s = s_ex[1:]
    return jnp.vdot(sR, qmul(sR)) + lam * jnp.sum((s * s - 1.0) ** 2)


def objective_from_sR(qmul, sR_flat: jax.Array, s_ex: jax.Array, lam) -> jax.Array:
    s = s_ex[1:]
    return jnp.vdot(sR_flat, qmul(sR_flat)) + lam * jnp.sum((s * s - 1.0) ** 2)


def egrad(qmul, R: jax.Array, s_ex: jax.Array, lam):
    """Euclidean gradient (trustregion.h:173-194).

    ``dfdsR = 2 Q sR``;  ``gR = dfdsR .* s_ex``;
    ``gs_i = <dfdsR_i, R_i> + 4 lam (s_i^2 - 1) s_i``  (i >= 1).
    """
    gR, gs, _ = egrad_csr(qmul, R, s_ex, lam)
    return gR, gs


def egrad_csr(qmul, R: jax.Array, s_ex: jax.Array, lam):
    """``egrad`` that also returns ``CsR = 2 Q sR`` (n, 3, o).

    The reference recomputes this GEMM when hoisting ``CsR`` for the tCG loop
    (trustregion.h:553) right after the gradient's own ``C sR`` product
    (trustregion.h:187); here the solver reuses the gradient's — one O(n^2 o)
    GEMM per outer iteration instead of two.
    """
    sR = flatten(scale_blocks(R, s_ex))
    dfdsR = unflatten(2.0 * qmul(sR))
    gR, gs = egrad_from_csr(dfdsR, R, s_ex, lam)
    return gR, gs, dfdsR


def egrad_from_csr(dfdsR: jax.Array, R: jax.Array, s_ex: jax.Array, lam):
    """Euclidean gradient from an already-computed ``dfdsR = 2 Q sR``.

    The trust-region loop carries ``Q sR`` across outer iterations (the
    accept-step objective evaluation produces it), so the next gradient costs
    only block ops — no operator matvec at all.
    """
    gR = scale_blocks(dfdsR, s_ex)
    s = s_ex[1:]
    gs = block_dots(dfdsR, R) + 4.0 * lam * (s * s - 1.0) * s
    return gR, gs


def ehess(qmul, R: jax.Array, s_ex: jax.Array, CsR: jax.Array,
          Ru: jax.Array, su: jax.Array, lam):
    """Euclidean Hessian-vector product (trustregion.h:197-255).

    ``CsR`` is the hoisted ``2 Q sR`` (n, 3, o) — recomputed once per outer
    iteration (trustregion.h:553), not per tCG step.

    ``W = Ru .* s_ex + R .* su_ex``; ``CW = 2 Q W``;
    ``hR = CsR .* su_ex + CW .* s_ex``;
    ``hs_i = <CW_i, R_i> + <CsR_i, Ru_i> + 4 lam (3 s_i^2 - 1) su_i``.
    """
    su_ex = jnp.concatenate([jnp.zeros((1,), dtype=su.dtype), su])
    W = scale_blocks(Ru, s_ex) + scale_blocks(R, su_ex)
    CW = unflatten(2.0 * qmul(flatten(W)))
    hR = scale_blocks(CsR, su_ex) + scale_blocks(CW, s_ex)
    s = s_ex[1:]
    hs = block_dots(CW, R) + block_dots(CsR, Ru) + 4.0 * lam * (3.0 * s * s - 1.0) * su
    return hR, hs


def rhess(qmul, R: jax.Array, s_ex: jax.Array, CsR: jax.Array,
          egR: jax.Array, egs: jax.Array, Ru: jax.Array, su: jax.Array, lam,
          Segr: jax.Array | None = None):
    """Full Riemannian Hessian-vector product: ehess followed by ehess2rhess."""
    hR, hs = ehess(qmul, R, s_ex, CsR, Ru, su, lam)
    return ehess2rhess(hR, hs, egR, egs, R, s_ex[1:], Ru, su, Segr=Segr)


def random_tangent(key, R: jax.Array, s: jax.Array):
    """A random tangent vector at (R, s) — for property tests."""
    kR, ks = jax.random.split(key)
    gR = jax.random.normal(kR, R.shape, dtype=R.dtype)
    gs = jax.random.normal(ks, s.shape, dtype=s.dtype)
    return project(R, s, gR, gs)
