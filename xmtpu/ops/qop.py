"""Abstract Q-matrix operator.

Every hot operation in the solver touches Q only through the product
``Q @ Y`` with a thin (3n, o) right-hand side (trustregion.h:187,237,553 —
cuBLAS GEMMs in the reference).  Abstracting that product behind a pytree
operator lets the dense (v0), sharded, and Pallas block-sparse (view-graph
structured) implementations swap without touching the solver.

Operators are registered pytrees so they can be passed straight through
``jax.jit`` boundaries; the *structure* (which implementation) is static,
the numeric payload is traced.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.tree_util import register_pytree_node_class


class QOperator:
    """Base class: a symmetric (3n, 3n) linear operator."""

    @property
    def dim(self) -> int:  # 3n
        raise NotImplementedError

    def apply(self, Y: jax.Array) -> jax.Array:
        raise NotImplementedError

    def diag_blocks(self):
        """(n, 3, 3) per-camera diagonal blocks ``C_ii``, or None when the
        operator cannot produce them cheaply (implicit factored forms).
        Used by the trust-region solver's block-Jacobi tCG preconditioner."""
        return None

    @property
    def psd_by_construction(self) -> bool:
        """True when the operator is structurally PSD — built as (a Schur
        complement of) a sum of squares, so ``lam_min(C) >= 0`` holds as an
        algebraic fact up to the operator's own construction rounding.  The
        implicit certificate then gets a rigorous O(n) acceptance shortcut:
        ``Z = C + Delta`` with block-diagonal ``Delta``, hence
        ``lam_min(Z) >= min_i lam_min(Delta_i)`` (certificate.certify)."""
        return False

    def __call__(self, Y: jax.Array) -> jax.Array:
        return self.apply(Y)


@register_pytree_node_class
@dataclass
class DenseQ(QOperator):
    """Dense Q — one MXU GEMM per apply.

    f64 by default for parity with the reference (``datatype = double``).

    ``psd_hint``: static flag a caller may set when the matrix is known PSD
    by construction (e.g. assembled in full f64 by ``create_matrix`` — the
    same Schur-complement-of-squares build as the reference's Q.bin).  Feeds
    the certificate's structural acceptance bound; leave False for matrices
    of unknown provenance or mixed-precision assemblies whose rounding
    (~1e-6 relative) exceeds the certificate's acceptance bound.
    """

    C: jax.Array
    psd_hint: bool = False

    @property
    def dim(self) -> int:
        return self.C.shape[0]

    @property
    def psd_by_construction(self) -> bool:
        return self.psd_hint

    def apply(self, Y: jax.Array) -> jax.Array:
        return jnp.dot(self.C, Y, precision=jax.lax.Precision.HIGHEST)

    def diag_blocks(self):
        n = self.dim // 3
        idx = jnp.arange(n)
        return self.C.reshape(n, 3, n, 3)[idx, :, idx, :]

    def tree_flatten(self):
        return (self.C,), (self.psd_hint,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def split_f32(x):
    """Two-float split: ``x ~= hi + lo`` with both parts f32.  The lo part
    carries the bits below f32's 24-bit mantissa so products against split
    coefficients recover ~f64 representation accuracy at f32 cost."""
    hi = x.astype(jnp.float32)
    return hi, (x - hi.astype(x.dtype)).astype(jnp.float32)


def tf_gemm(ah, al, y):
    """Two-float GEMM ``(ah + al) @ y`` to first order, combined in f64.

    ``ah``/``al`` are the stored f32 hi/lo split of an f64 matrix; ``y`` is
    split on the fly.  The hi @ [y_hi | y_lo] products run as ONE f32 MXU
    GEMM (column concat), the lo @ y_hi correction as a second — measured
    4.7 ms vs 24.3 ms for the emulated-f64 GEMM at (6143)^2 on the chip,
    relerr 1.5e-7 (benchmarks/exact_matvec_bench.py).  The dropped lo*lo
    term is ~1e-15 relative; the residual error is the MXU's f32
    accumulation noise."""
    yh = y.astype(jnp.float32)
    yl = (y - yh.astype(y.dtype)).astype(jnp.float32)
    a = jnp.dot(ah, jnp.concatenate([yh, yl], axis=1),
                precision=jax.lax.Precision.HIGHEST)
    b = jnp.dot(al, yh, precision=jax.lax.Precision.HIGHEST)
    o = y.shape[1]
    return (a[:, :o].astype(y.dtype) + a[:, o:].astype(y.dtype)
            + b.astype(y.dtype))


@register_pytree_node_class
@dataclass
class DenseQTF(QOperator):
    """Two-float dense operator: the f64 cost matrix stored as an f32 hi/lo
    pair, applied with :func:`tf_gemm`.

    The dense f64 matvec at the n=1934 testbed measured 21 ms against a
    4.4 ms padded-MXU roofline (21% — VERDICT r4 item 3); the two f32 GEMMs
    here have a ~0.9 ms roofline (f32 MXU + half the HBM bytes per pass) at
    a ~1.5e-7 relative noise floor.  Derive with :meth:`DenseQ.two_float`;
    soundness-critical consumers (the certificate) route it through
    ``certify(fast=...)``'s exact-anchored decisions.
    """

    Ch: jax.Array   # f32 hi
    Cl: jax.Array   # f32 lo
    # approximate diagonal blocks for preconditioning (f64, exact)
    Qdiag: jax.Array

    @property
    def dim(self) -> int:
        return self.Ch.shape[0]

    def apply(self, Y: jax.Array) -> jax.Array:
        return tf_gemm(self.Ch, self.Cl, Y)

    def diag_blocks(self):
        return self.Qdiag

    def tree_flatten(self):
        return (self.Ch, self.Cl, self.Qdiag), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def dense_two_float(C) -> DenseQTF:
    """Derive the two-float dense operator from an f64 matrix / DenseQ."""
    Q = as_qop(C)
    return DenseQTF(*_dense_tf_build(Q.C))


@jax.jit
def _dense_tf_build(C):
    # one fused program: EAGER DenseQ.diag_blocks' advanced-indexing gather
    # materialized a multi-GB transposed temp at 3n=5802 (HBM OOM, round 5);
    # the strided jnp.diagonal form under jit is a few strided reads
    ch, cl = split_f32(C)
    n = C.shape[0] // 3
    diag = jnp.moveaxis(
        jnp.diagonal(C.reshape(n, 3, n, 3), axis1=0, axis2=2), -1, 0)
    return ch, cl, diag


def q_apply(Q, Y: jax.Array) -> jax.Array:
    """Apply Q to Y.  Q may be a raw (3n, 3n) array or a QOperator."""
    if isinstance(Q, QOperator):
        return Q.apply(Y)
    return jnp.dot(Q, Y, precision=jax.lax.Precision.HIGHEST)


def as_qop(Q) -> QOperator:
    if isinstance(Q, QOperator):
        return Q
    return DenseQ(jnp.asarray(Q))


def cast_qop(Q, dtype):
    """Cast an operator's floating-point leaves (ids/index leaves untouched).

    Used by the mixed-precision ladder to derive the f32 operator from the
    f64 one.  Casting below f64 CLEARS any structural-PSD claim the source
    operator carried (``DenseQ.psd_hint`` / ``SchurQ.psd_ok``): the cast's
    ~1e-7 relative rounding exceeds the certificate's acceptance bound, so a
    low-precision operator must never feed the Delta-bound shortcut
    (ADVICE r3).
    """
    import dataclasses

    import jax

    Q = as_qop(Q)
    Qc = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        Q)
    if dtype != jnp.float64:
        if isinstance(Qc, DenseQ) and Qc.psd_hint:
            Qc = dataclasses.replace(Qc, psd_hint=False)
        elif getattr(Qc, "psd_ok", False):
            Qc = dataclasses.replace(Qc, psd_ok=False)
    return Qc
