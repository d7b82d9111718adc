"""Implicit Schur-complement Q operator: apply C without materializing it.

The reference assembles the dense 3N x 3N cost matrix
``C = Q1 - Vtp_bar Mbar^-1 Vtp_bar^T`` (translations/landmarks eliminated in
closed form) and feeds it to dense GEMMs — fine to N ~ 2000, fatal beyond
(O(N^2) memory; /root/reference/utils/creatematrix.py densifies at :175-177,
SURVEY.md section 5.7 calls this the scaling wall).

This operator keeps the *factored* form and applies it per matvec:

    C Y = Q1 Y - Vtp_bar ( Mbar^{-1} ( Vtp_bar^T Y ) )

where ``Mbar = [[diag(q2_bar), -V3_bar], [-V3_bar^T, diag(q3)]]`` is the
anchored translation/landmark block and the inner solve is the *exact* block
elimination through the Cholesky factor of the camera-camera Schur complement
``VT = diag(q2_bar) - V3F V3F^T`` (the same VT the reference factors,
creatematrix.py:156-170):

    x_A = VT^-1 (b_A + V3F (q3^-1/2 o b_B))
    x_B = q3^-1 o b_B + q3^-1/2 o (V3F^T x_A)

Cost per matvec: O(E o) edge gathers / segment sums + O(N^2 o) for the VT
solve — linear in observations for the landmark part and independent of M
for memory: O(E + N^2) instead of O(9 N^2) + O(N M).

Edge reductions are kept in **two sorted orderings** (by landmark and by
frame) so every ``segment_sum`` runs with ``indices_are_sorted=True`` —
sorted scatter-adds lower to efficient TPU code, unsorted ones do not.

The same factorization recovers translations/landmarks
(``recover_y(sR) = -Mbar^{-1} Vtp_bar^T sR``), replacing the dense
(N+M-1) x 3N ``Abar`` operator (recoversolution.py:75-85 equivalent).

Setup forms VT's Gram on the MXU.  Below ``_SLAB_BUDGET_BYTES`` it
materializes one (N, M) ``V3F`` slab; beyond that (Rome-scale: N ~ 10^4
cameras, M ~ 10^6 landmarks would need an 80+ GB transient) the build
accumulates the Gram over landmark chunks — K reuses of ONE compiled
(N, chunk) scatter+GEMM program with edges padded to the largest chunk, so
memory is O(N * chunk) and the remote compiler sees a single HLO.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import register_pytree_node_class

from xmtpu.ops.qop import QOperator


def _seg_sum(vals, ids, num, sorted_ids=True):
    return jax.ops.segment_sum(vals, ids, num, indices_are_sorted=sorted_ids)


def _seg_sum_bounds(vals, ids, bounds, num):
    """Sorted segment sum (``indices_are_sorted=True`` — unsorted scatter
    HLO can hang the remote compile and lowers poorly on TPU).

    A cumsum-boundary-difference variant was tried here and measured
    *against sorted scatter* it loses badly: f64 cumsum over (120k, 3) is
    ~113 ms on this chip (sequential scan under f64 emulation) vs ~9 ms for
    the sorted scatter-add.  ``bounds`` is kept in the pytree for the
    certificate's boundary logic but unused on this path."""
    return jax.ops.segment_sum(vals, ids, num, indices_are_sorted=True)


@register_pytree_node_class
@dataclass
class SchurQ(QOperator):
    """Factored SBA cost operator.

    Edge arrays exist in two orderings: ``*_l`` sorted by landmark id (for
    landmark-segment reductions), ``*_f`` sorted by frame id (for
    frame-segment reductions).

    Fields (n cameras, m landmarks, e observations; ids 0-based):
      Q1: (n, 3, 3) per-camera weighted landmark Grams
      V1: (n, 3) per-camera weighted landmark sums
      f_l, l_l, wx_l, cf_l: (e,), (e,), (e, 3), (e,)  — landmark-sorted
      f_f, l_f, wx_f, cf_f: frame-sorted copies
      (cf_* are the V3F coefficients ``w_e / sqrt(q3_l)`` with frame-0 rows
      zeroed)
      bounds_l: (m+1,) landmark segment boundaries in the l-sorted order
      bounds_f: (n+1,) frame segment boundaries in the f-sorted order
      inv_q3, inv_sqrt_q3: (m,) inverse (sqrt) landmark weight sums
      VT_inv: (>= n-1, n-1) explicit inverse of the camera Schur complement
        (applied as a GEMM: on TPU, emulated-f64 triangular solves cost ~20x
        an equivalent GEMM).  Rows may be zero-padded past n-1 so the O(N^2)
        object row-shards over a device mesh whose size does not divide n-1
        (``parallel.mesh.shard_schurq``); ``solve_M`` slices the GEMM output
        back to n-1 rows.  Built either through an emulated-f64 Cholesky
        ("chol") or the hardware-f32 Cholesky + f64 Newton-Schulz ladder
        ("ns", the TPU default — see :func:`_vt_inv_mixed`).
    """

    Q1: jax.Array
    V1: jax.Array
    f_l: jax.Array
    l_l: jax.Array
    wx_l: jax.Array
    cf_l: jax.Array
    f_f: jax.Array
    l_f: jax.Array
    wx_f: jax.Array
    cf_f: jax.Array
    bounds_l: jax.Array
    bounds_f: jax.Array
    inv_q3: jax.Array
    inv_sqrt_q3: jax.Array
    VT_inv: jax.Array
    # static (pytree aux): structural-PSD claim.  True for exact-f64 builds
    # (chol, or ns within the verified residual floor); cleared when the
    # VT_inv build residual would invalidate the certificate's Delta-bound
    # acceptance (ADVICE r3) and by sub-f64 casts (qop.cast_qop).
    psd_ok: bool = True
    # static (pytree aux): Pallas sorted-segment-sum bands per ordering for
    # F32 applies (0 = XLA segment_sum; see with_pallas()).  f64 applies
    # always stay on the XLA path — this platform rejects f64 Pallas — so
    # an f64 operator with bands set is harmless and its f32 cast
    # (cast_qop preserves static aux) picks the kernel up automatically.
    band_l: int = 0
    band_f: int = 0
    seg_interpret: bool = False

    def tree_flatten(self):
        return ((self.Q1, self.V1, self.f_l, self.l_l, self.wx_l, self.cf_l,
                 self.f_f, self.l_f, self.wx_f, self.cf_f, self.bounds_l,
                 self.bounds_f, self.inv_q3, self.inv_sqrt_q3, self.VT_inv),
                (self.psd_ok, self.band_l, self.band_f, self.seg_interpret))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *(aux or (True, 0, 0, False)))

    def with_pallas(self, interpret: "bool | None" = None) -> "SchurQ":
        """Route F32 applies' segment reductions through the Pallas sorted-
        segment-sum kernel (measured 1.7x over XLA scatter on the f32 edge
        path at n=1934).  The exact f64 applies are untouched; the intended
        use is ``Q = SchurQ.build(...).with_pallas()`` so every f32 cast
        derived from ``Q`` (the ladder's f32 phase, ``inner_f32`` tCG
        applies) inherits the kernel.  Not for mesh-sharded operators (the
        kernel does not auto-partition; ``shard_schurq`` clears bands)."""
        import dataclasses

        from xmtpu.ops.pallas_segsum import max_band

        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        return dataclasses.replace(
            self, band_l=int(max_band(np.asarray(self.l_l))),
            band_f=int(max_band(np.asarray(self.f_f))),
            seg_interpret=bool(interpret))

    def _seg(self, vals, ids, bounds, num, band):
        """Sorted segment sum: Pallas kernel for f32 when a band is set,
        XLA ``segment_sum`` otherwise (f64 always; sharded always)."""
        if band and vals.dtype == jnp.float32:
            from xmtpu.ops.pallas_segsum import sorted_segment_sum

            shape = vals.shape
            d = 1
            for s in shape[1:]:
                d *= s
            out = sorted_segment_sum(vals.reshape(shape[0], d), ids, num,
                                     band, interpret=self.seg_interpret)
            return out.reshape((num,) + shape[1:])
        return _seg_sum_bounds(vals, ids, bounds, num)

    @staticmethod
    def build(weights, edges, landmarks,
              landmark_chunk: "int | None" = None,
              vt_build: str = "auto") -> "SchurQ":
        """From the same inputs as ``create_matrix`` (1-based edges).

        ``landmark_chunk``: accumulate VT's Gram over landmark chunks of this
        width instead of one (N, M) slab.  Default ``None`` picks
        automatically: the slab while it fits ``_SLAB_BUDGET_BYTES``, chunked
        beyond (the beyond-memory build path).  Pass ``0`` to force the slab.

        ``vt_build``: how the (n-1)^2 ``VT_inv`` is computed —
          * ``"chol"``: f64 Cholesky + cho_solve (exact; emulated f64 on TPU
            turns this into the build wall at large N);
          * ``"ns"``: hardware-f32 Cholesky seed + f64 Newton-Schulz GEMM
            refinement (:func:`_vt_inv_mixed`) — same f64-floor accuracy,
            GEMM-shaped work only;
          * ``"auto"``: "ns" on a TPU default backend, "chol" elsewhere.
        The "ns" path verifies its inverse residual on the host and falls
        back to "chol" if Newton-Schulz stalled (pathological conditioning).
        """
        edges = np.asarray(edges)
        w = np.asarray(weights, np.float64).ravel()
        x = np.asarray(landmarks, np.float64)
        f = edges[:, 0].astype(np.int64) - 1
        l = edges[:, 1].astype(np.int64) - 1
        N = int(f.max()) + 1
        M = int(l.max()) + 1
        # host-side orderings + segment boundaries (static data)
        ord_l = np.lexsort((f, l))
        ord_f = np.lexsort((l, f))
        bounds_l = np.searchsorted(l[ord_l], np.arange(M + 1)).astype(np.int32)
        bounds_f = np.searchsorted(f[ord_f], np.arange(N + 1)).astype(np.int32)

        if landmark_chunk is None and N * M * 8 > _SLAB_BUDGET_BYTES:
            landmark_chunk = max(1024, _SLAB_BUDGET_BYTES // (8 * N))
        vt_gram = None
        if landmark_chunk and landmark_chunk < M:
            # beyond the slab budget, the Gram must be accumulated.  V3F is
            # E-sparse: when the observation graph is sparse enough, per-
            # landmark PAIR expansion computes exactly sum_l cf cf^T in
            # O(sum_l c_l^2) host work — for Rome-class scenes (c_l ~ 2-20)
            # that is ~1e6 pairs vs ~1e13 dense-slab GEMM flops.  Dense
            # landmarks (hub landmarks seen by thousands of cameras) blow
            # the pair count up, so fall back to the chunked MXU Gram there.
            counts = np.diff(bounds_l).astype(np.int64)
            n_pairs = int(np.sum(counts * counts))
            if n_pairs <= _PAIR_BUDGET:
                vt_gram = _vt_gram_pairs(w, f, l, ord_l, bounds_l, N, M)
            else:
                vt_gram = _vt_gram_chunked(w, f, l, ord_l, bounds_l, N, M,
                                           int(landmark_chunk))
        if vt_build == "auto":
            vt_build = "ns" if jax.default_backend() == "tpu" else "chol"
        args = (jnp.asarray(w), jnp.asarray(x),
                jnp.asarray(f[ord_l], jnp.int32),
                jnp.asarray(l[ord_l], jnp.int32),
                jnp.asarray(ord_l, jnp.int32),
                jnp.asarray(f[ord_f], jnp.int32),
                jnp.asarray(l[ord_f], jnp.int32),
                jnp.asarray(ord_f, jnp.int32),
                jnp.asarray(bounds_l), jnp.asarray(bounds_f))
        q, vt_resid = _build_schurq(*args, N, M, vt_gram=vt_gram,
                                    use_gram=vt_gram is not None,
                                    vt_build=vt_build)
        # vt_resid is in multiples of the f64 floor (see _vt_inv_mixed);
        # measured stall ratios: ~4 at cond 1e3, ~2e3 at cond 1e6 —
        # fall back to the exact factorization beyond cond ~1e6, where the
        # Newton-Schulz inverse's worst-direction apply error passes 1e-6
        resid_ratio = 0.0
        if vt_build == "ns":
            # record the Newton-Schulz inverse residual (floor-multiples;
            # ADVICE r3: the Delta-bound acceptance leans on this staying
            # orders below the 1e-4..1e-3 certificate bound)
            resid_ratio = float(jax.device_get(vt_resid))
            if resid_ratio > 2e3:
                # NS stalled (cond(VT) beyond the f32 seed's reach; worst-
                # direction apply error would pass ~1e-6): rebuild through
                # the exact f64 factorization
                q, _ = _build_schurq(*args, N, M, vt_gram=vt_gram,
                                     use_gram=vt_gram is not None,
                                     vt_build="chol")
                resid_ratio = 0.0
        # build-time observability (host attribute, not part of the pytree)
        q.vt_resid_ratio = resid_ratio
        return q

    @property
    def n_cameras(self) -> int:
        return self.Q1.shape[0]

    @property
    def n_landmarks(self) -> int:
        return self.inv_q3.shape[0]

    @property
    def dim(self) -> int:
        return 3 * self.n_cameras

    # ---- structured pieces ----

    def _vtpT(self, Yb):
        """``Vtp_bar^T Y``: (n,3,o) -> (b_A (n-1,o), b_B (m,o)).

        Per-edge contractions in slice-multiply form — the einsum
        ('ea,eao->eo') lowering transposes (E,3,o) through lanes and
        measured ~7.5 ms at E=245k on the chip (round 5)."""
        n, _, o = Yb.shape
        b_A = jnp.einsum("na,nao->no", self.V1, Yb)[1:]
        g = Yb.reshape(n, 3 * o)[self.f_l]
        t = None
        for a in range(3):
            ta = self.wx_l[:, a:a + 1] * g[:, a * o:(a + 1) * o]
            t = ta if t is None else t + ta
        b_B = -self._seg(t, self.l_l, self.bounds_l,
                         self.n_landmarks, self.band_l)
        return b_A, b_B

    def _vtp(self, z_A, z_B):
        """``Vtp_bar [z_A; z_B]`` -> (n, 3, o)."""
        n = self.n_cameras
        o = z_B.shape[-1]
        z_t = jnp.concatenate([jnp.zeros_like(z_A[:1]), z_A], axis=0)
        out = jnp.einsum("na,no->nao", self.V1, z_t)
        zg = z_B[self.l_f]
        contrib = jnp.concatenate(
            [self.wx_f[:, a:a + 1] * zg for a in range(3)], axis=1)
        red = self._seg(contrib, self.f_f, self.bounds_f,
                        self.n_cameras, self.band_f)
        return out - red.reshape(n, 3, o)

    def _v3f(self, z_B):
        """``V3F z_B``: (m, o) -> (n-1, o)."""
        out = self._seg(self.cf_f[:, None] * z_B[self.l_f], self.f_f,
                        self.bounds_f, self.n_cameras, self.band_f)
        return out[1:]

    def _v3fT(self, x_A):
        """``V3F^T x_A``: (n-1, o) -> (m, o)."""
        x_pad = jnp.concatenate([jnp.zeros_like(x_A[:1]), x_A], axis=0)
        return self._seg(self.cf_l[:, None] * x_pad[self.f_l],
                         self.l_l, self.bounds_l, self.n_landmarks,
                         self.band_l)

    def solve_M(self, b_A, b_B):
        """Exact solve of ``Mbar [x_A; x_B] = [b_A; b_B]``.

        ``VT_inv`` may carry zero-padded rows past n-1 (mesh-divisible row
        sharding); the slice restores the true shape — padded rows are exact
        zeros so no information is lost."""
        t = self.inv_sqrt_q3[:, None] * b_B
        rhs = b_A + self._v3f(t)
        x_A = jnp.dot(self.VT_inv, rhs,
                      precision=jax.lax.Precision.HIGHEST)[: b_A.shape[0]]
        x_B = (self.inv_q3[:, None] * b_B
               + self.inv_sqrt_q3[:, None] * self._v3fT(x_A))
        return x_A, x_B

    # ---- operator interface ----

    def apply(self, Y: jax.Array) -> jax.Array:
        n = self.n_cameras
        Yb = Y.reshape(n, 3, Y.shape[-1])
        out = jnp.einsum("nab,nbo->nao", self.Q1, Yb)
        b_A, b_B = self._vtpT(Yb)
        z_A, z_B = self.solve_M(b_A, b_B)
        out = out - self._vtp(z_A, z_B)
        return out.reshape(3 * n, Y.shape[-1])

    def diag_blocks(self):
        """Approximate diagonal blocks for the tCG preconditioner: ``Q1``
        upper-bounds ``C_ii = Q1_i - (Vtp Mbar^-1 Vtp^T)_ii`` (the correction
        is PSD), so the block-Jacobi preconditioner built from it is
        conservative; the exact blocks would need n factored applies."""
        return self.Q1

    @property
    def psd_by_construction(self) -> bool:
        """The XM cost is a sum of squared edge residuals partially minimized
        (Schur-complemented) over landmark depths and translations
        (creatematrix.py:118-177 equivalent); partial minimization of a PSD
        quadratic form is PSD, so ``lam_min >= 0`` holds algebraically — up
        to this build's own rounding (f64 assembly + the ``VT_inv``
        Newton-Schulz/Cholesky residual, ~1e-10 relative; orders below the
        certificate's 1e-4..1e-3 acceptance bound).  ``psd_ok`` (static aux)
        gates the claim: build() clears it if the verified NS residual ever
        exceeded the floor guard, and ``cast_qop`` clears it on sub-f64
        casts (ADVICE r3)."""
        return self.psd_ok

    def recover_y(self, sR: jax.Array) -> jax.Array:
        """Optimal translations/landmarks for a solved factor: the (N+M-1, o)
        stack ``[t_1..t_{N-1}; p_0..p_{M-1}]`` = ``Abar @ sR``."""
        n = self.n_cameras
        Yb = sR.reshape(n, 3, sR.shape[-1])
        b_A, b_B = self._vtpT(Yb)
        z_A, z_B = self.solve_M(b_A, b_B)
        return jnp.concatenate([-z_A, -z_B], axis=0)


    def two_float(self, pallas: "bool | None" = None) -> "SchurQTF":
        """Derive the fully two-float fast-exact operator (f32-pair edge
        reductions AND f32-pair ``VT_inv`` GEMM — zero emulated-f64 work per
        apply).  See :class:`SchurQTF`; same ``pallas`` policy as
        :meth:`edge_f32`."""
        e = self.edge_f32(pallas=pallas)
        vth, vtl = _split_f32(self.VT_inv)
        q1h, q1l = _split_f32(self.Q1)
        v1h, v1l = _split_f32(self.V1)
        return SchurQTF(e.Q1, e.V1, e.f_l, e.l_l, e.f_f, e.l_f,
                        e.wxh_l, e.wxl_l, e.cfh_l, e.cfl_l,
                        e.wxh_f, e.wxl_f, e.cfh_f, e.cfl_f,
                        e.inv_q3, e.inv_sqrt_q3, vth, vtl,
                        q1h, q1l, v1h, v1l,
                        band_l=e.band_l, band_f=e.band_f,
                        interpret=e.interpret)

    def edge_f32(self, pallas: "bool | None" = None) -> "SchurQEdgeF32":
        """Derive the mixed-precision operator (f32 edge reductions inside an
        f64 apply).  See :class:`SchurQEdgeF32`.

        ``pallas``: run the f32 segment reductions through the Pallas
        sorted-segment-sum kernel (band bounds computed here from the sorted
        edge ids).  Default ``None`` enables it on a TPU backend when the
        edge arrays live on a single device (the kernel does not
        auto-partition under GSPMD — sharded operators keep XLA scatter).
        On non-TPU backends ``pallas=True`` runs the kernel in interpreter
        mode (tests)."""
        import dataclasses

        q = _make_edge_f32(self)
        if pallas is None:
            try:
                single = len(self.f_l.sharding.device_set) == 1
            except AttributeError:
                single = True
            pallas = jax.default_backend() == "tpu" and single
        if pallas:
            from xmtpu.ops.pallas_segsum import max_band

            l_ids, f_ids = jax.device_get((self.l_l, self.f_f))
            q = dataclasses.replace(
                q, band_l=max_band(np.asarray(l_ids)),
                band_f=max_band(np.asarray(f_ids)),
                interpret=jax.default_backend() != "tpu")
        return q


def pad_cameras(Q, n_pad: int):
    """Zero-extend the camera axis of a :class:`SchurQ` (or
    :class:`SchurQEdgeF32`) with ``n_pad - n`` phantom cameras.

    Phantom cameras carry zero ``Q1``/``V1`` blocks and no observations:
    they contribute exactly nothing to the quadratic form (apply() returns
    zero rows for them), the trust-region solver leaves their frames at the
    initial iterate (zero gradient), and the certificate sees zero dual
    blocks (the per-camera Gram is floored — ``_solve_spd_small`` ridge — so
    the phantom least-squares blocks solve to y = 0 and ``Z`` gains exact
    zero eigenvalues, which never flip a ``lam_min > -bound`` decision).

    Purpose: arbitrary ``n`` row-shards over a device mesh — the real-data
    analog of ``VT_inv``'s zero-row padding (VERDICT r2 item 6; real view
    graphs do not come mesh-divisible).  ``parallel.mesh.shard_schurq``
    calls this automatically.
    """
    import dataclasses

    n = Q.n_cameras
    if n_pad == n:
        return Q
    assert n_pad > n
    pad = n_pad - n
    upd = {
        "Q1": jnp.pad(Q.Q1, ((0, pad), (0, 0), (0, 0))),
        "V1": jnp.pad(Q.V1, ((0, pad), (0, 0))),
    }
    # VT_inv becomes (>= n_pad-1, n_pad-1): zero COLUMNS for the phantom
    # translation coordinates (their rhs entries are exact zeros anyway) and
    # zero ROWS so phantom solves return 0 (solve_M slices rows back)
    vt = Q.VT_inv
    rows = max(vt.shape[0], n_pad - 1)
    vt_new = jnp.zeros((rows, n_pad - 1), vt.dtype)
    upd["VT_inv"] = vt_new.at[: vt.shape[0], : vt.shape[1]].set(vt)
    if hasattr(Q, "bounds_f"):
        # phantom frame segments are empty: repeat the last boundary
        last = Q.bounds_f[-1]
        upd["bounds_f"] = jnp.concatenate(
            [Q.bounds_f, jnp.broadcast_to(last, (pad,))])
    return dataclasses.replace(Q, **upd)


def _split_f32(x):
    """Two-float split: ``x ~= hi + lo`` with both parts f32.  The lo part
    carries the bits below f32's 24-bit mantissa so products against split
    coefficients recover ~f64 representation accuracy at f32 cost."""
    hi = x.astype(jnp.float32)
    return hi, (x - hi.astype(x.dtype)).astype(jnp.float32)


def _wx_dot3(wh, wl, gh, gl, o):
    """Two-float ``sum_a w[:, a] * g[:, a*o:(a+1)*o]`` in slice-multiply
    form.  The einsum('ea,eao->eo') formulation of this contraction lowered
    to a transpose-heavy ~7.5 ms at E=245k on the chip (round-5 edge
    breakdown); three fused column-block multiply-adds are pure VPU
    elementwise.  Returns ``(th, tl)`` f32 with ``th + tl ~= sum``."""
    th = tl = None
    for a in range(3):
        wah, wal = wh[:, a:a + 1], wl[:, a:a + 1]
        gah, gal = gh[:, a * o:(a + 1) * o], gl[:, a * o:(a + 1) * o]
        t = wah * gah
        c = wah * gal + wal * gah
        th = t if th is None else th + t
        tl = c if tl is None else tl + c
    return th, tl


def _wx_outer3(wh, wl, zh, zl):
    """Two-float outer products ``w[:, a] * z`` laid out as column blocks
    ``(E, 3o)`` (a-major, matching the (e, 3, o) row-major flattening)."""
    th = jnp.concatenate([wh[:, a:a + 1] * zh for a in range(3)], axis=1)
    tl = jnp.concatenate([wh[:, a:a + 1] * zl + wl[:, a:a + 1] * zh
                          for a in range(3)], axis=1)
    return th, tl


@register_pytree_node_class
@dataclass
class SchurQEdgeF32(QOperator):
    """SchurQ with the edge reductions in hardware f32.

    TPU f64 is software-emulated; at the n=1934 testbed the implicit matvec
    spends ~100 of its ~130 ms in f64 edge gathers / per-edge einsums /
    segment sums (docs/PERFORMANCE.md "operator decision") while the actual
    f64-critical piece — the (n-1)^2 ``VT^-1`` GEMM resolving the Schur
    cancellation — costs 3.8 ms.  This operator keeps the *structure* of
    :class:`SchurQ.apply` but runs every O(E) term through two-float (hi/lo)
    f32 arithmetic:

    * edge coefficients (``wx``, ``cf``) are pre-split into f32 hi/lo pairs;
    * the thin per-call operands (``Y`` blocks, ``z_B``) are split on the fly
      (elementwise f64 ops over small arrays — cheap, only matmul emulation
      is ~40x);
    * each reduction computes ``sum(hi*hi)`` and the first-order correction
      ``sum(hi*lo + lo*hi)`` as two f32 segment sums, combined in f64.

    When ``band_l``/``band_f`` are set (static aux; see
    :meth:`SchurQ.edge_f32`), both f32 segment sums of a reduction run as ONE
    Pallas sorted-segment-sum kernel (`xmtpu.ops.pallas_segsum`) — the sorted
    edge order makes each fixed chunk touch a contiguous band of segments, so
    the scatter-add becomes a sequential-grid one-hot matmul on the MXU
    instead of XLA scatter HLO.  Bands of 0 keep the XLA ``segment_sum``
    path (required when the edge arrays are sharded over a mesh: the kernel
    does not auto-partition).

    Residual error is the f32 *accumulation* noise of the hi-product sums,
    ~sqrt(k_seg) * eps_f32 relative to the absolute-sum scale (measured
    ~1e-7..1e-6 relative on the operator output) — far below the pipeline's
    loose operating tolerances (tol 1e-1..1e-3).  The certificate and the
    recovery path always use the exact f64 :class:`SchurQ`
    (``staircase.solve_arrays(edge_f32=True)`` wires this split).
    """

    Q1: jax.Array
    V1: jax.Array
    f_l: jax.Array
    l_l: jax.Array
    f_f: jax.Array
    l_f: jax.Array
    wxh_l: jax.Array
    wxl_l: jax.Array
    cfh_l: jax.Array
    cfl_l: jax.Array
    wxh_f: jax.Array
    wxl_f: jax.Array
    cfh_f: jax.Array
    cfl_f: jax.Array
    inv_q3: jax.Array
    inv_sqrt_q3: jax.Array
    VT_inv: jax.Array
    # static (pytree aux): Pallas segment-sum bands per sorted ordering;
    # 0 = XLA segment_sum.  interpret runs the kernel in interpreter mode
    # (CPU tests).
    band_l: int = 0
    band_f: int = 0
    interpret: bool = False

    def tree_flatten(self):
        return ((self.Q1, self.V1, self.f_l, self.l_l, self.f_f, self.l_f,
                 self.wxh_l, self.wxl_l, self.cfh_l, self.cfl_l,
                 self.wxh_f, self.wxl_f, self.cfh_f, self.cfl_f,
                 self.inv_q3, self.inv_sqrt_q3, self.VT_inv),
                (self.band_l, self.band_f, self.interpret))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def n_cameras(self) -> int:
        return self.Q1.shape[0]

    @property
    def n_landmarks(self) -> int:
        return self.inv_q3.shape[0]

    @property
    def dim(self) -> int:
        return 3 * self.n_cameras

    def diag_blocks(self):
        return self.Q1

    # ---- f32 edge reductions with hi/lo compensation ----

    def _seg2(self, hi, lo, ids, num, band=0):
        """Two f32 segment sums combined in f64.

        ``band > 0``: one Pallas sorted-segment-sum call over the hi/lo pair
        (columns concatenated so the kernel's one-hot matmul reduces both at
        once)."""
        dt = self.Q1.dtype
        if band:
            from xmtpu.ops.pallas_segsum import sorted_segment_sum

            shape = hi.shape
            d = 1
            for s in shape[1:]:
                d *= s
            both = jnp.concatenate(
                [hi.reshape(shape[0], d), lo.reshape(shape[0], d)], axis=1)
            s2 = sorted_segment_sum(both, ids, num, band,
                                    interpret=self.interpret)
            out = s2[:, :d].astype(dt) + s2[:, d:].astype(dt)
            return out.reshape((num,) + shape[1:])
        sh = _seg_sum(hi, ids, num)
        sl = _seg_sum(lo, ids, num)
        return sh.astype(dt) + sl.astype(dt)

    def _vtpT(self, Yb):
        n, _, o = Yb.shape
        b_A = jnp.einsum("na,nao->no", self.V1, Yb)[1:]
        Yh, Yl = _split_f32(Yb.reshape(n, 3 * o))
        gh, gl = Yh[self.f_l], Yl[self.f_l]
        th, tl = _wx_dot3(self.wxh_l, self.wxl_l, gh, gl, o)
        b_B = -self._seg2(th, tl, self.l_l, self.n_landmarks, self.band_l)
        return b_A, b_B

    def _vtp(self, z_A, z_B):
        n = self.n_cameras
        o = z_B.shape[-1]
        z_t = jnp.concatenate([jnp.zeros_like(z_A[:1]), z_A], axis=0)
        out = jnp.einsum("na,no->nao", self.V1, z_t)
        zh, zl = _split_f32(z_B)
        gh, gl = zh[self.l_f], zl[self.l_f]
        th, tl = _wx_outer3(self.wxh_f, self.wxl_f, gh, gl)
        red = self._seg2(th, tl, self.f_f, self.n_cameras, self.band_f)
        return out - red.reshape(n, 3, o)

    def _v3f(self, z_B):
        zh, zl = _split_f32(z_B)
        gh, gl = zh[self.l_f], zl[self.l_f]
        th = self.cfh_f[:, None] * gh
        tl = self.cfh_f[:, None] * gl + self.cfl_f[:, None] * gh
        return self._seg2(th, tl, self.f_f, self.n_cameras, self.band_f)[1:]

    def _v3fT(self, x_A):
        x_pad = jnp.concatenate([jnp.zeros_like(x_A[:1]), x_A], axis=0)
        xh, xl = _split_f32(x_pad)
        gh, gl = xh[self.f_l], xl[self.f_l]
        th = self.cfh_l[:, None] * gh
        tl = self.cfh_l[:, None] * gl + self.cfl_l[:, None] * gh
        return self._seg2(th, tl, self.l_l, self.n_landmarks, self.band_l)

    solve_M = SchurQ.solve_M
    apply = SchurQ.apply
    recover_y = SchurQ.recover_y


def _tf_gemm(vh, vl, y):
    """Two-float GEMM ``(vh + vl) @ y`` to first order, combined in f64.

    ``vh``/``vl`` are the stored f32 hi/lo split of an f64 matrix; ``y`` is
    split on the fly.  The hi @ [y_hi | y_lo] products run as ONE f32 MXU
    GEMM (column concat), the lo @ y_hi correction as a second — measured
    4.7 ms vs 24.3 ms for the emulated-f64 GEMM at (6143)^2, relerr 1.5e-7
    (benchmarks/exact_matvec_bench.py).  The dropped lo*lo term is ~1e-15
    relative; the residual error is the MXU's f32 accumulation noise."""
    yh = y.astype(jnp.float32)
    yl = (y - yh.astype(y.dtype)).astype(jnp.float32)
    a = jnp.dot(vh, jnp.concatenate([yh, yl], axis=1),
                precision=jax.lax.Precision.HIGHEST)
    b = jnp.dot(vl, yh, precision=jax.lax.Precision.HIGHEST)
    o = y.shape[1]
    return (a[:, :o].astype(y.dtype) + a[:, o:].astype(y.dtype)
            + b.astype(y.dtype))


@register_pytree_node_class
@dataclass
class SchurQTF(QOperator):
    """Fully two-float fast-exact operator: :class:`SchurQEdgeF32` edge
    reductions PLUS the two-float ``VT_inv`` GEMM (:func:`_tf_gemm`) — no
    emulated-f64 work anywhere in the apply.

    This is the round-5 answer to the exact matvec's 0.6%-of-roofline gap
    (VERDICT r4 item 1): at n=6144 the f64 apply measured 177 ms (edge ops
    ~150 ms + 24 ms f64 GEMM); the two-float edge path with the Pallas
    segment-sum kernel is ~18 ms and this GEMM ~5 ms.  Apply error vs the
    exact f64 operator: ~1e-8 relative from the edge path (measured) plus
    ~1.5e-7 from the GEMM's f32 accumulation — callers that make
    SOUNDNESS-critical decisions (the certificate) must account for it via
    :func:`operator_error_estimate` (the certificate subtracts the estimate
    from its probe shift; ``solver.certificate.certify(fast=...)``).

    Derive with :meth:`SchurQ.two_float`.  Reference hot op this replaces:
    trustregion.h:187,237,553 (C*sR GEMMs through the factored form).
    """

    Q1: jax.Array
    V1: jax.Array
    f_l: jax.Array
    l_l: jax.Array
    f_f: jax.Array
    l_f: jax.Array
    wxh_l: jax.Array
    wxl_l: jax.Array
    cfh_l: jax.Array
    cfl_l: jax.Array
    wxh_f: jax.Array
    wxl_f: jax.Array
    cfh_f: jax.Array
    cfl_f: jax.Array
    inv_q3: jax.Array
    inv_sqrt_q3: jax.Array
    vth: jax.Array        # f32 hi part of VT_inv
    vtl: jax.Array        # f32 lo part of VT_inv
    q1h: jax.Array        # f32 hi/lo pair of the per-camera Grams
    q1l: jax.Array
    v1h: jax.Array        # f32 hi/lo pair of the weighted landmark sums
    v1l: jax.Array
    band_l: int = 0
    band_f: int = 0
    interpret: bool = False

    def tree_flatten(self):
        return ((self.Q1, self.V1, self.f_l, self.l_l, self.f_f, self.l_f,
                 self.wxh_l, self.wxl_l, self.cfh_l, self.cfl_l,
                 self.wxh_f, self.wxl_f, self.cfh_f, self.cfl_f,
                 self.inv_q3, self.inv_sqrt_q3, self.vth, self.vtl,
                 self.q1h, self.q1l, self.v1h, self.v1l),
                (self.band_l, self.band_f, self.interpret))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    n_cameras = SchurQEdgeF32.n_cameras
    n_landmarks = SchurQEdgeF32.n_landmarks
    dim = SchurQEdgeF32.dim

    def diag_blocks(self):
        return self.Q1

    _seg2 = SchurQEdgeF32._seg2
    _v3f = SchurQEdgeF32._v3f
    _v3fT = SchurQEdgeF32._v3fT

    def _vtpT(self, Yb):
        # standalone (recover_y); apply() inlines this with a shared split
        n, _, o = Yb.shape
        Yh, Yl = _split_f32(Yb.reshape(n, 3 * o))
        dt = self.inv_q3.dtype
        bh, bl = _wx_dot3(self.v1h, self.v1l, Yh, Yl, o)
        b_A = (bh.astype(dt) + bl.astype(dt))[1:]
        gh, gl = Yh[self.f_l], Yl[self.f_l]
        th, tl = _wx_dot3(self.wxh_l, self.wxl_l, gh, gl, o)
        b_B = -self._seg2(th, tl, self.l_l, self.n_landmarks, self.band_l)
        return b_A, b_B

    def _vtp(self, z_A, z_B):
        n = self.n_cameras
        o = z_B.shape[-1]
        dt = self.inv_q3.dtype
        z_t = jnp.concatenate([jnp.zeros_like(z_A[:1]), z_A], axis=0)
        zth, ztl = _split_f32(z_t)
        oh, ol = _wx_outer3(self.v1h, self.v1l, zth, ztl)      # (n, 3o)
        out = oh.astype(dt) + ol.astype(dt)
        zh, zl = _split_f32(z_B)
        gh, gl = zh[self.l_f], zl[self.l_f]
        th, tl = _wx_outer3(self.wxh_f, self.wxl_f, gh, gl)
        red = self._seg2(th, tl, self.f_f, self.n_cameras, self.band_f)
        return (out - red.reshape(n, 3 * o)).reshape(n, 3, o)

    def solve_M(self, b_A, b_B):
        t = self.inv_sqrt_q3[:, None] * b_B
        rhs = b_A + self._v3f(t)
        x_A = _tf_gemm(self.vth, self.vtl, rhs)[: b_A.shape[0]]
        x_B = (self.inv_q3[:, None] * b_B
               + self.inv_sqrt_q3[:, None] * self._v3fT(x_A))
        return x_A, x_B

    def apply(self, Y: jax.Array) -> jax.Array:
        n = self.n_cameras
        o = Y.shape[-1]
        dt = Y.dtype
        Yh, Yl = _split_f32(Y.reshape(n, 3 * o))   # ONE split feeds all
        # Q1 block product, two-float slice form: row a of each 3x3 block
        # is a 3-term dot against the flattened Y block
        outs_h, outs_l = [], []
        for a in range(3):
            th, tl = _wx_dot3(self.q1h[:, a, :], self.q1l[:, a, :],
                              Yh, Yl, o)
            outs_h.append(th)
            outs_l.append(tl)
        out = (jnp.stack(outs_h, 1).astype(dt)
               + jnp.stack(outs_l, 1).astype(dt))           # (n, 3, o)
        bh, bl = _wx_dot3(self.v1h, self.v1l, Yh, Yl, o)
        b_A = (bh.astype(dt) + bl.astype(dt))[1:]
        gh, gl = Yh[self.f_l], Yl[self.f_l]
        th, tl = _wx_dot3(self.wxh_l, self.wxl_l, gh, gl, o)
        b_B = -self._seg2(th, tl, self.l_l, self.n_landmarks, self.band_l)
        z_A, z_B = self.solve_M(b_A, b_B)
        out = out - self._vtp(z_A, z_B)
        return out.reshape(3 * n, o)

    recover_y = SchurQ.recover_y


def operator_error_estimate(Q_ref, Q_fast, iters: int = 6, seed: int = 0,
                            o: int = 1):
    """Spectral-norm estimate of ``Delta = Q_fast - Q_ref`` by power
    iteration on ``Delta^T Delta`` (each iteration: one apply of each
    operator in both directions — Delta is built from symmetric operators
    but its rounding need not be, so the normal-equations form is used).

    Returns a HOST float.  Power iteration converges to ``||Delta||_2`` from
    below; callers needing a margin should multiply by a safety factor (the
    certificate uses 10x — still orders below its 1e-3 acceptance bound for
    the measured ~1e-7-relative two-float error).
    """
    est = _op_err_power(Q_ref, Q_fast, jnp.asarray(iters, jnp.int32),
                        jnp.asarray(seed, jnp.int32))
    return float(jax.device_get(est))


@jax.jit
def _op_err_power(Q_ref, Q_fast, iters, seed):
    d = Q_ref.dim
    v = jax.random.normal(jax.random.PRNGKey(seed), (d, 1), jnp.float64)
    v = v / jnp.linalg.norm(v)

    def dmul(x):
        return Q_fast.apply(x) - Q_ref.apply(x)

    def body(_, carry):
        v, _ = carry
        w = dmul(v)          # Delta v   (Delta^T == Delta up to rounding;
        u = dmul(w)          # Delta^T Delta v via a second symmetric apply)
        nrm = jnp.linalg.norm(u)
        sigma = jnp.sqrt(jnp.maximum(nrm, 1e-300))
        return u / jnp.maximum(nrm, 1e-300), sigma

    _, sigma = jax.lax.fori_loop(0, iters, body,
                                 (v, jnp.zeros((), jnp.float64)))
    return sigma


@jax.jit
def _make_edge_f32(q: SchurQ) -> SchurQEdgeF32:
    wxh_l, wxl_l = _split_f32(q.wx_l)
    cfh_l, cfl_l = _split_f32(q.cf_l)
    wxh_f, wxl_f = _split_f32(q.wx_f)
    cfh_f, cfl_f = _split_f32(q.cf_f)
    return SchurQEdgeF32(q.Q1, q.V1, q.f_l, q.l_l, q.f_f, q.l_f,
                         wxh_l, wxl_l, cfh_l, cfl_l,
                         wxh_f, wxl_f, cfh_f, cfl_f,
                         q.inv_q3, q.inv_sqrt_q3, q.VT_inv)


# above this (N * M * 8 bytes) the build switches from one (N, M) V3F slab
# to landmark-chunked Gram accumulation (~4 GB default, same order as the
# dense-C assembly budget in xm2.choose_implicit)
_SLAB_BUDGET_BYTES = 4 << 30

# beyond-slab builds use host pair expansion while sum_l c_l^2 stays under
# this (bincount over N^2 bins; ~1 s at 3e7 pairs)
_PAIR_BUDGET = 30_000_000


def _vt_gram_pairs(w, f, l, ord_l, bounds_l, N: int, M: int) -> np.ndarray:
    """Exact ``V3F_full @ V3F_full^T`` (camera-0 row included) by per-
    landmark pair expansion on the host.

    ``gram[i, j] = sum_l cf(i, l) cf(j, l)`` only couples cameras observing
    a common landmark: expand each landmark's observing-camera block into
    all (a, b) index pairs and bincount the products into the (N, N) Gram.
    O(sum_l c_l^2) work — for sparse observation graphs this replaces the
    chunked dense-slab Gram's O(M N^2 / chunk-efficiency) GEMM flops.
    """
    q3h = np.bincount(l, weights=w, minlength=M)
    fs, ls, ws = f[ord_l], l[ord_l], w[ord_l]
    cf = ws / np.sqrt(q3h[ls])

    counts = np.diff(bounds_l).astype(np.int64)
    P = counts * counts
    off = np.concatenate([[0], np.cumsum(P)])
    t = np.arange(off[-1], dtype=np.int64) - np.repeat(off[:-1], P)
    c_rep = np.repeat(np.maximum(counts, 1), P)
    s_rep = np.repeat(bounds_l[:-1].astype(np.int64), P)
    a = s_rep + t // c_rep
    b = s_rep + t % c_rep
    flat = fs[a] * np.int64(N) + fs[b]
    gram = np.bincount(flat, weights=cf[a] * cf[b],
                       minlength=N * N).reshape(N, N)
    return gram


@partial(jax.jit, static_argnames=("N", "mc"))
def _vt_chunk_gram(lin_idx, coef, N: int, mc: int):
    """One landmark chunk's Gram contribution: build the chunk's (mc, N)
    V3F^T slab by a SORTED flat segment-sum (unsorted scatter HLO hangs the
    remote compiler — CLAUDE.md rule 6; ``lin_idx = l_off * N + f`` is
    monotone in the landmark-sorted edge order, padding pinned to the last
    slot with zero coefficient) and multiply on the MXU."""
    slab = jax.ops.segment_sum(coef, lin_idx, mc * N,
                               indices_are_sorted=True).reshape(mc, N)
    return jnp.dot(slab.T, slab, precision=jax.lax.Precision.HIGHEST)


def _vt_gram_chunked(w, f, l, ord_l, bounds_l, N: int, M: int,
                     mc: int) -> jax.Array:
    """Accumulate ``V3F_full @ V3F_full.T`` (camera-0 row included) over
    landmark chunks of width ``mc``.

    Host-side prep (numpy): per-chunk edge ranges from the landmark-sorted
    boundaries, padded to the largest chunk so every chunk reuses ONE
    compiled scatter+GEMM program.  Device memory: O(N * mc).
    """
    q3h = np.bincount(l, weights=w, minlength=M)
    fs, ls, ws = f[ord_l], l[ord_l], w[ord_l]
    cf = (ws / np.sqrt(q3h[ls])) * (fs > 0)

    starts = np.asarray(bounds_l[0:M:mc], np.int64)
    ends = np.asarray(bounds_l[np.minimum(np.arange(0, M, mc) + mc, M)],
                      np.int64)
    emax = int((ends - starts).max())
    gram = jnp.zeros((N, N), jnp.float64)
    for k, (e0, e1) in enumerate(zip(starts, ends)):
        cnt = int(e1 - e0)
        # flat (l_off, f) index, monotone in the l-sorted edge order; padded
        # lanes pinned to the LAST slot (keeps sortedness) with coef 0
        li = np.full(emax, mc * N - 1, np.int32)
        co = np.zeros(emax, np.float64)
        li[:cnt] = (ls[e0:e1] - k * mc) * N + fs[e0:e1]
        co[:cnt] = cf[e0:e1]
        gram = gram + _vt_chunk_gram(jnp.asarray(li), jnp.asarray(co), N, mc)
    return gram


def _vt_inv_mixed(VT):
    """SPD inverse via hardware-f32 Cholesky seed + f64 Newton-Schulz.

    The direct route (f64 ``cholesky`` + ``cho_solve`` with N right-hand
    sides) is the implicit operator's build wall on TPU: f64 is software-
    emulated and the triangular solves cost ~20x an equivalent GEMM
    (CLAUDE.md rule 1) — hours at Rome-scale N ~ 10^4.  This ladder keeps
    all O(N^3) work GEMM-shaped:

    1. factor ``VT`` in hardware f32, escalating a relative diagonal shift
       ``tau`` until the factorization succeeds (with shift the seed error is
       ``tau / (lam_min + tau) < 1`` — Newton-Schulz then always contracts);
    2. seed ``X0 = (L^-T)(L^-1)`` with one f32 triangular solve + GEMM;
    3. refine ``X <- X + X (I - VT X)`` in f64 GEMMs until the residual hits
       the f64 floor (error squares per step: <= 7 iterations from a 0.5
       seed error, 2-3 typical).

    Returns ``(X, resid_ratio)`` with ``resid_ratio = ||I - VT X||_F``
    measured on the final iterate in multiples of the attainable f64 floor
    (eps * ||VT|| ||X||); the caller falls back to the exact f64
    factorization if Newton-Schulz stalled (cond(VT) >~ 1/eps_f32 can defeat
    the f32 seed).
    """
    n = VT.shape[0]
    dt = VT.dtype
    scale = jnp.max(jnp.diagonal(VT)).astype(jnp.float32)
    VT32 = VT.astype(jnp.float32)
    eye32 = jnp.eye(n, dtype=jnp.float32)

    def factor(shift):
        return jnp.linalg.cholesky(VT32 + (shift * scale) * eye32)

    L0 = factor(jnp.asarray(0.0, jnp.float32))

    def fac_cond(c):
        shift, L = c
        return jnp.any(jnp.isnan(L)) & (shift < 1.0)

    def fac_body(c):
        shift, _ = c
        shift = jnp.maximum(shift * 16.0, jnp.asarray(1e-7, jnp.float32))
        return shift, factor(shift)

    _, L = jax.lax.while_loop(fac_cond, fac_body,
                              (jnp.asarray(0.0, jnp.float32), L0))
    Linv = jax.lax.linalg.triangular_solve(L, eye32, left_side=True,
                                           lower=True)
    X0 = jnp.dot(Linv.T, Linv,
                 precision=jax.lax.Precision.HIGHEST).astype(dt)

    eye = jnp.eye(n, dtype=dt)

    def resid_of(X):
        E = eye - jnp.dot(VT, X, precision=jax.lax.Precision.HIGHEST)
        return E, jnp.linalg.norm(E)

    E0, r0 = resid_of(X0)

    def ns_cond(c):
        X, E, r, r_prev, it = c
        # continue while strictly contracting: a large-shift seed starts at
        # error ~1 and needs ~14 squarings to the floor; the f64 floor itself
        # shows up as a non-decreasing residual and stops the loop
        return (it < 14) & (r > 1e-14) & (r < r_prev)

    def ns_body(c):
        X, E, r, r_prev, it = c
        X = X + jnp.dot(X, E, precision=jax.lax.Precision.HIGHEST)
        # re-symmetrize every step: for symmetric X the LEFT residual
        # I - X VT is the transpose of the measured right residual; an
        # asymmetric drift would let it grow by a cond(VT) factor unchecked
        X = 0.5 * (X + X.T)
        E, r_new = resid_of(X)
        return X, E, r_new, r, it + 1

    X, E, r, _, _ = jax.lax.while_loop(
        ns_cond, ns_body,
        (X0, E0, r0, jnp.asarray(jnp.inf, dt), jnp.zeros((), jnp.int32)))
    # report the residual as a multiple of the attainable f64 floor
    # (~ eps ||VT|| ||X||, i.e. eps * cond(VT)): the floor itself scales with
    # conditioning — exactly like the direct f64 factorization's — so only a
    # STALL far above it (f32 seed defeated) should trigger the fallback
    floor = jnp.finfo(dt).eps * jnp.linalg.norm(VT) * jnp.linalg.norm(X)
    return X, r / jnp.maximum(floor, jnp.asarray(1e-300, dt))


@partial(jax.jit, static_argnames=("N", "M", "use_gram", "vt_build"))
def _build_schurq(w, x, f_l, l_l, ord_l, f_f, l_f, ord_f, bounds_l, bounds_f,
                  N: int, M: int, vt_gram=None, use_gram: bool = False,
                  vt_build: str = "chol"):
    wx = w[:, None] * x
    q2 = _seg_sum(w[ord_f], f_f, N)
    q3 = _seg_sum(w[ord_l], l_l, M)
    Q1 = _seg_sum((wx[:, :, None] * x[:, None, :])[ord_f], f_f, N)
    V1 = _seg_sum(wx[ord_f], f_f, N)
    inv_q3 = 1.0 / q3
    inv_sqrt_q3 = 1.0 / jnp.sqrt(q3)

    cf_l = w[ord_l] * inv_sqrt_q3[l_l] * (f_l > 0)
    cf_f = w[ord_f] * inv_sqrt_q3[l_f] * (f_f > 0)
    if use_gram:
        gram = vt_gram[1:, 1:]
    else:
        # SORTED flat segment-sum (f-sorted edges make f*M+l monotone);
        # unsorted scatter HLO hangs the remote compiler (CLAUDE.md rule 6)
        flat = jax.ops.segment_sum(
            cf_f, f_f.astype(jnp.int64) * M + l_f, N * M,
            indices_are_sorted=True)
        V3F = flat.reshape(N, M)[1:]
        gram = V3F @ V3F.T
    VT = jnp.diag(q2[1:]) - gram
    if vt_build == "ns":
        VT_inv, vt_resid = _vt_inv_mixed(VT)
    else:
        VT_chol = jnp.linalg.cholesky(VT)
        VT_inv = jax.scipy.linalg.cho_solve(
            (VT_chol, True), jnp.eye(N - 1, dtype=w.dtype))
        vt_resid = jnp.zeros((), w.dtype)
    return SchurQ(Q1, V1, f_l, l_l, wx[ord_l], cf_l,
                  f_f, l_f, wx[ord_f], cf_f, bounds_l, bounds_f,
                  inv_q3, inv_sqrt_q3, VT_inv), vt_resid
