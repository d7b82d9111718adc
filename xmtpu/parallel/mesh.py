"""Multi-chip sharding: camera-block row distribution over a device mesh.

The reference is single-process / single-GPU — its multi-GPU plumbing is dead
code (``gpu_id`` always 0, ``cusolverMg`` linked but never called;
/root/reference/XM/include/Utils/memory.h:284, SURVEY.md section 2.5).  The
TPU-native multi-chip story replaces it entirely:

* 1-D mesh over the ``cam`` axis;
* the cost matrix ``C`` is **row-sharded** by camera block, the factor ``R``
  (and all tangent/residual buffers, which share its shape) sharded the same
  way, scales sharded by camera;
* the hot GEMM ``C @ sR`` needs the full ``sR`` on every device — with row
  sharding XLA inserts an all-gather of the thin (3n, o) operand over ICI
  (o <= 5, so the gather is tiny compared to the O(n^2 o) FLOPs);
* every tCG inner product / Gram reduction becomes a ``psum`` over ICI —
  exactly the collective points visible in the reference as cublasDdot calls
  (trustregion.h:67-74).

Everything rides GSPMD: the solver body is unchanged, sharding is injected
through the operand shardings and propagated by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xmtpu.ops import manifold as mf
from xmtpu.solver import trust_region as tr


def make_mesh(n_devices: int | None = None, axis: str = "cam",
              platform: str | None = None) -> Mesh:
    """Build a 1-D device mesh.  ``platform`` selects a specific backend
    (e.g. ``"cpu"`` for the virtual host-device mesh used in tests/dryruns —
    usable even when a TPU backend holds the default slot)."""
    devs = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)} "
                             f"on platform {platform or 'default'}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_problem(mesh: Mesh, C, R, s_ex, axis: str = "cam"):
    """Place (C, R, s_ex) with camera-block row sharding.

    C rows and R camera blocks are split over the mesh; the (3n, o) thin
    operands stay replicated in the GEMM via an XLA all-gather.
    """
    C = jax.device_put(jnp.asarray(C), NamedSharding(mesh, P(axis, None)))
    R = jax.device_put(jnp.asarray(R), NamedSharding(mesh, P(axis, None, None)))
    s_ex = jax.device_put(jnp.asarray(s_ex), NamedSharding(mesh, P(axis)))
    return C, R, s_ex


def sharded_tr_step(mesh: Mesh, C, R, s_ex, lam=0.0, gradtol=1e-8,
                    axis: str = "cam"):
    """One jitted outer trust-region iteration with sharded operands.

    Returns ``(R', s_ex', loss')``.  Used by the multi-chip dryrun and as the
    building block for pod-scale solves; the full solve reuses the same
    shardings via :func:`solve_sharded`.
    """
    C, R, s_ex = shard_problem(mesh, C, R, s_ex, axis)
    n, _, o = R.shape
    dim = n * (3 * o - 6) + n - 1
    delta_bar = jnp.sqrt(jnp.asarray(float(dim)))

    @jax.jit
    def step(C, R, s_ex):
        qmul = lambda Y: jnp.dot(C, Y, precision=jax.lax.Precision.HIGHEST)
        loss = mf.objective(qmul, R, s_ex, lam)
        st = tr.TRState(
            R=R, s_ex=s_ex, loss=loss, delta=delta_bar / 8.0,
            shrink_count=jnp.zeros((), jnp.int32),
            endreason=jnp.asarray(tr.ER_MAX_INNER, jnp.int32),
            k=jnp.zeros((), jnp.int32),
            total_inner=jnp.zeros((), jnp.int32),
            gradnorm=jnp.asarray(jnp.inf, jnp.float64),
            done=jnp.asarray(False),
            done_reason=jnp.asarray(tr.RUNNING, jnp.int32),
        )
        out = tr._outer_step(qmul, st, jnp.asarray(lam, jnp.float64),
                             jnp.asarray(gradtol, jnp.float64), delta_bar,
                             tr.TRConfig())
        return out.R, out.s_ex, out.loss

    return step(C, R, s_ex)


def solve_sharded(mesh: Mesh, C, R0, s_ex0, lam=0.0, gradtol=1e-6,
                  cfg: tr.TRConfig = tr.TRConfig(), axis: str = "cam"):
    """Full sharded trust-region solve: same code path as single-chip, with
    GSPMD-propagated camera-row shardings."""
    C, R0, s_ex0 = shard_problem(mesh, C, R0, s_ex0, axis)
    return tr.trust_region_solve(C, R0, s_ex0, lam=lam, gradtol=gradtol,
                                 cfg=cfg)


def shard_schurq(mesh: Mesh, Q, axis: str = "cam"):
    """Place a factored :class:`~xmtpu.ops.schurq.SchurQ` (or its mixed-edge
    variant) over a 1-D device mesh.

    Sharding layout — the implicit operator's multi-chip story (the dense
    path row-shards C; here the *factors* shard):

    * per-camera leaves (``Q1``, ``V1``) and the ``VT_inv`` rows: split over
      the camera axis — the (n-1)^2 GEMM resolving the Schur complement
      becomes a row-panel matmul with its thin (n-1, o) operand all-gathered
      over ICI, exactly like the dense path's hot GEMM.  ``VT_inv`` has n-1
      rows — guaranteed indivisible whenever n is sized to the mesh — so it
      is zero-row-padded to mesh divisibility before placement (the O(N^2)
      object MUST shard: replicated it dominates per-device memory at scale;
      ``SchurQ.solve_M`` slices the padded GEMM output back to n-1 rows);
    * edge arrays (both sorted orderings): split over the observation axis,
      padded to divisibility with zero-coefficient rows carrying the last
      (sorted) segment id; frame/landmark ``segment_sum`` reductions become
      local partial sums + a GSPMD-inserted scatter/psum at shard boundaries
      (edges are sorted, so only segments straddling a shard edge
      communicate);
    * landmark vectors (``inv_q3``…) and segment bounds: replicated (O(M)
      scalars, negligible next to the O(E) edge payload).

    The solver and certificate are unchanged — GSPMD propagates the
    shardings through the jitted stage programs.
    """
    from dataclasses import fields, replace

    from xmtpu.ops.qop import QOperator
    from xmtpu.ops.schurq import pad_cameras

    assert isinstance(Q, QOperator) and not hasattr(Q, "C")
    if getattr(Q, "band_l", 0) or getattr(Q, "band_f", 0):
        # the Pallas segment-sum kernel does not auto-partition over a
        # mesh: sharded operators take the XLA segment_sum path
        Q = replace(Q, band_l=0, band_f=0)
    n_dev_cam = mesh.devices.size
    n = Q.n_cameras
    if n % n_dev_cam:
        # arbitrary n: zero-extend the camera axis with phantom cameras so
        # Q1/V1 (and R/s through the solve) genuinely row-shard instead of
        # silently replicating (VERDICT r2 item 6)
        Q = pad_cameras(Q, n + (-n) % n_dev_cam)
    row1 = P(axis)
    row2 = P(axis, None)
    row3 = P(axis, None, None)
    specs = {
        "Q1": row3, "V1": row2, "VT_inv": row2,
        # edge leaves: 1-D coefficients/ids vs (e, 3) coordinate rows
        "f_l": row1, "l_l": row1, "f_f": row1, "l_f": row1,
        "wx_l": row2, "wx_f": row2, "cf_l": row1, "cf_f": row1,
        "wxh_l": row2, "wxl_l": row2, "wxh_f": row2, "wxl_f": row2,
        "cfh_l": row1, "cfl_l": row1, "cfh_f": row1, "cfl_f": row1,
    }
    # leaves whose leading dim may be padded to mesh divisibility without
    # changing operator semantics: VT_inv (zero rows, sliced off in solve_M)
    # and the edge payload (zero coefficients; id padding repeats the last
    # sorted id so segment sums stay sorted and the padded contribution is 0)
    pad_zero = {"VT_inv", "wx_l", "wx_f", "cf_l", "cf_f",
                "wxh_l", "wxl_l", "wxh_f", "wxl_f",
                "cfh_l", "cfl_l", "cfh_f", "cfl_f"}
    pad_edge_ids = {"f_l", "l_l", "f_f", "l_f"}
    n_dev = mesh.devices.size
    out = {}
    for f in fields(Q):
        val = getattr(Q, f.name)
        if not hasattr(val, "shape"):
            # static aux (e.g. SchurQEdgeF32 Pallas bands) — never device_put;
            # the Pallas kernel doesn't partition, so bands stay 0 when
            # sharding (edge_f32's auto policy keeps XLA scatter here)
            continue
        spec = specs.get(f.name, P())  # bounds / landmark vectors replicate
        pad = (-val.shape[0]) % n_dev if spec != P() else 0
        if pad:
            if f.name in pad_zero:
                val = jnp.pad(val, [(0, pad)] + [(0, 0)] * (val.ndim - 1))
            elif f.name in pad_edge_ids:
                val = jnp.concatenate(
                    [val, jnp.broadcast_to(val[-1], (pad,))])
            else:
                # unreachable for camera leaves since pad_cameras above made
                # n mesh-divisible; any other leaf reaching here is a layout
                # bug — fail loudly rather than silently replicate
                raise ValueError(
                    f"leaf {f.name} with shape {val.shape} does not divide "
                    f"the {n_dev_cam}-device mesh and has no padding rule")
        out[f.name] = jax.device_put(val, NamedSharding(mesh, spec))
    return replace(Q, **out)


def solve_arrays_sharded(mesh: Mesh, C, axis: str = "cam", **kwargs):
    """Full certified staircase (``solve_arrays``) with the cost operator
    sharded over the mesh — dense C row-sharded by camera block, factored
    SchurQ sharded per :func:`shard_schurq`.

    The staircase's fused stage+certificate program then runs under GSPMD:
    the hot GEMMs row-panel over the mesh with psum'd reductions; the
    certificate's batched dual solves shard along cameras.  Results are
    bitwise-independent of the mesh size (tests/test_sharding.py).
    """
    from xmtpu.ops.qop import QOperator
    from xmtpu.solver.staircase import solve_arrays

    n_orig = None
    if isinstance(C, QOperator) and not hasattr(C, "C"):
        n_orig = C.n_cameras
        C = shard_schurq(mesh, C, axis)
    else:
        C = jax.device_put(jnp.asarray(C, jnp.float64),
                           NamedSharding(mesh, P(axis, None)))
    res = solve_arrays(C, **kwargs)
    if n_orig is not None and C.n_cameras != n_orig:
        # slice the phantom padding cameras back off (pad_cameras)
        res = res._replace(R=res.R[: 3 * n_orig], s_ex=res.s_ex[:n_orig])
    return res
