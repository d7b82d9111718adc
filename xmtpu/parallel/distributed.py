"""Multi-host runtime: initialization + host-sharded problem loading.

The reference has no distributed backend at all — single process, single GPU,
with dead multi-GPU plumbing (SURVEY.md section 5.8).  xmtpu's multi-host
story is the standard JAX one:

* ``init_distributed()`` wraps ``jax.distributed.initialize`` (coordinator
  address/process id from env or args);
* a global 1-D ``cam`` mesh over all devices of all hosts;
* camera-block row sharding (xmtpu.parallel.mesh) — XLA routes the tCG
  reductions as ``psum`` over ICI within a slice and DCN across slices;
* each host materializes only its camera-row slab of C via
  ``jax.make_array_from_callback``.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     initialization_timeout: float | None = None) -> None:
    """Initialize the multi-host runtime (no-op when single-process).

    Reads ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` when args are omitted.

    ``initialization_timeout`` (seconds; env ``JAX_INIT_TIMEOUT``) bounds the
    coordinator barrier: a process that never joins (crash before init, bad
    launcher config) turns into a CLEAN RuntimeError on every live process
    after this long instead of an indefinite hang — the documented failure
    mode for process dropout at startup (tests/test_multihost.py).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single host
    if initialization_timeout is None and "JAX_INIT_TIMEOUT" in os.environ:
        initialization_timeout = float(os.environ["JAX_INIT_TIMEOUT"])
    kw = {}
    if initialization_timeout is not None:
        kw["initialization_timeout"] = int(initialization_timeout)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=process_id if process_id is not None
        else int(os.environ["JAX_PROCESS_ID"]),
        **kw,
    )


def global_mesh(axis: str = "cam") -> Mesh:
    return Mesh(np.array(jax.devices()), (axis,))


def distributed_dense_q(mesh: Mesh, load_rows, shape, axis: str = "cam",
                        dtype=np.float64):
    """Build a row-sharded global dense C without any host holding all of it.

    ``load_rows(start, stop) -> np.ndarray`` supplies a row slab (e.g. reading
    a slice of ``Q.bin`` with a memory map).

    When the camera count does not divide the mesh (multi-process arrays
    require even tiling — GSPMD's implicit-padding escape hatch is
    single-controller only), the matrix is zero-extended with PHANTOM camera
    blocks to the next multiple of the device count, the dense analog of
    ``schurq.pad_cameras``: zero diagonal blocks contribute nothing to the
    quadratic form, the solver leaves phantom frames at their initial
    iterate (zero gradient), and the certificate's per-camera dual solves
    are ridge-floored so ``Z`` just gains exact zero eigenvalues — a
    ``lam_min > -bound`` decision (bound > 0) never flips.

    RETURN CONTRACT (ADVICE r4): the returned array has PADDED shape
    ``(3 n_pad, 3 n_pad)`` with ``n_pad = ceil(n / n_devices) * n_devices``
    — solver outputs computed on it (R, s_ex, escape direction) carry
    phantom rows the caller must slice back to ``n``.  Use
    :func:`solve_arrays_distributed` for a staircase solve with the
    trimming handled.
    """
    sharding = NamedSharding(mesh, P(axis, None))
    n_dev = mesh.devices.size
    n = shape[0] // 3
    n_pad = n + (-n) % n_dev
    pshape = (3 * n_pad, 3 * n_pad)

    def cb(index):
        rows = index[0]
        a, b = rows.start or 0, rows.stop or pshape[0]
        out = np.zeros((b - a, pshape[1]), dtype=dtype)
        if a < shape[0]:
            hi = min(b, shape[0])
            out[: hi - a, : shape[1]] = np.asarray(load_rows(a, hi),
                                                   dtype=dtype)
        return out

    return jax.make_array_from_callback(pshape, sharding, cb)


def solve_arrays_distributed(mesh: Mesh, load_rows, shape, axis: str = "cam",
                             **kwargs):
    """Certified staircase on a distributed row-slab-loaded dense C, with
    phantom padding cameras sliced back off the solution (the multi-process
    analog of ``parallel.mesh.solve_arrays_sharded``'s trim)."""
    from xmtpu.solver.staircase import solve_arrays

    n = shape[0] // 3
    Cg = distributed_dense_q(mesh, load_rows, shape, axis)
    res = solve_arrays(Cg, **kwargs)
    if Cg.shape[0] != shape[0]:
        res = res._replace(R=res.R[: 3 * n], s_ex=res.s_ex[:n])
    return res
