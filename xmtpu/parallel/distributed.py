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
                     process_id: int | None = None) -> None:
    """Initialize the multi-host runtime (no-op when single-process).

    Reads ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` when args are omitted.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=process_id if process_id is not None
        else int(os.environ["JAX_PROCESS_ID"]),
    )


def global_mesh(axis: str = "cam") -> Mesh:
    return Mesh(np.array(jax.devices()), (axis,))


def distributed_dense_q(mesh: Mesh, load_rows, shape, axis: str = "cam",
                        dtype=np.float64):
    """Build a row-sharded global dense C without any host holding all of it.

    ``load_rows(start, stop) -> np.ndarray`` supplies a row slab (e.g. reading
    a slice of ``Q.bin`` with a memory map).
    """
    sharding = NamedSharding(mesh, P(axis, None))

    def cb(index):
        rows = index[0]
        return np.asarray(load_rows(rows.start or 0, rows.stop or shape[0]),
                          dtype=dtype)

    return jax.make_array_from_callback(shape, sharding, cb)
