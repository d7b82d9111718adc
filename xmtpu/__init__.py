"""xmtpu — a TPU-native scaled-bundle-adjustment (XM) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ComputationalRobotics/XM-code (arXiv 2502.04640): the convex SDP relaxation of
Scaled Bundle Adjustment solved by a Burer-Monteiro low-rank factorization with
a Riemannian trust-region method on a product manifold, a rank staircase with
saddle escape, and a dual certificate of global optimality — plus the full
surrounding pipeline (Q-matrix assembly, view-graph cleanup, solution recovery,
XM^2 outlier rejection, metrics, front-end adapters).

Everything in the compute path is functional JAX: the trust-region/tCG loops are
`lax.while_loop`s with zero host synchronisation (the reference CUDA core syncs
device->host scalars >=3x per tCG iteration, see
/root/reference/XM/include/XM/trustregion.h:565-626), the certificate's dual
least-squares is solved exactly with batched per-camera 5x5/6x6 normal
equations instead of host-side iterative CGLS (checkeig.h:190-226), and
multi-chip scaling is a camera-block row sharding over a `jax.sharding.Mesh`.

The solver is double-precision by default (matching the reference's `datatype =
double`, XM/include/Optimization/optimization.h:9); importing this package
enables jax x64.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: first-time TPU compiles of the solver loops /
# eigh are minutes; warm runs are milliseconds.  Opt out with
# XMTPU_JAX_CACHE=off.
_cache_dir = _os.environ.get("XMTPU_JAX_CACHE",
                             _os.path.expanduser("~/.cache/xmtpu_jax"))
if _cache_dir != "off":
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs
        pass

from xmtpu.version import __version__  # noqa: E402

from xmtpu.io.bin_format import (  # noqa: E402
    load_matrix_from_bin,
    save_matrix_to_bin,
    load_array_from_bin,
    save_array_to_bin,
)
from xmtpu.solver.staircase import (  # noqa: E402
    solve,
    solve_with_init,
    solve_rank3,
    solve_arrays,
    SolveResult,
)
from xmtpu.solver.trust_region import trust_region_solve, TRConfig  # noqa: E402
from xmtpu.solver.certificate import certify, CertificateResult  # noqa: E402
from xmtpu.assembly.creatematrix import create_matrix, create_matrix_arrays  # noqa: E402
from xmtpu.pipeline.recover import recover_XM  # noqa: E402
from xmtpu.pipeline.graph import checklandmarks, delete_threshold  # noqa: E402

__all__ = [
    "__version__",
    "load_matrix_from_bin",
    "save_matrix_to_bin",
    "load_array_from_bin",
    "save_array_to_bin",
    "solve",
    "solve_with_init",
    "solve_rank3",
    "solve_arrays",
    "SolveResult",
    "trust_region_solve",
    "TRConfig",
    "certify",
    "CertificateResult",
    "create_matrix",
    "create_matrix_arrays",
    "recover_XM",
    "checklandmarks",
    "delete_threshold",
]
