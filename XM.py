"""Drop-in shim for the reference's pybind11 ``XM`` module.

The reference exposes exactly three file-based entry points
(/root/reference/XM/src/XM_main.cu:403-408):

    import XM
    XM.solve(dataset_path, max_rank=10, tol=1e-6, lam=0.0, max_time=1000)
    XM.solve_rebuttle(dataset_path, ...) -> int status
    XM.solve_rank3(dataset_path, ...)

A script written against the CUDA module runs unchanged against this file:
same signatures, same ``Q.bin`` in / ``R.bin``+``s.bin`` out contract, same
return types (``solve``/``solve_rank3`` return None like the reference's
void functions; ``solve_rebuttle`` returns the status int {-2, 1, 2},
XM_main.cu:177).
"""

from xmtpu.solver import staircase as _staircase


def solve(dataset_path: str, max_rank: int = 10, tol: float = 1e-6,
          lam: float = 0.0, max_time: float = 1000.0) -> None:
    """XM main function (XM_main.cu:180; void return)."""
    _staircase.solve(dataset_path, max_rank, tol, lam, max_time)


def solve_rebuttle(dataset_path: str, max_rank: int = 10, tol: float = 1e-6,
                   lam: float = 0.0, max_time: float = 1000.0) -> int:
    """Warm-started solve, returns status (XM_main.cu:35-178)."""
    return _staircase.solve_with_init(dataset_path, max_rank, tol, lam,
                                      max_time)


def solve_rank3(dataset_path: str, max_rank: int = 10, tol: float = 1e-6,
                lam: float = 0.0, max_time: float = 1000.0) -> None:
    """Single rank-3 solve, no certificate (XM_main.cu:312-401)."""
    _staircase.solve_rank3(dataset_path, max_rank, tol, lam, max_time)
