"""Solver-state checkpoint/resume.

The reference's recovery story is coarse file-based stage artifacts plus a
warm-start entry point (``solve_rebuttle`` reading ``R_ini.bin``/``s_ini.bin``,
XM_main.cu:35-63; SURVEY.md section 5.4).  xmtpu keeps the stage-artifact
pattern (every pipeline step passes arrays that can be .npz'd) and adds
fine-grained solver checkpoints: the full staircase position (rank, factor,
scales, tolerance schedule) round-trips through one ``.npz``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


class StaircaseCheckpoint(NamedTuple):
    R: np.ndarray          # (n, 3, o) current factor
    s_ex: np.ndarray       # (n,)
    rank: int
    gradtol: float         # current (possibly /10-tightened) tolerance
    escape_dir: Optional[np.ndarray]   # (3n,) pending escape direction or None
    lam: float


def save_checkpoint(path: str, ckpt: StaircaseCheckpoint) -> None:
    np.savez(
        path,
        R=ckpt.R, s_ex=ckpt.s_ex, rank=ckpt.rank, gradtol=ckpt.gradtol,
        escape_dir=(ckpt.escape_dir if ckpt.escape_dir is not None
                    else np.zeros(0)),
        lam=ckpt.lam,
    )


def load_checkpoint(path: str) -> StaircaseCheckpoint:
    z = np.load(path)
    esc = z["escape_dir"]
    return StaircaseCheckpoint(
        R=z["R"], s_ex=z["s_ex"], rank=int(z["rank"]),
        gradtol=float(z["gradtol"]),
        escape_dir=None if esc.size == 0 else esc,
        lam=float(z["lam"]),
    )
