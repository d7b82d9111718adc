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


def load_checkpoint(path: str) -> "StaircaseCheckpoint | TRCheckpoint":
    """Load either checkpoint kind (between-rank or mid-stage)."""
    z = np.load(path)
    if "kind" in z and str(z["kind"]) == "tr_mid":
        return _tr_from_npz(z)
    esc = z["escape_dir"]
    return StaircaseCheckpoint(
        R=z["R"], s_ex=z["s_ex"], rank=int(z["rank"]),
        gradtol=float(z["gradtol"]),
        escape_dir=None if esc.size == 0 else esc,
        lam=float(z["lam"]),
    )


class TRCheckpoint(NamedTuple):
    """Mid-stage checkpoint: the full trust-region loop state at a chunk
    boundary (VERDICT r1 item 8) — a long single-rank solve at scale can be
    killed and resumed INSIDE the rank, not just between ranks.

    ``state_arrays`` holds every ``TRState`` field in order; ``k_done`` the
    outer iterations completed; the rest reconstructs the stage context.
    """

    state_arrays: dict
    k_done: int
    rank: int
    gradtol: float
    lam: float


_TR_FIELDS = ("R", "s_ex", "loss", "delta", "shrink_count", "endreason",
              "k", "total_inner", "gradnorm", "done", "done_reason",
              # optimization carries (ADVICE r2): QsR keeps the resumed solve
              # on the one-matvec-per-outer path and the same compiled
              # program structure; the collapse counters keep the
              # stop_on_collapse churn gate's history across a resume
              "QsR", "collapse_count", "accepts_since_collapse",
              # per-outer history ring buffer (None unless TRConfig.history)
              "hist")


def save_tr_checkpoint(path: str, state, k_done: int, rank: int,
                       gradtol: float, lam: float) -> None:
    """Serialize a ``trust_region.TRState`` (host-fetched) at a chunk
    boundary.  Atomic-ish: write then rename so a kill mid-write never
    corrupts the previous checkpoint."""
    import os

    import jax

    fields = [f for f in _TR_FIELDS if getattr(state, f) is not None]
    vals = jax.device_get(tuple(getattr(state, f) for f in fields))
    tmp = path + ".tmp.npz"
    np.savez(tmp, kind="tr_mid", k_done=k_done, rank=rank, gradtol=gradtol,
             lam=lam, **{f"st_{f}": np.asarray(v)
                         for f, v in zip(fields, vals)})
    os.replace(tmp, path)


def _tr_from_npz(z) -> TRCheckpoint:
    return TRCheckpoint(
        state_arrays={f: z[f"st_{f}"] for f in _TR_FIELDS if f"st_{f}" in z},
        k_done=int(z["k_done"]), rank=int(z["rank"]),
        gradtol=float(z["gradtol"]), lam=float(z["lam"]))


def tr_state_from_checkpoint(ck: TRCheckpoint, Q=None, lam: float = 0.0):
    """Rebuild a device ``TRState`` from a mid-stage checkpoint.

    ``QsR``/``collapse_gn`` are restored when present.  For legacy files
    without ``QsR``, pass the stage operator ``Q`` to recompute it (one
    matvec) so the resumed solve keeps the carried-matvec program structure
    instead of silently compiling the two-matvec variant (ADVICE r2).
    """
    import jax.numpy as jnp

    from xmtpu.ops import manifold as mf
    from xmtpu.ops.qop import as_qop
    from xmtpu.solver.trust_region import TRState

    kw = {f: jnp.asarray(ck.state_arrays[f])
          for f in _TR_FIELDS if f in ck.state_arrays}
    if "QsR" not in kw and Q is not None:
        R = kw["R"]
        sR = mf.flatten(mf.scale_blocks(R, kw["s_ex"]))
        kw["QsR"] = mf.unflatten(2.0 * as_qop(Q).apply(sR))
    for f in ("collapse_count", "accepts_since_collapse"):
        if f not in kw:
            kw[f] = jnp.zeros((), jnp.int32)
    return TRState(**kw)
