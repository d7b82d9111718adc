"""Rank-staircase driver: solve / solve_with_init / solve_rank3.

TPU-native re-design of the pybind entry points in
/root/reference/XM/src/XM_main.cu (solve :180-310, solve_rebuttle :35-178,
solve_rank3 :312-401).

The staircase runs the Riemannian trust-region solver at rank o = 3, 4, ...,
certifying each solution with the dual certificate.  On an uncertified rank it
grows the factor by one zero column and warm-starts an escape linesearch along
the certificate's minimum-eigenvalue direction divided per-camera by the
scales (DecentDirectionKernal, XM_main.cu:8-16).  Each rank's jitted solve is
shape-specialized; the staircase visits at most ``max_rank - 2`` shapes so
compile caching keeps retraces bounded.

Reference-faithful details:

* ``gradtol`` is passed by reference in the CUDA code and divided by 10 each
  time a rank converges by gradient norm (trustregion.h:532-536), tightening
  the tolerance for subsequent ranks.  Replicated here.
* ``solve_with_init`` (reference ``solve_rebuttle``) loads an initial guess
  but the o=3 stage still uses the identity frame init — only the scales are
  warm-started (XM_main.cu:94-104).  Replicated, quirk and all.
* Status codes: 1 = certified, 2 = max rank reached uncertified,
  -2 = escape linesearch failed (solver returns best-so-far).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from xmtpu.io.bin_format import load_matrix_from_bin, save_matrix_to_bin
from xmtpu.ops import manifold as mf
from xmtpu.solver import trust_region as tr
from xmtpu.solver.certificate import certify

STATUS_CERTIFIED = 1
STATUS_MAX_RANK = 2
STATUS_LINESEARCH_FAIL = -2

_scaled_factor = jax.jit(lambda R, s_ex: mf.flatten(mf.scale_blocks(R, s_ex)))


def _fetch_global(tree):
    """Host fetch that works for multi-process (multi-host) arrays.

    ``jax.device_get`` raises on arrays that are not fully addressable from
    this process (row-sharded R over a multi-host mesh); gather those to
    every host first (tiled: shards concatenate back to the global value).
    Replicated/addressable leaves take the plain path — process_allgather
    would wrongly re-concatenate per-process copies of those."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def fetch_one(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return np.asarray(
                    multihost_utils.process_allgather(x, tiled=True))
            return jax.device_get(x)

        return jax.tree_util.tree_map(fetch_one, tree)
    return jax.device_get(tree)


class SolveResult(NamedTuple):
    R: np.ndarray        # (3n, o) flat factor, row-orthonormal 3x o blocks
    s_ex: np.ndarray     # (n,) extended scales, s_ex[0] == 1
    primal: float
    rank: int
    status: int
    certified: bool
    gap: float
    lam_min: float
    outer_iters: int
    total_inner: int
    # per-rank stage log: one dict per visited rank with wall-clock split
    # (stage_s solve / cert_s certificate), iteration counts and the
    # certificate verdict — the staircase-at-scale measurement record
    # (VERDICT r2 item 4).  Empty for legacy constructions.
    stages: tuple = ()


@partial(jax.jit, static_argnames=("cfg", "kmax", "cfg32", "kmax32",
                                   "inner32", "with_cert", "with_escape"))
def _stage_certify_fused(C, R0, s_ex0, lam, gradtol, gradtol32, delta_bar,
                         bound, cfg: tr.TRConfig, kmax: int,
                         C32=None, cfg32: Optional[tr.TRConfig] = None,
                         kmax32: int = 0, inner32: bool = False,
                         with_cert: bool = True, with_escape: bool = False,
                         esc_v=None, step0=1.0):
    """One device program: (optional f32 warm phase ->) f64 TR stage ->
    dense-auto certificate.

    On remote-dispatch platforms every program boundary costs ~20-40 ms
    (dispatch + blocking scalar fetch); the reference pays a process+disk
    boundary here (XM_main.cu:185-305).  Fusing the rank's solve and its
    certificate removes three round trips from the staircase's hot path.

    The certificate (Cholesky PSD probe + inverse-Lanczos refinement,
    certificate._build_z_dual_psd) runs under ``lax.cond`` only when the TR
    loop finished inside this program's outer-iteration budget; otherwise the
    caller falls back to chunked continuation + separate certify, paying the
    old round trips only on solves long enough that they don't matter.
    """
    from xmtpu.solver.certificate import _build_z_dual_psd

    ls_ok = jnp.asarray(True)
    R_start = R0
    if with_escape:
        # saddle-escape linesearch along the certificate direction
        # (trustregion.h:360-408), in f64 like the reference
        R_ls, _f_ls, ls_ok = tr._escape_linesearch(
            C, R0, s_ex0, esc_v, jnp.asarray(step0, jnp.float64), lam, cfg)
        R_start = jnp.where(ls_ok, R_ls, R0)

    def run_stage(R_start):
        st32 = None
        R1, s1 = R_start, s_ex0
        if cfg32 is not None:
            f32 = jnp.float32
            st32 = tr._init_state(C32, R_start.astype(f32),
                                  s_ex0.astype(f32), lam.astype(f32),
                                  delta_bar.astype(f32), cfg32)
            st32 = tr._run_chunk(C32, st32, lam.astype(f32),
                                 jnp.asarray(gradtol32, f32),
                                 delta_bar.astype(f32), cfg32, kmax32)
            # f64 polish start: re-orthonormalize the f32 iterate in f64
            R1 = mf.mgs_rows(st32.R.astype(jnp.float64))
            s1 = st32.s_ex.astype(jnp.float64).at[0].set(1.0)

        # polish warm-start radius: the f32 phase's final (collapsed)
        # radius is the right step scale for the near-converged f64 phase —
        # delta_bar/8 is orders too big there and burns outers in
        # reject/collapse churn (floored so a hard f32 collapse cannot
        # stall the f64 start)
        delta0 = (jnp.maximum(st32.delta.astype(jnp.float64),
                              delta_bar * 1e-3)
                  if cfg32 is not None else None)
        st = tr._init_state(C, R1, s1, lam, delta_bar, cfg, delta0)
        st = tr._run_chunk(C, st, lam, gradtol, delta_bar, cfg, kmax,
                           C32 if inner32 else None)
        return st, st32

    def fail_stage(R_start):
        # linesearch failure: staircase aborts with primal = -1
        # (XM_main.cu:109-113, trustregion.h:384-406); iterate untouched
        bad = tr.TRState(
            R=R0, s_ex=s_ex0, loss=jnp.asarray(-1.0, jnp.float64),
            QsR=jnp.zeros_like(R0),
            delta=jnp.zeros((), jnp.float64),
            shrink_count=jnp.zeros((), jnp.int32),
            endreason=jnp.asarray(tr.ER_MAX_INNER, jnp.int32),
            k=jnp.zeros((), jnp.int32),
            total_inner=jnp.zeros((), jnp.int32),
            gradnorm=jnp.asarray(jnp.inf, jnp.float64),
            done=jnp.asarray(True),
            done_reason=jnp.asarray(tr.DONE_LINESEARCH_FAIL, jnp.int32),
            collapse_count=jnp.zeros((), jnp.int32),
            accepts_since_collapse=jnp.zeros((), jnp.int32),
        )
        if cfg32 is None:
            return bad, None
        bad32 = jax.tree_util.tree_map(
            lambda x: (x.astype(jnp.float32)
                       if jnp.issubdtype(x.dtype, jnp.floating) else x), bad)
        return bad, bad32

    if with_escape:
        st, st32 = jax.lax.cond(ls_ok, run_stage, fail_stage, R_start)
    else:
        st, st32 = run_stage(R_start)
    sR = mf.flatten(mf.scale_blocks(st.R, st.s_ex))

    def do_cert(_):
        return _build_z_dual_psd(C.C, sR, lam, bound)

    def skip(_):
        z = jnp.zeros((), sR.dtype)
        return (jnp.zeros_like(C.C), z, jnp.asarray(False), z, z,
                jnp.zeros((C.dim,), sR.dtype))

    if not with_cert:
        # rank3_only probes (xm2's adaptive-lambda path) never certify;
        # omitting the cond keeps the certificate graph out of the compile
        return st, st32, sR, None, None, None, None, None, None
    Z, dual, psd, lam_min_est, lam_min_lb, v_inv = jax.lax.cond(
        st.done & ls_ok, do_cert, skip, None)
    return st, st32, sR, Z, dual, psd, lam_min_est, lam_min_lb, v_inv


def _stage_fused(Cq, C32q, R0, s_ex0, lam, gradtol, max_time, verbose,
                 precision: str, bound: float, v0,
                 inner_f32: bool = False, with_cert: bool = True,
                 escape_dir=None, linesearch_step: float = 0.0,
                 chunk: int = 100, checkpoint_path=None, ckpt_meta=None):
    """Run one staircase rank through the fused stage+certificate program.

    Returns ``(res, scalars, cert)`` where ``cert`` is a CertificateResult
    when the certificate was computed in-program, or None when the stage did
    not finish inside the fused chunk (caller certifies separately after the
    chunked continuation).
    """
    from xmtpu.solver import certificate as cert_mod

    n, _, o = R0.shape
    dim = n * (3 * o - 6) + n - 1
    delta_bar = float(np.sqrt(dim))
    cfg = tr.TRConfig(max_time=max_time, inner_f32=inner_f32, chunk=chunk,
                      history=chunk if int(verbose) >= 2 else 0)
    if precision == "mixed":
        cfg32, gradtol32 = cfg.f32_ladder(gradtol)
        kmax32 = cfg32.chunk
    else:
        cfg32, gradtol32, kmax32 = None, 0.0, 0

    with_escape = escape_dir is not None and linesearch_step != 0.0
    deadline = time.monotonic() + max_time  # stage wall budget incl. fused run
    st, st32, sR, Z, dual, psd, lme, lmlb, v_inv = _stage_certify_fused(
        Cq, jnp.asarray(R0, jnp.float64), jnp.asarray(s_ex0, jnp.float64),
        jnp.asarray(lam, jnp.float64), jnp.asarray(gradtol, jnp.float64),
        gradtol32, jnp.asarray(delta_bar, jnp.float64), bound,
        cfg, cfg.chunk, C32q, cfg32, kmax32, inner32=inner_f32,
        with_cert=with_cert, with_escape=with_escape,
        esc_v=(jnp.asarray(escape_dir, jnp.float64) if with_escape else None),
        step0=float(linesearch_step))

    fetch = [st.done, st.k, st.loss, st.gradnorm, st.done_reason,
             st.total_inner]
    if with_cert:
        fetch += [psd, dual, lme, lmlb]
    if st32 is not None:
        fetch += [st32.k, st32.total_inner, st32.done]
    vals = jax.device_get(tuple(fetch))
    done_v, k_v, loss_v, gn_v, reason_v, inner_v = vals[:6]
    if with_cert:
        psd_v, dual_v, lme_v, lmlb_v = vals[6:10]
        rest = vals[10:]
    else:
        rest = vals[6:]
    if st32 is not None:
        k32, i32, done32_v = int(rest[0]), int(rest[1]), bool(rest[2])
    else:
        k32, i32, done32_v = 0, 0, True

    if int(reason_v) == tr.DONE_LINESEARCH_FAIL:
        # escape linesearch failed inside the fused program: reproduce the
        # reference's "linesearch failed! BM stopped!" abort (primal = -1)
        res = tr.TRResult(st.R, st.s_ex, st.loss, st.gradnorm, st.k,
                          st.total_inner, st.done_reason)
        return res, (-1.0, int(reason_v), 0, 0), None

    if not done32_v:
        # the f32 phase outran the fused chunk: the in-program f64 polish
        # started from a truncated warm start, which would silently shift
        # the bulk iterations into ~40x-costlier emulated f64.  Discard it,
        # run the f32 phase to its natural stall with chunked continuation,
        # then polish and certify separately (the unfused ladder from here).
        res32 = tr.continue_chunks(C32q, st32, lam, gradtol32, delta_bar,
                                   cfg32, k_done=k32, deadline=deadline)
        R1 = mf.mgs_rows(res32.R.astype(jnp.float64))
        s1 = res32.s_ex.astype(jnp.float64).at[0].set(1.0)
        res = tr.trust_region_solve(Cq, R1, s1, lam, gradtol, cfg=cfg,
                                    checkpoint_path=checkpoint_path,
                                    ckpt_meta=ckpt_meta,
                                    verbose=int(verbose))
        vals2 = jax.device_get((res.primal, res.done_reason,
                                res.outer_iters, res.total_inner,
                                res32.outer_iters, res32.total_inner))
        primal_v, reason_c = float(vals2[0]), int(vals2[1])
        outer_c, inner_c = int(vals2[2]) + int(vals2[4]), \
            int(vals2[3]) + int(vals2[5])
        if verbose:
            print(f"[xm] rank {o}: primal={primal_v:.6e} "
                  f"outer={outer_c} inner={inner_c} reason={reason_c}")
        return res, (primal_v, reason_c, outer_c, inner_c), None

    if not bool(done_v):
        # f64 stage outran the fused chunk: continue the chunked loop and
        # let the caller certify separately; ONE batched scalar fetch
        # (CLAUDE.md rule 5 — each blocking fetch costs ~20-40 ms here)
        if int(verbose) >= 2 and st.hist is not None:
            tr.print_history(jax.device_get(st.hist), 0, int(k_v))
        res = tr.continue_chunks(Cq, st, lam, gradtol, delta_bar, cfg,
                                 Q32=C32q if inner_f32 else None,
                                 k_done=int(k_v), deadline=deadline,
                                 checkpoint_path=checkpoint_path,
                                 ckpt_meta=ckpt_meta, verbose=int(verbose))
        primal_v, reason_c, outer_c, inner_c = (
            jax.device_get((res.primal, res.done_reason, res.outer_iters,
                            res.total_inner)))
        if verbose:
            print(f"[xm] rank {o}: primal={float(primal_v):.6e} "
                  f"outer={int(outer_c) + k32} inner={int(inner_c) + i32} "
                  f"reason={int(reason_c)}")
        scal = (float(primal_v), int(reason_c),
                int(outer_c) + k32, int(inner_c) + i32)
        return res, scal, None

    res = tr.TRResult(st.R, st.s_ex, st.loss, st.gradnorm, st.k,
                      st.total_inner, st.done_reason)
    if int(verbose) >= 2 and st.hist is not None:
        tr.print_history(jax.device_get(st.hist), 0, int(k_v))
    if verbose:
        print(f"[xm] rank {o}: primal={float(loss_v):.6e} "
              f"gradnorm={float(gn_v):.3e} outer={int(k_v) + k32} "
              f"inner={int(inner_v) + i32} reason={int(reason_v)}")
    scal = (float(loss_v), int(reason_v), int(k_v) + k32, int(inner_v) + i32)
    if not with_cert:
        return res, scal, None
    certified, v, lam_min, gap, dual_out = cert_mod.finish_auto_certificate(
        Z, n, bound, float(loss_v), float(dual_v), bool(psd_v),
        float(lme_v), float(lmlb_v), v_inv, v0=v0)
    if verbose:
        print(f"[certify] primal={float(loss_v):.6e} dual={float(dual_out):.6e} "
              f"gap={float(gap):.3e} lam_min={float(lam_min):.3e} "
              f"certified={bool(certified)}")
    cert = cert_mod.CertificateResult(certified, v, lam_min, gap, dual_out,
                                      jnp.asarray(float(loss_v)))
    return res, scal, cert


def _stage(C, R0, s_ex0, lam, gradtol, max_time, escape_dir, verbose,
           precision: str = "f64", inner_f32: bool = False, Q32=None,
           checkpoint_path=None, ckpt_meta=None,
           stop_on_collapse: bool = False, chunk: Optional[int] = None):
    chunk_eff = chunk or tr.auto_chunk(R0.shape[0])
    cfg = tr.TRConfig(max_time=max_time, inner_f32=inner_f32,
                      chunk=chunk_eff,
                      stop_on_collapse=stop_on_collapse,
                      history=chunk_eff if int(verbose) >= 2 else 0)
    solver = (tr.trust_region_solve_mixed if precision == "mixed"
              else tr.trust_region_solve)
    kw = {"verbose": int(verbose)}
    if precision != "mixed":
        # mid-stage checkpoints cover the f64 solve path; the mixed ladder's
        # f32 phase is short (stop_on_collapse) and restarts cheaply
        kw.update(checkpoint_path=checkpoint_path, ckpt_meta=ckpt_meta)
    if escape_dir is None:
        res = solver(C, R0, s_ex0, lam, gradtol, cfg=cfg, Q32=Q32, **kw)
    else:
        res = solver(C, R0, s_ex0, lam, gradtol,
                     escape_dir=escape_dir, linesearch_step=1.0, cfg=cfg,
                     Q32=Q32, **kw)
    if verbose:
        o = R0.shape[2]
        print(f"[xm] rank {o}: primal={float(res.primal):.6e} "
              f"gradnorm={float(res.gradnorm):.3e} outer={int(res.outer_iters)} "
              f"inner={int(res.total_inner)} reason={int(res.done_reason)}")
    return res


def solve_arrays(C, max_rank: int = 10, tol: float = 1e-6, lam: float = 0.0,
                 max_time: float = 1000.0, s0_ex: Optional[np.ndarray] = None,
                 rank3_only: bool = False, verbose: bool = True,
                 precision: str = "f64", inner_f32: bool = False,
                 edge_f32: bool = False, edge_tf: bool = False,
                 edge_pallas: Optional[bool] = None,
                 checkpoint_path: Optional[str] = None,
                 resume_from: Optional[str] = None,
                 chunk: Optional[int] = None) -> SolveResult:
    """In-memory staircase solve (the reference's file-based ``solve`` without
    the disk round trip; XM_main.cu:180-310).

    Args:
      C: (3n, 3n) cost matrix or QOperator (e.g. SchurQ).
      s0_ex: optional (n,) initial extended scales (solve_rebuttle semantics).
      rank3_only: single rank-3 TR solve, no certificate (solve_rank3).
      precision: "f64" (reference parity) or "mixed" (f32 bulk + f64 polish —
        the TPU fast path; certificates always run in f64).
      edge_f32: for implicit (SchurQ) operators, run the TR stages on the
        two-float mixed operator (f32 edge reductions, f64 VT GEMM —
        :class:`xmtpu.ops.schurq.SchurQEdgeF32`); the certificate and any
        recovery stay on the exact f64 operator.  No effect on dense C.
      edge_tf: like ``edge_f32`` but the FULLY two-float operator
        (:class:`xmtpu.ops.schurq.SchurQTF` — the f32-pair ``VT_inv`` GEMM
        as well; ~5x the mixed operator's apply rate at n=6144, noise floor
        ~1.5e-7 relative).  Takes precedence over ``edge_f32``.
      edge_pallas: with ``edge_f32``, route the mixed operator's f32 segment
        reductions through the Pallas sorted-segment-sum kernel (None = auto:
        TPU backend, single-device operator; see ``SchurQ.edge_f32``).
      checkpoint_path: save the staircase position after every rank stage.
      resume_from: restore a saved staircase position (fine-grained analog of
        the reference's solve_rebuttle warm start).
      chunk: outer iterations per device program (None = trust_region.
        auto_chunk(n)).  Remote TPU runtimes kill long programs; heavy
        stages (exact-f64 implicit operators, high tCG counts) need
        smaller chunks than the mixed-path default (platform rule 3/9).
    """
    from xmtpu.ops.qop import QOperator, as_qop, cast_qop
    from xmtpu.solver.checkpoint import (StaircaseCheckpoint, load_checkpoint,
                                         save_checkpoint)
    from xmtpu.solver.certificate import _min_eig_bound

    if not isinstance(C, QOperator):
        C = jnp.asarray(C, jnp.float64)
        n = C.shape[0] // 3
    else:
        n = C.dim // 3
    Cq = as_qop(C)
    dense = hasattr(Cq, "C")
    C32q = (cast_qop(Cq, jnp.float32)
            if dense and (precision == "mixed" or inner_f32) else None)
    stage_q = Cq
    stage_q32 = None
    if edge_tf and not dense and hasattr(Cq, "two_float"):
        stage_q = Cq.two_float(pallas=edge_pallas)
        if precision == "mixed" or inner_f32:
            stage_q32 = cast_qop(Cq, jnp.float32)
    elif edge_f32 and not dense and hasattr(Cq, "edge_f32"):
        stage_q = Cq.edge_f32(pallas=edge_pallas)
        if precision == "mixed" or inner_f32:
            # inner tCG / f32 phase cast from the BASE operator: single
            # product terms, no hi/lo double work
            stage_q32 = cast_qop(Cq, jnp.float32)
    bound = _min_eig_bound(n)
    gradtol = float(tol)
    chunk_n = chunk if chunk is not None else tr.auto_chunk(n)

    o = 3
    # host-side init arrays: they enter the device at the first jit call's
    # transfer; building them with eager device ops costs ~20 ms per op on
    # remote-dispatch platforms
    R0 = np.broadcast_to(np.eye(3), (n, 3, 3))
    s_ex = (np.asarray(s0_ex, np.float64) if s0_ex is not None
            else np.ones((n,), np.float64))
    escape_dir = None
    prev_escape_v = None

    mid_resume = None   # TRCheckpoint: resume INSIDE a rank (item 8)
    if resume_from is not None:
        from xmtpu.solver.checkpoint import TRCheckpoint

        ck = load_checkpoint(resume_from)
        if isinstance(ck, TRCheckpoint):
            mid_resume = ck
            o = ck.rank
            gradtol = ck.gradtol
        else:
            o = ck.rank
            R0 = jnp.asarray(ck.R)
            s_ex = jnp.asarray(ck.s_ex)
            gradtol = ck.gradtol
            escape_dir = (jnp.asarray(ck.escape_dir)
                          if ck.escape_dir is not None else None)

    R_cur, s_cur = R0, s_ex
    primal = float("nan")
    status = STATUS_MAX_RANK
    certified = False
    gap = float("nan")
    lam_min = float("nan")
    outer = inner = 0

    mid_path = (checkpoint_path + ".mid" if checkpoint_path is not None
                else None)
    stages = []
    while o <= max_rank:
        t_stage0 = time.perf_counter()
        # fused stage+certificate saves ~3 host round trips (~100 ms) but
        # embeds the O(n^3) Cholesky probe in the program; above
        # DENSE_MATVEC_CERT_DIM on accelerators the separate certify() call
        # routes through the O(n^2)-per-matvec flow instead — at 3n ~ 5800
        # the emulated-f64 Cholesky costs minutes (VERDICT r2 item 3)
        from xmtpu.solver.certificate import DENSE_MATVEC_CERT_DIM

        fused_ok = dense and precision in ("f64", "mixed") and (
            3 * n < DENSE_MATVEC_CERT_DIM
            or jax.default_backend() == "cpu")
        cert_pre = None
        meta = dict(rank=o, gradtol=gradtol, lam=float(lam))
        if mid_resume is not None:
            # finish the interrupted rank from its chunk-boundary state
            from xmtpu.solver.checkpoint import tr_state_from_checkpoint

            st = tr_state_from_checkpoint(mid_resume, Q=stage_q)
            dim = n * (3 * o - 6) + n - 1
            delta_bar = float(np.sqrt(dim))
            cfg = tr.TRConfig(max_time=max_time, inner_f32=inner_f32,
                              chunk=chunk_n)
            res = tr.continue_chunks(
                stage_q, st, mid_resume.lam, gradtol, delta_bar, cfg,
                Q32=stage_q32 if inner_f32 else None,
                k_done=mid_resume.k_done,
                deadline=time.monotonic() + max_time,
                checkpoint_path=mid_path, ckpt_meta=meta)
            primal_v, reason_v, outer_v, inner_v = (
                np.asarray(x) for x in jax.device_get(
                    (res.primal, res.done_reason, res.outer_iters,
                     res.total_inner)))
            if verbose:
                print(f"[xm] rank {o} (resumed at outer "
                      f"{mid_resume.k_done}): primal={float(primal_v):.6e}")
            mid_resume = None
        elif fused_ok:
            res, scal, cert_pre = _stage_fused(
                Cq, C32q, R0, s_ex, lam, gradtol, max_time, verbose,
                precision, bound, prev_escape_v, inner_f32=inner_f32,
                with_cert=not rank3_only, escape_dir=escape_dir,
                linesearch_step=(1.0 if escape_dir is not None else 0.0),
                chunk=chunk_n, checkpoint_path=mid_path,
                ckpt_meta=meta)
            primal_v, reason_v, outer_v, inner_v = scal
        else:
            # mixed-edge stages: the approximate operator's ~5e-8 relative
            # noise floor makes every outer after the first trust-radius
            # collapse rejection churn — stop there (the exact-operator
            # certificate decides certification either way)
            res = _stage(stage_q, R0, s_ex, lam, gradtol, max_time,
                         escape_dir, verbose, precision, inner_f32,
                         Q32=stage_q32, checkpoint_path=mid_path,
                         ckpt_meta=meta,
                         stop_on_collapse=stage_q is not Cq, chunk=chunk_n)
            primal_dev = res.primal
            if stage_q is not Cq:
                # approximate-operator stage (edge_f32 / edge_tf): re-read
                # the objective through the EXACT operator — at near-zero
                # optima the fast operator's absolute noise (~eta ||sR||^2)
                # is visible against the primal itself (it can even read
                # NEGATIVE), and the certificate gap test divides by it
                # (one exact apply; round 5).  Only the linesearch-fail
                # sentinel keeps the stage's own primal (guarded by
                # done_reason, NOT by sign — a noise-negative primal must
                # be replaced too); no extra host sync.
                exact_p = mf.objective(Cq.apply, res.R, res.s_ex,
                                       jnp.asarray(lam, jnp.float64))
                primal_dev = jnp.where(
                    res.done_reason == tr.DONE_LINESEARCH_FAIL,
                    res.primal, exact_p)
                res = res._replace(primal=primal_dev)
            # one batched scalar fetch per stage
            primal_v, reason_v, outer_v, inner_v = (
                np.asarray(x) for x in jax.device_get(
                    (primal_dev, res.done_reason, res.outer_iters,
                     res.total_inner)))
        outer += int(outer_v)
        inner += int(inner_v)
        t_stage = time.perf_counter() - t_stage0

        if float(primal_v) < 0 and int(reason_v) == tr.DONE_LINESEARCH_FAIL:
            status = STATUS_LINESEARCH_FAIL
            stages.append(dict(rank=o, stage_s=t_stage, cert_s=0.0,
                               outer=int(outer_v), inner=int(inner_v),
                               reason=int(reason_v), primal=float(primal_v),
                               certified=False))
            break

        R_cur, s_cur, primal = res.R, res.s_ex, float(primal_v)
        if int(reason_v) == tr.DONE_GRADTOL:
            gradtol /= 10.0  # trustregion.h:534 (pass-by-reference tol)

        if rank3_only:
            status = STATUS_MAX_RANK
            stages.append(dict(rank=o, stage_s=t_stage, cert_s=0.0,
                               outer=int(outer_v), inner=int(inner_v),
                               reason=int(reason_v), primal=float(primal_v),
                               certified=False))
            break

        t_cert0 = time.perf_counter()
        if cert_pre is not None:
            # fused stage+certificate program: the split is not observable —
            # stage_s carries the combined wall (cert_s = 0, fused=True)
            cert = cert_pre
        else:
            sR = _scaled_factor(R_cur, s_cur)
            # implicit operators on a single TPU device: per-iteration
            # certificate matvecs ride the two-float fast operator with
            # exact-anchored decisions (certificate.certify fast="auto";
            # VERDICT r4 item 1)
            cert = certify(C, sR, lam, res.primal, verbose=verbose,
                           v0=prev_escape_v, fast="auto")
        certified_v, gap_v, lam_min_v = jax.device_get(
            (cert.certified, cert.gap, cert.lam_min))
        gap, lam_min = float(gap_v), float(lam_min_v)
        stages.append(dict(
            rank=o, stage_s=t_stage, cert_s=time.perf_counter() - t_cert0,
            fused=cert_pre is not None, outer=int(outer_v),
            inner=int(inner_v), reason=int(reason_v), primal=float(primal_v),
            certified=bool(certified_v), gap=gap, lam_min=lam_min))

        if bool(certified_v):
            status = STATUS_CERTIFIED
            certified = True
            break
        if o < max_rank:
            # grow one zero column, warm-start escape direction v / s
            R0 = jnp.concatenate(
                [R_cur, jnp.zeros((n, 3, 1), R_cur.dtype)], axis=2)
            s_ex = s_cur
            prev_escape_v = cert.v
            v_host, s_host_esc = _fetch_global((cert.v, s_cur))
            escape_dir = (np.asarray(v_host).reshape(n, 3)
                          / np.asarray(s_host_esc)[:, None])
            escape_dir = jnp.asarray(escape_dir.reshape(3 * n))
            o += 1
            if checkpoint_path is not None:
                R0_h, s_h = _fetch_global((R0, s_ex))
                if jax.process_index() == 0:
                    save_checkpoint(checkpoint_path, StaircaseCheckpoint(
                        R=np.asarray(R0_h), s_ex=np.asarray(s_h), rank=o,
                        gradtol=gradtol, escape_dir=np.asarray(escape_dir),
                        lam=float(lam)))
        else:
            status = STATUS_MAX_RANK
            break

    # flatten on the host: (n,3,o) -> (3n,o) is a reshape, not worth a
    # device program + extra round trip on remote-dispatch platforms
    R_host, s_host = _fetch_global((R_cur, s_cur))
    R_flat = np.asarray(R_host).reshape(-1, R_host.shape[-1])
    return SolveResult(
        R=np.asarray(R_flat),
        s_ex=np.asarray(s_host),
        primal=primal,
        rank=R_cur.shape[2],
        status=status,
        certified=certified,
        gap=gap,
        lam_min=lam_min,
        outer_iters=outer,
        total_inner=inner,
        stages=tuple(stages),
    )


def _save_result(dataset_path: str, result: SolveResult) -> None:
    """Write R.bin / s.bin in the reference format (XM_main.cu:283-305)."""
    save_matrix_to_bin(os.path.join(dataset_path, "R.bin"), result.R)
    save_matrix_to_bin(os.path.join(dataset_path, "s.bin"),
                       result.s_ex.reshape(-1, 1))


def solve(dataset_path: str, max_rank: int = 10, tol: float = 1e-6,
          lam: float = 0.0, max_time: float = 1000.0,
          verbose: bool = True) -> SolveResult:
    """File-based staircase solve: reads ``Q.bin``, writes ``R.bin``/``s.bin``.

    Drop-in for ``XM.solve(dataset_path, max_rank, tol, lam, max_time)``
    (XM_main.cu:180).
    """
    C, _ = load_matrix_from_bin(os.path.join(dataset_path, "Q.bin"))
    result = solve_arrays(C, max_rank, tol, lam, max_time, verbose=verbose)
    _save_result(dataset_path, result)
    return result


def solve_with_init(dataset_path: str, max_rank: int = 10, tol: float = 1e-6,
                    lam: float = 0.0, max_time: float = 1000.0,
                    verbose: bool = True) -> int:
    """Warm-started solve (reference ``solve_rebuttle``, XM_main.cu:35-178).

    Reads ``R_ini.bin``/``s_ini.bin``; per the reference only the scales
    survive into the o=3 stage.  Returns the status code.
    """
    C, _ = load_matrix_from_bin(os.path.join(dataset_path, "Q.bin"))
    s_ini, _ = load_matrix_from_bin(os.path.join(dataset_path, "s_ini.bin"))
    result = solve_arrays(C, max_rank, tol, lam, max_time,
                          s0_ex=np.asarray(s_ini).ravel(), verbose=verbose)
    _save_result(dataset_path, result)
    return result.status


def solve_rank3(dataset_path: str, max_rank: int = 10, tol: float = 1e-6,
                lam: float = 0.0, max_time: float = 1000.0,
                verbose: bool = True) -> SolveResult:
    """Single rank-3 TR solve, no certificate (XM_main.cu:312-401)."""
    C, _ = load_matrix_from_bin(os.path.join(dataset_path, "Q.bin"))
    result = solve_arrays(C, max_rank, tol, lam, max_time, rank3_only=True,
                          verbose=verbose)
    _save_result(dataset_path, result)
    return result
