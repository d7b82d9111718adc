"""Multi-host (multi-process) execution test (VERDICT r1 item 2).

Launches 2 coordinated CPU processes (``jax.distributed.initialize`` through
``xmtpu.parallel.distributed``), each owning 4 virtual devices of a global
8-device ``cam`` mesh, loads the dense cost row-slab-wise through
``distributed_dense_q``, and runs the certified staircase under GSPMD across
the processes — asserting both report the same certified optimum as a
single-process solve of the same problem.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# subprocess-launched coordinated JAX runtimes: ~30-60 s per test — keep the
# inner-loop suite fast with `-m "not slow"` (VERDICT r4 item 8)
pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_solve_matches_single_process():
    from xmtpu.assembly.creatematrix import create_matrix_arrays
    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.solver.staircase import solve_arrays

    # single-process reference on the identical problem
    scene = make_scene(n_cameras=16, n_points=60, obs_per_camera=30,
                       noise=1e-4, seed=91)
    C, _ = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    ref = solve_arrays(C, max_rank=4, tol=1e-8, lam=0.0, verbose=False)
    assert ref.certified

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env.update({
            "XMTPU_MH_COORD": f"127.0.0.1:{port}",
            "XMTPU_MH_NPROC": "2",
            "XMTPU_MH_PID": str(pid),
            "XMTPU_MH_LOCAL_DEVICES": "4",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "xmtpu.parallel._multihost_worker"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))

    results = {}
    logs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((p.returncode, out, err))
        for line in out.splitlines():
            if line.startswith("XMTPU_MH_RESULT "):
                r = json.loads(line[len("XMTPU_MH_RESULT "):])
                results[r["pid"]] = r
    assert all(rc == 0 for rc, _, _ in logs), logs
    assert set(results) == {0, 1}, logs

    for pid in (0, 1):
        r = results[pid]
        assert r["n_processes"] == 2
        assert r["n_global_devices"] == 8
        assert r["certified"], r
        np.testing.assert_allclose(r["primal"], float(ref.primal),
                                   rtol=1e-9, atol=1e-12)


def _launch_workers(n_proc, ndev, extra_env=None, timeout=420):
    """Start ``n_proc`` coordinated worker processes; return
    ``(results_by_pid, logs)`` where logs is ``[(rc, stdout, stderr), ...]``."""
    port = _free_port()
    procs = []
    for pid in range(n_proc):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env.update({
            "XMTPU_MH_COORD": f"127.0.0.1:{port}",
            "XMTPU_MH_NPROC": str(n_proc),
            "XMTPU_MH_PID": str(pid),
            "XMTPU_MH_LOCAL_DEVICES": str(ndev),
        })
        env.update(extra_env or {})
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "xmtpu.parallel._multihost_worker"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    results, logs = {}, []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            logs.append((p.returncode, out, err))
            for line in out.splitlines():
                if line.startswith("XMTPU_MH_RESULT "):
                    r = json.loads(line[len("XMTPU_MH_RESULT "):])
                    results[r["pid"]] = r
    except subprocess.TimeoutExpired:
        for q in procs:
            q.kill()
        raise
    return results, logs


def _single_process_reference(n_cam=16, n_pts=60):
    from xmtpu.assembly.creatematrix import create_matrix_arrays
    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.solver.staircase import solve_arrays

    scene = make_scene(n_cameras=n_cam, n_points=n_pts, obs_per_camera=30,
                       noise=1e-4, seed=91)
    C, _ = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    ref = solve_arrays(C, max_rank=4, tol=1e-8, lam=0.0, verbose=False)
    assert ref.certified
    return float(ref.primal)


def test_four_process_solve_matches_single_process():
    """4 processes x 2 devices = the same 8-device global mesh as the
    2-process test, sliced twice as fine across process boundaries
    (VERDICT r3 item 9: multi-process evidence beyond the minimal pair)."""
    primal_ref = _single_process_reference()
    results, logs = _launch_workers(4, 2)
    assert all(rc == 0 for rc, _, _ in logs), logs
    assert set(results) == {0, 1, 2, 3}, logs
    for pid, r in results.items():
        assert r["n_processes"] == 4
        assert r["n_global_devices"] == 8
        assert r["certified"], r
        np.testing.assert_allclose(r["primal"], primal_ref,
                                   rtol=1e-9, atol=1e-12)


def test_two_process_uneven_row_shards():
    """n=13 cameras -> 39 global rows over 8 devices: no shard count divides
    the row count, so GSPMD runs the whole certified staircase on ragged
    (padded) row shards across the process boundary."""
    primal_ref = _single_process_reference(n_cam=13, n_pts=50)
    results, logs = _launch_workers(
        2, 4, extra_env={"XMTPU_MH_N": "13", "XMTPU_MH_M": "50"})
    assert all(rc == 0 for rc, _, _ in logs), logs
    assert set(results) == {0, 1}, logs
    for pid, r in results.items():
        assert r["certified"], r
        np.testing.assert_allclose(r["primal"], primal_ref,
                                   rtol=1e-9, atol=1e-12)


def test_process_dropout_fails_cleanly_not_hang():
    """One launcher slot never joins the coordinator: the live processes
    must terminate with a CLEAN nonzero error once the init barrier times
    out (JAX_INIT_TIMEOUT) — not hang and not report a result.  This is the
    documented startup failure mode for multi-process runs."""
    results, logs = _launch_workers(
        2, 2, extra_env={"XMTPU_MH_DROPOUT": "1", "JAX_INIT_TIMEOUT": "15"},
        timeout=120)
    # the dropped process exits 0 by design; the survivor must FAIL
    assert results == {}, results          # nobody reached a solve
    rc0, out0, err0 = logs[0]
    assert rc0 != 0, (out0, err0)          # clean error, not success
    # the failure is the coordinator/barrier timeout, surfaced in stderr
    assert any(w in (err0 + out0).lower()
               for w in ("timed out", "timeout", "deadline", "unavailable")), \
        (out0, err0)
