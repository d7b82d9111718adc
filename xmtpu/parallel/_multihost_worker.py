"""Worker process for the multi-host (multi-process) solve test.

Run as ``python -m xmtpu.parallel._multihost_worker`` with env:

  XMTPU_MH_COORD          coordinator address (host:port)
  XMTPU_MH_NPROC          number of coordinated processes
  XMTPU_MH_PID            this process's id
  XMTPU_MH_LOCAL_DEVICES  virtual CPU devices per process (default 4)
  XMTPU_MH_N / XMTPU_MH_M scene size overrides (default 16 / 60 cameras /
                          landmarks; an n with 3n not divisible by the
                          global device count exercises uneven row shards)
  XMTPU_MH_DROPOUT        set on ONE process id: that process exits before
                          joining the runtime, simulating a crashed launcher
                          slot; the others must fail with a clean error when
                          the init barrier times out (JAX_INIT_TIMEOUT)

Each process joins the ``jax.distributed`` runtime, builds the SAME dense
cost matrix locally (deterministic synthetic scene), loads only its row slab
into the global mesh through ``distributed_dense_q``, runs the certified
staircase (``solve_arrays``) under GSPMD across processes, and prints one
``XMTPU_MH_RESULT {json}`` line.  The parent test asserts both processes
report the single-process certified optimum.

This replaces — for real — the reference's dead multi-GPU plumbing
(/root/reference/XM/include/Utils/memory.h:284, SURVEY.md section 5.8).
"""

import json
import os


def main() -> None:
    n_proc = int(os.environ["XMTPU_MH_NPROC"])
    pid = int(os.environ["XMTPU_MH_PID"])
    coord = os.environ["XMTPU_MH_COORD"]
    ndev = int(os.environ.get("XMTPU_MH_LOCAL_DEVICES", "4"))
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={ndev}").strip()

    if os.environ.get("XMTPU_MH_DROPOUT") == str(pid):
        # simulated launcher-slot crash: exit before joining the runtime
        print("XMTPU_MH_DROPOUT exiting", flush=True)
        return

    import jax

    # the axon sitecustomize force-sets jax_platforms at interpreter start;
    # this worker must run on the virtual CPU backend (CLAUDE.md rule 0)
    jax.config.update("jax_platforms", "cpu")

    from xmtpu.parallel.distributed import (distributed_dense_q, global_mesh,
                                            init_distributed)

    init_distributed(coordinator_address=coord, num_processes=n_proc,
                     process_id=pid)
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.devices()) == n_proc * ndev

    import numpy as np

    from xmtpu.assembly.creatematrix import create_matrix_arrays
    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.solver.staircase import solve_arrays

    n_cam = int(os.environ.get("XMTPU_MH_N", "16"))
    n_pts = int(os.environ.get("XMTPU_MH_M", "60"))
    scene = make_scene(n_cameras=n_cam, n_points=n_pts, obs_per_camera=30,
                       noise=1e-4, seed=91)
    C, _ = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    C_np = np.asarray(C)

    mesh = global_mesh()
    Cg = distributed_dense_q(mesh, lambda a, b: C_np[a:b], C_np.shape)
    res = solve_arrays(Cg, max_rank=4, tol=1e-8, lam=0.0, verbose=False)
    if Cg.shape[0] != C_np.shape[0]:
        # phantom padding cameras: trim per distributed_dense_q's contract
        n = C_np.shape[0] // 3
        res = res._replace(R=res.R[: 3 * n], s_ex=res.s_ex[:n])
    assert res.R.shape[0] == C_np.shape[0]
    out = {"pid": pid, "primal": float(res.primal),
           "certified": bool(res.certified), "rank": int(res.rank),
           "status": int(res.status),
           "n_global_devices": len(jax.devices()),
           "n_processes": jax.process_count()}
    if os.environ.get("XMTPU_MH_TIMED") == "1":
        # warm second solve for the iterations/s record
        # (benchmarks/iters_bench.py); programs are compiled by the first
        import time

        t0 = time.perf_counter()
        res2 = solve_arrays(Cg, max_rank=4, tol=1e-8, lam=0.0,
                            verbose=False)
        dt = time.perf_counter() - t0
        iters = int(res2.outer_iters) + int(res2.total_inner)
        out["iters_per_s"] = round(iters / dt, 1)
        out["iters"] = iters
    print("XMTPU_MH_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
