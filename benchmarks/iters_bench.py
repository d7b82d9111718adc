"""Solver iterations/s at the BASELINE.json north-star scales: 1 chip,
1 host (device mesh), and >= 2 hosts (coordinated processes).

"Iteration" = one tCG inner iteration or one TR outer iteration (each
costs one Hessian-vector/operator apply plus the manifold chain), i.e.
``outer + inner`` of the measured solve — the unit the reference's
per-iteration prints count (trustregion.h:487-526).

The three scales are measured honestly on what this box has:

  1-chip   the real TPU chip: the n=1934 implicit (SchurQ edge_f32) solve
           at tol 1e-1 — identical configuration to bench.py's
           scale_value, cached programs; plus SIMPLE1's all-f32 phase
           (the fused-Pallas iteration floor).
  1-host   an 8-device virtual CPU mesh (XLA GSPMD camera-row sharding;
           same code path a real multi-chip host runs — labeled
           virtual-CPU, its absolute rate is NOT a TPU number).
  2-hosts  2 coordinated processes x 4 devices over jax.distributed
           (same worker as tests/test_multihost.py; virtual-CPU).

Writes assets_work/iters.json.  Usage: python benchmarks/iters_bench.py
[--skip-tpu]
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def one_chip():
    import jax
    import jax.numpy as jnp

    from xmtpu.ops import manifold as mf
    from xmtpu.ops.qop import cast_qop
    from xmtpu.ops.schurq import SchurQ
    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.solver import trust_region as tr

    out = {}
    n_cam = 1934
    scene = make_scene(n_cameras=n_cam, n_points=max(2000, 4 * n_cam),
                      obs_per_camera=60, noise=1e-3, seed=0)
    Q = SchurQ.build(scene.weights, scene.edges, scene.landmarks)
    Q32 = cast_qop(Q, jnp.float32)
    R0 = mf.identity_frames(n_cam, 3)
    s0 = jnp.ones((n_cam,), jnp.float64)
    cfg = tr.TRConfig(chunk=50, inner_f32=True)
    op = Q.edge_f32(pallas=True)

    def run():
        return tr.trust_region_solve(op, R0, s0, 0.0, 1e-1, cfg=cfg,
                                     Q32=Q32)

    res = run()
    jax.device_get(res.primal)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = run()
        jax.device_get(res.primal)
        ts.append(time.perf_counter() - t0)
    iters = int(res.outer_iters) + int(res.total_inner)
    out["chip_n1934_iters_per_s"] = round(iters / float(np.median(ts)), 1)
    out["chip_n1934_iters"] = iters
    print(f"1 chip, n=1934 implicit f64(inner-f32) tol 1e-1: "
          f"{iters} iters / {np.median(ts):.3f} s = "
          f"{out['chip_n1934_iters_per_s']:.0f} it/s")

    # f32 iteration floor (fused Pallas body), SIMPLE1 shapes
    from xmtpu.io.bin_format import load_matrix_from_bin
    qpath = "/root/reference/assets/SIMPLE1/Q.bin"
    if os.path.exists(qpath):
        C, _ = load_matrix_from_bin(qpath)
        C32 = cast_qop(jnp.asarray(C), jnp.float32)
        n = C.shape[0] // 3
        cfg32, g32 = tr.TRConfig().f32_ladder(1e-16)
        R0s = mf.identity_frames(n, 3).astype(jnp.float32)
        s0s = jnp.ones((n,), jnp.float32)

        def run32():
            return tr.trust_region_solve(C32, R0s, s0s, 0.0, g32,
                                         cfg=cfg32, dtype=jnp.float32)

        r = run32()
        jax.device_get(r.primal)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = run32()
            jax.device_get(r.primal)
            ts.append(time.perf_counter() - t0)
        iters = int(r.outer_iters) + int(r.total_inner)
        out["chip_simple1_f32_iters_per_s"] = round(
            iters / float(np.median(ts)), 1)
        print(f"1 chip, SIMPLE1 all-f32 fused-Pallas phase: {iters} iters "
              f"/ {np.median(ts)*1e3:.0f} ms = "
              f"{out['chip_simple1_f32_iters_per_s']:.0f} it/s")
    return out


def one_host():
    """Runs in a SUBPROCESS (--host-only): the CPU backend must be selected
    before any jax use, and one_chip() already initialized the TPU here."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # virtual mesh (CLAUDE rule 0)
    import jax.numpy as jnp

    out = {}
    from xmtpu.ops.schurq import SchurQ
    from xmtpu.parallel.mesh import make_mesh, solve_arrays_sharded
    from xmtpu.pipeline.synthetic import make_scene_window

    scene = make_scene_window(512, 2048, obs_per_camera=20, noise=0.0,
                              seed=21)
    Q = SchurQ.build(scene.weights, scene.edges, scene.landmarks,
                     vt_build="ns")
    mesh = make_mesh(8)
    res = solve_arrays_sharded(mesh, Q, max_rank=3, tol=1e-5, lam=0.0,
                               verbose=False)
    t0 = time.perf_counter()
    res = solve_arrays_sharded(mesh, Q, max_rank=3, tol=1e-5, lam=0.0,
                               verbose=False)
    dt = time.perf_counter() - t0
    iters = int(res.outer_iters) + int(res.total_inner)
    out["host8_n512_iters_per_s"] = round(iters / dt, 1)
    print(f"1 host (8-device virtual CPU mesh), n=512 sharded: {iters} "
          f"iters / {dt:.2f} s = {out['host8_n512_iters_per_s']:.0f} it/s "
          f"(virtual-CPU rate, code-path proof not a TPU number)")

    # single-process DENSE comparator for the multi-process n=512 rows:
    # identical problem/config to the _multihost_worker (make_scene seed 91,
    # tol 1e-8) so hosts{2,4}_n512 divide cleanly into it (VERDICT r4
    # item 4: the collective/barrier overhead must be measured against the
    # same workload)
    import numpy as _np

    from xmtpu.assembly.creatematrix import create_matrix_arrays
    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.solver.staircase import solve_arrays

    scene_d = make_scene(n_cameras=512, n_points=2048, obs_per_camera=30,
                         noise=1e-4, seed=91)
    C, _ = create_matrix_arrays(scene_d.weights, scene_d.edges,
                                scene_d.landmarks)
    Cg = jax.device_put(
        jnp.asarray(C),
        jax.sharding.NamedSharding(mesh,
                                   jax.sharding.PartitionSpec("cam", None)))
    res = solve_arrays(Cg, max_rank=4, tol=1e-8, lam=0.0, verbose=False)
    t0 = time.perf_counter()
    res = solve_arrays(Cg, max_rank=4, tol=1e-8, lam=0.0, verbose=False)
    dt = time.perf_counter() - t0
    iters = int(res.outer_iters) + int(res.total_inner)
    out["host8_n512_dense_iters_per_s"] = round(iters / dt, 1)
    out["host8_n512_dense_iters"] = iters
    print(f"1 host (8-device virtual CPU mesh), n=512 dense (multihost-"
          f"worker problem): {iters} iters / {dt:.2f} s = "
          f"{out['host8_n512_dense_iters_per_s']:.0f} it/s")
    return out


def multi_hosts(n_proc: int, ndev: int, n_cam: int, n_pts: int):
    """``n_proc`` coordinated processes x ``ndev`` virtual CPU devices
    solving the dense n_cam-camera problem under GSPMD — the timed second
    solve's iterations/s.

    VERDICT r4 item 4: the round-4 record's only multi-process row was
    n=16 (camera blocks of 8 per process — barrier latency, not scaling);
    the n=512 rows below put the O(N^2) shard in charge.
    """
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(n_proc):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update({"XMTPU_MH_COORD": f"127.0.0.1:{port}",
                    "XMTPU_MH_NPROC": str(n_proc),
                    "XMTPU_MH_PID": str(pid),
                    "XMTPU_MH_LOCAL_DEVICES": str(ndev),
                    "XMTPU_MH_N": str(n_cam), "XMTPU_MH_M": str(n_pts),
                    "XMTPU_MH_TIMED": "1"})
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "xmtpu.parallel._multihost_worker"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    out = {}
    key = f"hosts{n_proc}_n{n_cam}_iters_per_s"
    for p in procs:
        o, e = p.communicate(timeout=3600)
        for line in o.splitlines():
            if line.startswith("XMTPU_MH_RESULT "):
                r = json.loads(line[len("XMTPU_MH_RESULT "):])
                if r["pid"] == 0 and "iters_per_s" in r:
                    out[key] = r["iters_per_s"]
                    out[f"hosts{n_proc}_n{n_cam}_iters"] = r.get("iters")
                    print(f"{n_proc} hosts ({n_proc} proc x {ndev} virtual "
                          f"CPU devices), n={n_cam} dense: "
                          f"{r['iters_per_s']:.0f} it/s (virtual-CPU rate)")
    if key not in out:
        print(f"WARNING: {key} missing "
              f"(worker stderr tail: {e.splitlines()[-3:] if e else '??'})")
    return out


def main():
    if "--host-only" in sys.argv:
        out = one_host()
        print("HOSTJSON " + json.dumps(out))
        return
    out = {}
    if "--skip-tpu" not in sys.argv:
        out.update(one_chip())
    out.update(multi_hosts(2, 4, 16, 60))       # legacy row (round 4)
    out.update(multi_hosts(2, 4, 512, 2048))    # O(N^2)-dominated shards
    out.update(multi_hosts(4, 2, 512, 2048))
    # one_host in a subprocess: the CPU backend must be picked before any
    # jax use and this process already holds the TPU
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    p = subprocess.run([sys.executable, __file__, "--host-only"], env=env,
                       capture_output=True, text=True, timeout=1200)
    for line in p.stdout.splitlines():
        if line.startswith("HOSTJSON "):
            out.update(json.loads(line[len("HOSTJSON "):]))
        elif line.startswith("1 host"):
            print(line)
    os.makedirs("assets_work", exist_ok=True)
    with open("assets_work/iters.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote assets_work/iters.json")


if __name__ == "__main__":
    main()
