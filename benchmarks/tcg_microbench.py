"""Microbenchmark: where does the tCG iteration's non-GEMM time go?

PERFORMANCE.md ("operator decision") measured ~12 ms/iteration of manifold
overhead at the n=1934 testbed vs 3.8 ms for the VT GEMM — the single-chip
wall at loose tolerances.  This script times each manifold piece INSIDE a
compiled loop (50 reps per program so per-op cost dominates program launch),
plus algebraic variants of the per-camera contractions:

* ``einsum`` batched (n, 3, o) x (n, 3, o) -> (n, 3, 3) contractions — may
  lower to heavily padded MXU batch-matmuls (3x5 blocks in 128x128 tiles);
* elementwise-product + axis reduction formulations of the same math —
  VPU-friendly, no MXU padding.

Usage: python benchmarks/tcg_microbench.py [n_cameras] (default 1934).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from xmtpu.ops import manifold as mf  # noqa: E402


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"{name:55s} {1e3 * t / LOOP:8.3f} ms/iter   ({1e3 * t:.1f} ms /"
          f" {LOOP})")
    return t


LOOP = 50


def loop50(body):
    """Run ``body`` 50x inside one compiled program (carry-threaded)."""

    @jax.jit
    def run(*args):
        def step(i, c):
            return body(*c)

        return jax.lax.fori_loop(0, LOOP, step, args)

    return run


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1934
    o = 3
    rng = np.random.default_rng(0)
    R = jnp.asarray(rng.standard_normal((n, 3, o)))
    R = mf.mgs_rows(R)
    gR = jnp.asarray(rng.standard_normal((n, 3, o)))
    s = jnp.asarray(np.abs(rng.standard_normal(n - 1)) + 0.5)
    s_ex = jnp.concatenate([jnp.ones((1,)), s])
    gs = jnp.asarray(rng.standard_normal(n - 1))

    print(f"n={n}, o={o}, dtype=f64, backend={jax.default_backend()}")

    # --- project: einsum vs elementwise-reduction formulation ---
    def project_einsum(R, gR, gs):
        pgR, pgs = mf.project(R, s, gR, gs)
        return R, pgR, pgs

    def project_elem(R, gR, gs):
        S = (R[:, :, None, :] * gR[:, None, :, :]).sum(-1)
        S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
        pgR = gR - (S[:, :, :, None] * R[:, None, :, :]).sum(2)
        return R, pgR, s * s * gs

    timed("project (einsum, current)", loop50(project_einsum), R, gR, gs)
    timed("project (elementwise+reduce)", loop50(project_elem), R, gR, gs)

    # --- ehess2rhess ---
    egR = jnp.asarray(rng.standard_normal((n, 3, o)))
    egs = jnp.asarray(rng.standard_normal(n - 1))
    Ru = jnp.asarray(rng.standard_normal((n, 3, o)))
    su = jnp.asarray(rng.standard_normal(n - 1))

    def e2r(hR, hs, _):
        rhR, rhs = mf.ehess2rhess(hR, hs, egR, egs, R, s, Ru, su)
        return rhR, rhs, _

    timed("ehess2rhess (einsum, current)", loop50(e2r), gR, gs, R)

    # --- inner products: 3 separate vs one fused ---
    def inner3(aR, a_s, _):
        x = mf.inner(aR, aR, a_s, a_s, s)
        y = mf.inner(aR, gR, a_s, gs, s)
        z = mf.inner(gR, gR, gs, gs, s)
        return aR + (x + y + z) * 0.0, a_s, _

    def inner_fused(aR, a_s, _):
        stack_a = jnp.stack([aR, aR, gR]).reshape(3, -1)
        stack_b = jnp.stack([aR, gR, gR]).reshape(3, -1)
        xyz = jnp.einsum("kf,kf->k", stack_a, stack_b)
        sa = jnp.stack([a_s, a_s, gs])
        sb = jnp.stack([a_s, gs, gs])
        xyz = xyz + jnp.einsum("kn,kn->k", sa, sb / (s * s))
        return aR + jnp.sum(xyz) * 0.0, a_s, _

    timed("3x inner products (current)", loop50(inner3), gR, gs, R)
    timed("3x inner products (fused stack)", loop50(inner_fused), gR, gs, R)

    # --- retraction ---
    def retr(R, _, __):
        R2, s2 = mf.retract(R, s_ex, gR, gs, 1e-3)
        return R2, _, __

    timed("retract (mgs + exp)", loop50(retr), R, gR, gs)

    # --- axpy chain (6 fused elementwise) ---
    def axpys(vR, vs, _):
        a = 0.3
        vR = vR + a * gR
        vs = vs + a * gs
        vR2 = vR + a * egR
        vs2 = vs + a * egs
        return vR + vR2 * 0.5, vs + vs2 * 0.5, _

    timed("axpy chain", loop50(axpys), gR, gs, R)


if __name__ == "__main__":
    main()
