"""Fused Pallas tCG body vs the XLA reference path (interpret mode).

The fused kernel (xmtpu.ops.pallas_tcg) must reproduce
``trust_region._inner_tcg``'s Steihaug recurrences.  Run in f64-free f32 on
tiny problems; reduction order differs between the two implementations so
comparisons are f32-loose, while the DISCRETE outcomes (end reason,
iteration count) must match exactly on a well-separated problem.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("XMTPU_PALLAS_TCG", "off")  # default off on CPU suite

import jax
import jax.numpy as jnp

from xmtpu.ops import manifold as mf
from xmtpu.ops import pallas_tcg
from xmtpu.solver import trust_region as tr


def _problem(n=12, o=3, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(3 * n, 3 * n))
    C = jnp.asarray((A @ A.T / (3 * n) + np.eye(3 * n)), jnp.float32)
    R = mf.mgs_rows(jnp.asarray(rng.normal(size=(n, 3, o)), jnp.float32))
    s_ex = jnp.asarray(np.abs(rng.normal(size=n)) + 0.5,
                       jnp.float32).at[0].set(1.0)
    return C, R, s_ex


def _stage_inputs(C, R, s_ex, lam=0.0):
    qmul = lambda Y: C @ Y
    egR, egs, CsR = mf.egrad_csr(qmul, R, s_ex, lam)
    pgR, pgs = mf.project(R, s_ex[1:], egR, egs)
    gradnorm = jnp.sqrt(mf.inner(pgR, pgR, pgs, pgs, s_ex[1:]))
    minv = tr._build_minv(jnp.broadcast_to(jnp.eye(3, dtype=R.dtype),
                                           (R.shape[0], 3, 3)),
                          s_ex, jnp.asarray(lam, R.dtype))
    return qmul, CsR, egR, egs, pgR, pgs, gradnorm, minv


@pytest.mark.parametrize("o", [3, 5])
@pytest.mark.parametrize("dense_in_kernel", [True, False])
def test_fused_matches_xla_inner_loop(o, dense_in_kernel):
    """Covers BOTH kernel variants: dense-in-kernel (qmul is a DenseQ bound
    method -> the MXU GEMM runs inside the kernel) and the two-program path
    (plain callable qmul -> XLA GEMM + kernel)."""
    C, R, s_ex = _problem(n=12, o=o, seed=3)
    lam = jnp.asarray(0.0, jnp.float32)
    qmul, CsR, egR, egs, pgR, pgs, gradnorm, minv = _stage_inputs(C, R, s_ex)
    if dense_in_kernel:
        from xmtpu.ops.qop import DenseQ
        qmul = DenseQ(C).apply
    delta = jnp.asarray(1.0, jnp.float32)
    cfg = tr.TRConfig.for_dtype(jnp.float32, max_inner=25)

    ref = tr._inner_tcg(qmul, R, s_ex, CsR, egR, egs, pgR, pgs, gradnorm,
                        delta, lam, cfg, minv=minv)

    os.environ["XMTPU_PALLAS_TCG"] = "interpret"
    try:
        fused = pallas_tcg.inner_tcg_fused(qmul, R, s_ex, CsR, egR, egs,
                                           pgR, pgs, gradnorm, delta, lam,
                                           cfg, minv)
    finally:
        os.environ["XMTPU_PALLAS_TCG"] = "off"

    vR_r, vs_r, hvR_r, hvs_r, er_r, it_r = map(np.asarray, ref)
    vR_f, vs_f, hvR_f, hvs_f, er_f, it_f = map(np.asarray, fused)
    assert int(er_f) == int(er_r)
    assert int(it_f) == int(it_r)
    scale = max(1e-3, float(np.abs(vR_r).max()))
    np.testing.assert_allclose(vR_f, vR_r, atol=2e-4 * scale, rtol=2e-3)
    np.testing.assert_allclose(vs_f, vs_r, atol=2e-4, rtol=2e-3)
    hscale = max(1e-3, float(np.abs(hvR_r).max()))
    np.testing.assert_allclose(hvR_f, hvR_r, atol=5e-4 * hscale, rtol=5e-3)
    np.testing.assert_allclose(hvs_f, hvs_r, atol=5e-4, rtol=5e-3)


def test_fused_full_solve_reaches_same_basin():
    """End-to-end f32 trust-region solve with the fused body (interpret):
    must reach the same loss as the XLA path to f32 accuracy."""
    C, R, s_ex = _problem(n=10, o=3, seed=7)
    cfg = tr.TRConfig.for_dtype(jnp.float32, max_outer=30, chunk=30)

    res_ref = tr.trust_region_solve(C, R, s_ex, 0.0, 1e-4, cfg=cfg,
                                    dtype=jnp.float32)
    os.environ["XMTPU_PALLAS_TCG"] = "interpret"
    try:
        res_f = tr.trust_region_solve(C, R, s_ex, 0.0, 1e-4, cfg=cfg,
                                      dtype=jnp.float32)
    finally:
        os.environ["XMTPU_PALLAS_TCG"] = "off"
    assert np.isfinite(float(res_f.primal))
    np.testing.assert_allclose(float(res_f.primal), float(res_ref.primal),
                               rtol=1e-4, atol=1e-5)


def test_layout_roundtrip():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(150, 3, 5)), jnp.float32)
    Xt = pallas_tcg.to_t(X)
    assert Xt.shape == (15, 256)
    np.testing.assert_array_equal(np.asarray(pallas_tcg.from_t(Xt, 150, 5)),
                                  np.asarray(X))
    v = jnp.asarray(rng.normal(size=(149,)), jnp.float32)
    vs = pallas_tcg.pack_s(v, 150)
    assert vs.shape == (1, 256)
    assert float(vs[0, 0]) == 0.0
    np.testing.assert_array_equal(np.asarray(pallas_tcg.unpack_s(vs, 150)),
                                  np.asarray(v))
