"""Golden tests against the reference fixtures SIMPLE1 / SIMPLE2.

The reference repo commits no solver outputs, so the golden values below were
established by this framework (round 1) and double-checked by the dual
certificate: SIMPLE1 certifies globally optimal at rank 3 with primal
~2.5509915678 and gap < 1e-6 — any regression that changes the optimum breaks
these.
"""

import numpy as np
import pytest

SIMPLE1_PRIMAL = 2.5509915678459834


@pytest.mark.slow
def test_simple1_certified_rank3(simple1_Q):
    from xmtpu.solver.staircase import solve_arrays

    res = solve_arrays(simple1_Q, max_rank=3, tol=1e-16, lam=0.0,
                       max_time=1000, verbose=False)
    assert res.certified
    assert res.status == 1
    np.testing.assert_allclose(res.primal, SIMPLE1_PRIMAL, rtol=1e-6)
    assert res.gap < 1e-6
    assert res.lam_min > -1e-6


@pytest.mark.slow
def test_simple2_end_to_end(simple2_data):
    """Example-2 parity flow (2_test_creatematrix.py): dedupe, clean, anchor,
    assemble, staircase solve, recover.  Asserts the solve certifies and the
    recovered structure is internally consistent."""
    import numpy as np

    from xmtpu.assembly.creatematrix import create_matrix_arrays
    from xmtpu.pipeline.graph import checklandmarks
    from xmtpu.pipeline.recover import recover_XM
    from xmtpu.solver.staircase import solve_arrays

    data = simple2_data
    edges = data[:, :2].astype(int)
    _, uniq = np.unique(edges, axis=0, return_index=True)
    edges = edges[uniq]
    data = data[uniq]
    weights = data[:, 5]
    landmarks = data[:, 2:5]
    rgbs = np.zeros((len(edges), 3))
    N = int(edges[:, 0].max())
    M = int(edges[:, 1].max())

    edges, landmarks, weights, rgbs, idx = checklandmarks(
        edges, landmarks, weights, rgbs, N, M, frame_min_obs=0)

    C, Abar = create_matrix_arrays(weights, edges, landmarks)
    res = solve_arrays(C, max_rank=5, tol=1e-1, lam=0.0, max_time=1000,
                       verbose=False)
    assert res.status in (1, 2)
    R_real, s_real, p_est, t_est = recover_XM(C, res.R, res.s_ex, Abar, 0.0,
                                              verbose=False)
    Nn = s_real.shape[0]
    # rotations orthonormal with unit determinant
    Rb = R_real.reshape(3, Nn, 3).transpose(1, 0, 2)
    G = np.einsum("nab,ncb->nac", Rb, Rb)
    np.testing.assert_allclose(G, np.broadcast_to(np.eye(3), (Nn, 3, 3)),
                               atol=1e-8)
    # anchor camera: gauge-fixed to identity
    np.testing.assert_allclose(Rb[0], np.eye(3), atol=1e-8)
    assert np.all(s_real > 0)
    # translations/landmarks finite, anchor translation 0
    np.testing.assert_allclose(t_est[:, 0], 0.0, atol=1e-10)
    assert np.isfinite(p_est).all()


@pytest.mark.slow
def test_simple1_mixed_certified(simple1_Q):
    """The mixed-precision ladder (f32 bulk + f64 polish, the TPU fast path)
    certifies SIMPLE1 at the same global optimum as pure f64 -- the
    certificate always runs in f64, so acceptance is precision-independent."""
    from xmtpu.solver.staircase import solve_arrays

    res = solve_arrays(simple1_Q, max_rank=3, tol=1e-16, lam=0.0,
                       max_time=1000, verbose=False, precision="mixed")
    assert res.certified
    np.testing.assert_allclose(res.primal, SIMPLE1_PRIMAL, rtol=1e-6)
    assert res.gap < 1e-5


@pytest.mark.slow
def test_fused_ladder_f32_overrun_fallback(simple1_Q):
    """When the f32 phase outruns the fused program's chunk budget, the
    staircase falls back to chunked f32 continuation + fresh f64 polish
    (never polishing a truncated f32 warm start) and still reaches the
    certified optimum."""
    import jax.numpy as jnp

    from xmtpu.ops.qop import as_qop, cast_qop
    from xmtpu.solver import staircase as sc

    Cq = as_qop(jnp.asarray(simple1_Q, jnp.float64))
    C32q = cast_qop(Cq, jnp.float32)
    n = simple1_Q.shape[0] // 3
    R0 = np.broadcast_to(np.eye(3), (n, 3, 3))
    s0 = np.ones((n,))
    # chunk=2: the f32 phase cannot stall within 2 outers -> overrun path
    res, scal, cert = sc._stage_fused(
        Cq, C32q, R0, s0, 0.0, 1e-16, 1000.0, False, "mixed", 1e-4, None,
        chunk=2)
    primal_v, reason_v, outer_v, inner_v = scal
    assert cert is None  # caller certifies separately on this path
    np.testing.assert_allclose(primal_v, SIMPLE1_PRIMAL, rtol=1e-6)
