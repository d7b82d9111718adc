"""Solver tests on synthetic problems with known structure."""

import jax.numpy as jnp
import numpy as np
import pytest

from xmtpu.assembly.creatematrix import create_matrix_arrays
from xmtpu.ops import manifold as mf
from xmtpu.pipeline.synthetic import make_scene, rotation_errors
from xmtpu.solver import trust_region as tr


@pytest.fixture(scope="module")
def scene_and_C():
    scene = make_scene(n_cameras=8, n_points=40, obs_per_camera=20, noise=0.0,
                       seed=7)
    C, Abar = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    return scene, C, Abar


def test_rank3_solve_reaches_zero_cost(scene_and_C):
    scene, C, _ = scene_and_C
    n = C.shape[0] // 3
    res = tr.trust_region_solve(jnp.asarray(C), mf.identity_frames(n, 3),
                                jnp.ones((n,)), lam=0.0, gradtol=1e-10)
    # noiseless problem: global optimum has zero cost
    assert float(res.primal) < 1e-8
    assert float(res.gradnorm) < 1e-4


def test_rank3_recovers_rotations(scene_and_C):
    scene, C, _ = scene_and_C
    n = C.shape[0] // 3
    res = tr.trust_region_solve(jnp.asarray(C), mf.identity_frames(n, 3),
                                jnp.ones((n,)), lam=0.0, gradtol=1e-10)
    # R blocks are (n, 3, o=3) with orthonormal rows; sR block ~ s_i R_i^cw?
    # compare relative rotations against GT up to gauge + global O(3)
    R_blocks = np.asarray(res.R)
    errs = rotation_errors(R_blocks, np.stack([r.T for r in scene.R_gt]))
    # allow the global sign/reflection ambiguity of the relaxation: errors are
    # either all ~0 or all ~pi around a common axis; relative rotations kill
    # the global part so they must vanish
    assert np.max(errs) < 1e-3


def test_scales_recovered(scene_and_C):
    scene, C, _ = scene_and_C
    n = C.shape[0] // 3
    res = tr.trust_region_solve(jnp.asarray(C), mf.identity_frames(n, 3),
                                jnp.ones((n,)), lam=0.0, gradtol=1e-10)
    s = np.asarray(res.s_ex)
    # anchored problem: s_0 = 1 pinned; recovered scales match GT ratios
    np.testing.assert_allclose(s, scene.s_gt / scene.s_gt[0], rtol=1e-4)


def test_monotone_descent_property(scene_and_C):
    """The returned objective is below the starting objective."""
    scene, C, _ = scene_and_C
    n = C.shape[0] // 3
    R0 = mf.identity_frames(n, 3)
    s0 = jnp.ones((n,))
    f0 = float(mf.objective(lambda Y: jnp.asarray(C) @ Y, R0, s0, 0.0))
    res = tr.trust_region_solve(jnp.asarray(C), R0, s0, lam=0.0, gradtol=1e-10)
    assert float(res.primal) <= f0


def test_result_on_manifold(scene_and_C):
    scene, C, _ = scene_and_C
    n = C.shape[0] // 3
    res = tr.trust_region_solve(jnp.asarray(C), mf.identity_frames(n, 3),
                                jnp.ones((n,)), lam=0.0, gradtol=1e-8)
    G = jnp.einsum("nko,nlo->nkl", res.R, res.R)
    np.testing.assert_allclose(np.asarray(G),
                               np.broadcast_to(np.eye(3), (n, 3, 3)), atol=1e-10)
    assert float(res.s_ex[0]) == 1.0


def test_lambda_regularization_pulls_scales():
    """With huge lam the scales are pinned near 1 even when GT scales vary."""
    scene = make_scene(n_cameras=6, n_points=30, obs_per_camera=15,
                       scale_spread=0.5, seed=11)
    C, _ = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    n = C.shape[0] // 3
    res = tr.trust_region_solve(jnp.asarray(C) * 0 + jnp.asarray(C),
                                mf.identity_frames(n, 3), jnp.ones((n,)),
                                lam=1e6, gradtol=1e-8)
    s = np.asarray(res.s_ex[1:])
    assert np.abs(s - 1).max() < 0.05


def test_f32_solver_reaches_optimum(scene_and_C):
    """The hardware-precision (f32) path lands within f32 tolerance of the
    f64 optimum -- the TPU fast path (f64 matmul is software-emulated)."""
    scene, C, _ = scene_and_C
    n = C.shape[0] // 3
    cfg32 = tr.TRConfig.for_dtype(jnp.float32)
    res64 = tr.trust_region_solve(jnp.asarray(C), mf.identity_frames(n, 3),
                                  jnp.ones((n,)), lam=0.0, gradtol=1e-10)
    res32 = tr.trust_region_solve(
        jnp.asarray(C, jnp.float32),
        mf.identity_frames(n, 3, dtype=jnp.float32),
        jnp.ones((n,), jnp.float32), lam=0.0, gradtol=1e-5, cfg=cfg32,
        dtype=jnp.float32)
    assert res32.R.dtype == jnp.float32
    # noiseless global optimum is 0; f32 should reach ~1e-6-level cost
    assert float(res32.primal) < 1e-4
    # frames still orthonormal to f32 precision
    G = jnp.einsum("nko,nlo->nkl", res32.R, res32.R)
    np.testing.assert_allclose(np.asarray(G),
                               np.broadcast_to(np.eye(3), (n, 3, 3)),
                               atol=1e-5)


def test_mixed_precision_matches_f64(scene_and_C):
    scene, C, _ = scene_and_C
    n = C.shape[0] // 3
    res64 = tr.trust_region_solve(jnp.asarray(C), mf.identity_frames(n, 3),
                                  jnp.ones((n,)), lam=0.0, gradtol=1e-10)
    resmx = tr.trust_region_solve_mixed(jnp.asarray(C),
                                        mf.identity_frames(n, 3),
                                        jnp.ones((n,)), lam=0.0, gradtol=1e-10)
    assert resmx.R.dtype == jnp.float64
    np.testing.assert_allclose(float(resmx.primal), float(res64.primal),
                               rtol=1e-6, atol=1e-9)
    assert float(resmx.gradnorm) < 1e-4


def test_inner_f32_same_optimum():
    """TRConfig.inner_f32 (f32 tCG Hessian applies inside an f64 outer
    iteration) reaches the same optimum at loose tolerances."""
    import jax.numpy as jnp

    from xmtpu.ops import manifold as mf
    from xmtpu.ops.schurq import SchurQ
    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.solver.trust_region import TRConfig, trust_region_solve

    scene = make_scene(n_cameras=40, n_points=200, obs_per_camera=40,
                       noise=1e-3, seed=11)
    Q = SchurQ.build(scene.weights, scene.edges, scene.landmarks)
    R0 = mf.identity_frames(Q.n_cameras, 3)
    s0 = jnp.ones((Q.n_cameras,))
    res64 = trust_region_solve(Q, R0, s0, 0.0, 1e-4,
                               cfg=TRConfig(inner_f32=False))
    res32 = trust_region_solve(Q, R0, s0, 0.0, 1e-4,
                               cfg=TRConfig(inner_f32=True))
    assert abs(float(res32.primal) - float(res64.primal)) \
        <= 1e-6 * max(1.0, abs(float(res64.primal)))


def test_stop_on_collapse_terminates_at_f32_floor(simple1_Q):
    """The mixed ladder's f32 phase stops at the FIRST trust-radius collapse
    (the f32 rho-noise floor) instead of grinding rejection churn down to
    delta_min: measured on SIMPLE1, ~3800 wasted tCG iterations between the
    first collapse and delta_min without gradnorm moving."""
    import jax.numpy as jnp

    from xmtpu.ops.qop import cast_qop

    Q32 = cast_qop(jnp.asarray(simple1_Q), jnp.float32)
    n = simple1_Q.shape[0] // 3
    R0 = mf.identity_frames(n, 3, dtype=jnp.float32)
    s0 = jnp.ones((n,), jnp.float32)
    cfg_ref = tr.TRConfig.for_dtype(jnp.float32, max_inner=100)
    cfg_stop = tr.TRConfig.for_dtype(jnp.float32, max_inner=100,
                                     stop_on_collapse=True)
    res_ref = tr.trust_region_solve(Q32, R0, s0, 0.0, 1e-5, cfg=cfg_ref,
                                    dtype=jnp.float32)
    res_stop = tr.trust_region_solve(Q32, R0, s0, 0.0, 1e-5, cfg=cfg_stop,
                                     dtype=jnp.float32)
    assert int(res_stop.done_reason) == tr.DONE_DELTA
    assert int(res_stop.total_inner) < int(res_ref.total_inner)
    # the early stop gives up no objective quality beyond f32 resolution
    assert float(res_stop.primal) <= float(res_ref.primal) * (1 + 1e-3) + 1e-3


def test_mid_stage_checkpoint_resume(tmp_path):
    """VERDICT r1 item 8: kill a solve inside a rank (chunk boundary) and
    resume to the identical certified optimum."""
    import jax.numpy as jnp

    from xmtpu.assembly.creatematrix import create_matrix_arrays
    from xmtpu.ops import manifold as mf
    from xmtpu.pipeline.synthetic import make_scene
    from xmtpu.solver import trust_region as tr
    from xmtpu.solver.checkpoint import TRCheckpoint, load_checkpoint
    from xmtpu.solver.staircase import solve_arrays

    scene = make_scene(n_cameras=10, n_points=50, obs_per_camera=25,
                       noise=1e-3, seed=13)
    C, _ = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    C = jnp.asarray(C)

    ref = solve_arrays(C, max_rank=4, tol=1e-8, lam=0.0, verbose=False)
    assert ref.certified

    # simulated kill: stop the rank-3 f64 solve after 6 outer iterations,
    # checkpointing every 3 (the chunk boundary)
    ck_path = str(tmp_path / "mid.npz")
    n = C.shape[0] // 3
    R0 = mf.identity_frames(n, 3)
    s0 = jnp.ones((n,), jnp.float64)
    partial = tr.trust_region_solve(
        C, R0, s0, lam=0.0, gradtol=1e-8,
        cfg=tr.TRConfig(max_outer=6, chunk=3),
        checkpoint_path=ck_path,
        ckpt_meta=dict(rank=3, gradtol=1e-8, lam=0.0))
    assert int(partial.done_reason) == tr.DONE_MAX_OUTER

    ck = load_checkpoint(ck_path)
    assert isinstance(ck, TRCheckpoint)
    assert ck.rank == 3 and ck.k_done == 6

    res = solve_arrays(C, max_rank=4, tol=1e-8, lam=0.0, verbose=False,
                       resume_from=ck_path)
    assert res.certified == ref.certified == True  # noqa: E712
    np.testing.assert_allclose(res.primal, ref.primal, rtol=1e-10,
                               atol=1e-12)
    np.testing.assert_allclose(res.s_ex, ref.s_ex, rtol=1e-7)


def test_auto_chunk_policy():
    from xmtpu.solver.trust_region import auto_chunk

    assert auto_chunk(149) == 100
    assert auto_chunk(2000) == 100
    assert auto_chunk(3000) == 25
    assert auto_chunk(6144) == 5
    assert auto_chunk(6144, default=3) == 3


def test_history_buffer_records_reference_table(capsys):
    """TRConfig.history carries a per-outer ring buffer with zero host syncs
    (VERDICT r3 item 8; trustregion.h:487-526 table semantics): rows carry
    the outer index, tCG count, accepted loss, gradnorm at iteration start
    and the accept/reject flag; verbose=2 prints the table per chunk."""
    scene = make_scene(n_cameras=8, n_points=40, obs_per_camera=20,
                       noise=1e-2, seed=3)
    C, _ = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    n = C.shape[0] // 3
    R0 = mf.identity_frames(n, 3)
    s0 = jnp.ones((n,), jnp.float64)
    cfg = tr.TRConfig(history=32, chunk=8)
    res = tr.trust_region_solve(C, R0, s0, lam=0.0, gradtol=1e-6, cfg=cfg,
                                verbose=2)
    out = capsys.readouterr().out
    assert res.hist is not None
    hist = np.asarray(res.hist)
    k_end = int(res.outer_iters)
    # every outer iteration in the live window has its row, in order
    for k in range(max(0, k_end - 32), k_end):
        row = hist[k % 32]
        assert int(row[0]) == k
        assert row[1] >= 1                      # tCG iterations
        assert np.isfinite(row[2]) and np.isfinite(row[3])
        assert int(row[6]) in (-1, 0, 1)        # BAD/REJ/TR+
        assert int(row[7]) in (1, 2, 3, 5, 6)   # tCG end reason
    # losses over ACCEPTED rows are non-increasing
    acc_losses = [hist[k % 32][2] for k in range(max(0, k_end - 32), k_end)
                  if int(hist[k % 32][6]) == 1]
    assert all(b <= a + 1e-12 for a, b in zip(acc_losses, acc_losses[1:]))
    # verbose=2 printed the reference-style table
    assert "[tr] k=" in out and "TR+" in out
    # identical solve without history matches bitwise (the buffer is
    # observability only, never part of the math)
    res0 = tr.trust_region_solve(C, R0, s0, lam=0.0, gradtol=1e-6,
                                 cfg=tr.TRConfig(chunk=8))
    assert res0.hist is None
    np.testing.assert_array_equal(np.asarray(res.R), np.asarray(res0.R))


def test_collapse_accept_coincidence_not_premature_stop():
    """ADVICE r3 (trust_region.py:469): a collapse iteration whose own step
    is accepted must neither fire the zero-accept early stop nor zero the
    accept counter for the new cycle."""
    # unit-level check of the gate algebra through a crafted carry:
    # the early stop requires collapse & ~keep_new & prior-collapse &
    # zero accepts.  Exercise _outer_step indirectly via the public config
    # by asserting a solve with stop_on_collapse that ACCEPTS on its
    # collapse iterations still reaches the same iterate as the ungated
    # solve (the gate may only ever stop pure-rejection churn).
    scene = make_scene(n_cameras=8, n_points=40, obs_per_camera=20,
                       noise=5e-2, seed=11)
    C, _ = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    n = C.shape[0] // 3
    R0 = mf.identity_frames(n, 3)
    s0 = jnp.ones((n,), jnp.float32)
    C32 = jnp.asarray(C, jnp.float32)
    cfg = tr.TRConfig.for_dtype(jnp.float32, stop_on_collapse=True,
                                max_inner=100)
    res = tr.trust_region_solve(C32, jnp.asarray(R0, jnp.float32), s0,
                                lam=0.0, gradtol=1e-5, cfg=cfg,
                                dtype=jnp.float32)
    # the stage must not end while accepted steps were still being produced:
    # rerunning WITHOUT the gate from the stop point must not find
    # meaningfully lower loss within a couple of outers (i.e. the stop fired
    # at the noise floor, not mid-progress)
    cfg2 = tr.TRConfig.for_dtype(jnp.float32, max_outer=3, max_inner=100)
    res2 = tr.trust_region_solve(C32, res.R, res.s_ex, lam=0.0,
                                 gradtol=1e-5, cfg=cfg2, dtype=jnp.float32)
    assert float(res2.primal) >= float(res.primal) - 1e-3 * abs(
        float(res.primal)) - 1e-5


def test_delta0_warm_start_radius():
    """``delta0`` sets the initial trust radius (traced — no recompile per
    value) and a warm-started polish reaches the same certified optimum;
    ``TRResult.delta`` exposes the final radius for chaining stages."""
    import jax.numpy as jnp

    from xmtpu.ops import manifold as mf
    from xmtpu.solver import trust_region as tr

    scene = make_scene(n_cameras=10, n_points=50, obs_per_camera=25,
                       noise=1e-4, seed=5)
    C, _ = create_matrix_arrays(scene.weights, scene.edges, scene.landmarks)
    C = jnp.asarray(C)
    n = C.shape[0] // 3
    R0 = mf.identity_frames(n, 3)
    s0 = jnp.ones((n,), jnp.float64)

    res1 = tr.trust_region_solve(C, R0, s0, 0.0, 1e-2)
    assert res1.delta is not None and float(res1.delta) > 0

    # continue to a tighter tol from the iterate, radius warm-started
    res2 = tr.trust_region_solve(C, res1.R, res1.s_ex, 0.0, 1e-8,
                                 delta0=res1.delta)
    ref = tr.trust_region_solve(C, res1.R, res1.s_ex, 0.0, 1e-8)
    # both end at a converged stop (gradtol, or the tCG residual machine
    # floor that the reference also treats as terminal)
    assert int(res2.done_reason) in (tr.DONE_GRADTOL, tr.DONE_RDOTR_SMALL)
    np.testing.assert_allclose(float(res2.primal), float(ref.primal),
                               rtol=1e-9, atol=1e-12)
    # tiny delta0 still converges (radius regrows on accepted steps)
    res3 = tr.trust_region_solve(C, res1.R, res1.s_ex, 0.0, 1e-8,
                                 delta0=1e-6)
    np.testing.assert_allclose(float(res3.primal), float(ref.primal),
                               rtol=1e-9, atol=1e-12)
