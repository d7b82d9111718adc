import numpy as np
import pytest

from xmtpu.pipeline.rotation_averaging import filter_pairs, rotation_averaging
from xmtpu.pipeline.synthetic import random_rotation


def _make_problem(N=20, extra_edges=40, noise=0.01, n_outliers=0, seed=0):
    rng = np.random.default_rng(seed)
    R_gt = np.stack([random_rotation(rng) for _ in range(N)])
    R_gt[0] = np.eye(3)
    pairs = [(i, i + 1) for i in range(N - 1)]
    while len(pairs) < N - 1 + extra_edges:
        i, j = rng.integers(0, N, 2)
        if i != j:
            pairs.append((min(i, j), max(i, j)))
    pairs = np.asarray(pairs)
    R_rel = np.einsum("eab,ecb->eac", R_gt[pairs[:, 1]], R_gt[pairs[:, 0]])
    # perturb
    from xmtpu.pipeline.refine import _expm_so3
    import jax.numpy as jnp
    dw = rng.normal(size=(len(pairs), 3)) * noise
    R_rel = np.asarray(_expm_so3(jnp.asarray(dw))) @ R_rel
    outliers = rng.choice(len(pairs), size=n_outliers, replace=False)
    for e in outliers:
        R_rel[e] = random_rotation(rng)
    return R_gt, pairs, R_rel, outliers


def _angles(Ra, Rb):
    prod = np.einsum("nab,ncb->nac", Ra, Rb)
    cos = np.clip((np.trace(prod, axis1=1, axis2=2) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(cos))


def test_recovers_clean_rotations():
    R_gt, pairs, R_rel, _ = _make_problem(noise=0.0)
    res = rotation_averaging(pairs, R_rel, len(R_gt))
    assert _angles(res.rotations, R_gt).max() < 1e-4
    assert res.residual_angles.max() < 1e-6


def test_noise_averaged_down():
    R_gt, pairs, R_rel, _ = _make_problem(noise=0.02, seed=3)
    res = rotation_averaging(pairs, R_rel, len(R_gt))
    # averaged estimate beats single-chain accumulation
    assert _angles(res.rotations, R_gt).max() < 4.0


def test_outlier_pairs_flagged():
    R_gt, pairs, R_rel, outliers = _make_problem(noise=0.005, n_outliers=5,
                                                 seed=4)
    keep, res = filter_pairs(pairs, R_rel, len(R_gt), max_angle_deg=10.0)
    # all planted outliers dropped, vast majority of inliers kept
    assert not keep[outliers].any()
    inlier_mask = np.ones(len(pairs), bool)
    inlier_mask[outliers] = False
    assert keep[inlier_mask].mean() > 0.9


def test_l1_dense_regression_robust():
    """xmtpu.ops.l1 (math/l1_solver.h parity): exact recovery under 20%
    gross outliers where least squares fails."""
    import jax.numpy as jnp
    from xmtpu.ops.l1 import l1_solve_dense

    rng = np.random.default_rng(0)
    A = rng.normal(size=(200, 10))
    x_gt = rng.normal(size=10)
    b = A @ x_gt
    out = rng.choice(200, 40, replace=False)
    b[out] += rng.normal(scale=50, size=40)
    x_l1 = np.asarray(l1_solve_dense(A, b))
    x_l2 = np.linalg.lstsq(A, b, rcond=None)[0]
    assert np.abs(x_l1 - x_gt).max() < 1e-4
    assert np.abs(x_l2 - x_gt).max() > 0.1   # sanity: L2 is off


def test_heavy_outliers_l1_phase():
    """30% outlier contamination: the L1 + Geman-McClure pipeline
    (global_rotation_averaging.cc phases) still nails the inlier geometry."""
    R_gt, pairs, R_rel, outliers = _make_problem(
        noise=0.0, extra_edges=80, n_outliers=30, seed=7)
    res = rotation_averaging(pairs, R_rel, len(R_gt))
    assert _angles(res.rotations, R_gt).max() < 0.5
    inl = np.ones(len(pairs), bool)
    inl[outliers] = False
    assert np.degrees(res.residual_angles[inl]).max() < 0.5


def test_weight_types_and_mst_weights():
    from xmtpu.pipeline.rotation_averaging import RotationEstimatorOptions

    R_gt, pairs, R_rel, _ = _make_problem(noise=0.01, seed=9)
    w = np.random.default_rng(9).integers(10, 100, len(pairs))
    res = rotation_averaging(
        pairs, R_rel, len(R_gt), weights=w,
        opts=RotationEstimatorOptions(weight_type="HALF_NORM"))
    assert _angles(res.rotations, R_gt).max() < 2.0
