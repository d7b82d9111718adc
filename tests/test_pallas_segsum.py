"""Pallas sorted-segment-sum kernel (interpret mode on CPU; the real-TPU path
is exercised by the benchmarks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmtpu.ops.pallas_segsum import max_band, sorted_segment_sum


def _case(E, S, D, dtype, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.integers(0, S, E)).astype(np.int32)
    vals = rng.normal(size=(E, D)).astype(dtype)
    return jnp.asarray(vals), jnp.asarray(ids), ids


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_matches_segment_sum(dtype):
    vals, ids_j, ids = _case(2000, 300, 3, dtype)
    band = max_band(ids)
    out = sorted_segment_sum(vals, ids_j, 300, band, interpret=True)
    ref = jax.ops.segment_sum(vals, ids_j, 300)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5 if dtype == np.float32 else 1e-12,
                               atol=1e-5 if dtype == np.float32 else 1e-14)


def test_empty_segments_and_padding():
    # ids leave gaps; E not a multiple of the chunk
    vals, ids_j, ids = _case(1337, 977, 5, np.float64, seed=3)
    band = max_band(ids)
    out = sorted_segment_sum(vals, ids_j, 977, band, interpret=True)
    ref = jax.ops.segment_sum(vals, ids_j, 977)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)


def test_max_band():
    ids = np.array([0, 0, 1, 5, 5, 9], dtype=np.int32)
    assert max_band(ids, chunk=3) >= 5  # window [1,5,5] spans ids 1..5


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_blocked_matches_segment_sum_large(dtype):
    """VERDICT r1 item 7: segment-blocked kernel at num_segments >= 1e5 —
    the output never materializes beyond one (SEG_BLOCK, D) tile in VMEM."""
    from xmtpu.ops.pallas_segsum import (schedule_edges,
                                         sorted_segment_sum_blocked)

    E, S, D = 30000, 100_000, 3
    rng = np.random.default_rng(7)
    ids = np.sort(rng.integers(0, S, E)).astype(np.int32)
    vals = rng.normal(size=(E, D)).astype(dtype)
    ids_sched, gidx, pad, blk, first, band = schedule_edges(ids, S)
    vals_sched = jnp.asarray(vals[gidx] * ~pad[:, None])
    out = sorted_segment_sum_blocked(vals_sched, jnp.asarray(ids_sched), S,
                                     blk, first, band, interpret=True)
    ref = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(ids), S)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5 if dtype == np.float32 else 1e-12,
                               atol=1e-5 if dtype == np.float32 else 1e-14)


def test_blocked_dense_segments_and_block_straddle():
    """Every segment populated, chunks forced to straddle block boundaries
    (seg_block smaller than the per-block edge count)."""
    from xmtpu.ops.pallas_segsum import (schedule_edges,
                                         sorted_segment_sum_blocked)

    E, S, D = 4096, 512, 2
    rng = np.random.default_rng(11)
    ids = np.sort(rng.integers(0, S, E)).astype(np.int32)
    ids[:S] = np.arange(S)  # ensure coverage
    ids = np.sort(ids)
    vals = rng.normal(size=(E, D))
    ids_sched, gidx, pad, blk, first, band = schedule_edges(
        ids, S, chunk=128, seg_block=128)
    vals_sched = jnp.asarray(vals[gidx] * ~pad[:, None])
    out = sorted_segment_sum_blocked(vals_sched, jnp.asarray(ids_sched), S,
                                     blk, first, band, seg_block=128,
                                     chunk=128, interpret=True)
    ref = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(ids), S)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-12)


def test_blocked_empty_blocks_zeroed():
    """Blocks with no edges still get their zero-init visit."""
    from xmtpu.ops.pallas_segsum import (schedule_edges,
                                         sorted_segment_sum_blocked)

    S, D = 10_000, 2
    ids = np.asarray([5, 5, 9500], np.int32)  # huge empty middle
    vals = np.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    ids_sched, gidx, pad, blk, first, band = schedule_edges(ids, S)
    vals_sched = jnp.asarray(vals[gidx] * ~pad[:, None])
    out = np.asarray(sorted_segment_sum_blocked(
        vals_sched, jnp.asarray(ids_sched), S, blk, first, band,
        interpret=True))
    assert out[5].tolist() == [4.0, 6.0]
    assert out[9500].tolist() == [5.0, 6.0]
    assert np.count_nonzero(out) == 4
