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
