"""Native runtime kernels: build, correctness vs scipy, track establishment."""

import numpy as np

from xmtpu.runtime import (
    connected_component_labels,
    establish_tracks,
    have_native,
)


def test_native_builds():
    assert have_native(), "g++ toolchain present in this image; build must work"


def test_components_match_scipy():
    rng = np.random.default_rng(0)
    n = 500
    u = rng.integers(0, n, 800)
    v = rng.integers(0, n, 800)
    n_comp, labels = connected_component_labels(u, v, n)

    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components
    g = coo_matrix((np.ones(len(u)), (u, v)), shape=(n, n))
    n_ref, ref = connected_components(g + g.T, directed=False)
    assert n_comp == n_ref
    # labels equal up to renaming: same partition
    m = {}
    for a, b in zip(labels, ref):
        assert m.setdefault(a, b) == b


def test_establish_tracks_sizes_ordered():
    # two tracks: {0,1,2,3} and {4,5}; singleton {6}
    a = np.array([0, 1, 2, 4])
    b = np.array([1, 2, 3, 5])
    n_tracks, track_of = establish_tracks(a, b, 7)
    assert n_tracks == 3
    sizes = np.bincount(track_of)
    assert sizes.tolist() == sorted(sizes.tolist(), reverse=True)
    assert len(set(track_of[[0, 1, 2, 3]])) == 1
    assert len(set(track_of[[4, 5]])) == 1
    assert track_of[0] == 0  # biggest track first


def test_tracks_from_feature_matches():
    from xmtpu.pipeline.frontend import tracks_from_feature_matches

    # image1.feat1 <-> image2.feat7 ; image2.feat7 <-> image3.feat2
    keys, tracks = tracks_from_feature_matches(
        [1, 2], [1, 7], [2, 3], [7, 2])
    assert len(keys) == 3
    assert len(set(tracks)) == 1  # one chained track
