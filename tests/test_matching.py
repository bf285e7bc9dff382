"""Hamming matcher parity vs cv2.BFMatcher (exact — distances are integers)."""
import numpy as np
import cv2
import jax.numpy as jnp

from kbslam.frontend.brief import pack_bits
from kbslam.matching.hamming import hamming_distance_matrix, knn2_ratio_match


def _random_bits(rng, n):
    return rng.integers(0, 2, size=(n, 256), dtype=np.uint8)


def test_distance_matrix_matches_cv2():
    rng = np.random.default_rng(0)
    a, b = _random_bits(rng, 64), _random_bits(rng, 80)
    ours = np.asarray(hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b)))

    ap = np.asarray(pack_bits(jnp.asarray(a)))
    bp = np.asarray(pack_bits(jnp.asarray(b)))
    want = np.zeros((64, 80), np.int32)
    for i in range(64):
        for j in range(80):
            want[i, j] = cv2.norm(ap[i], bp[j], cv2.NORM_HAMMING)
    np.testing.assert_array_equal(ours, want)


def test_knn2_ratio_matches_cv2_bfmatcher():
    rng = np.random.default_rng(1)
    q, t = _random_bits(rng, 100), _random_bits(rng, 120)
    # plant near-duplicates so some pairs pass the 0.6 ratio test
    t[:40] = q[:40]
    flips = rng.integers(0, 256, size=(40, 10))
    for i in range(40):
        t[i, flips[i]] ^= 1

    res = knn2_ratio_match(
        jnp.asarray(q), jnp.ones(100, bool), jnp.asarray(t), jnp.ones(120, bool),
        ratio=0.6,
    )

    bf = cv2.BFMatcher_create(cv2.NORM_HAMMING)
    qp = np.asarray(pack_bits(jnp.asarray(q)))
    tp = np.asarray(pack_bits(jnp.asarray(t)))
    knn = bf.knnMatch(qp, tp, k=2)

    cv_matches = {}
    for pair in knn:
        if len(pair) == 2 and pair[0].distance < 0.6 * pair[1].distance:
            cv_matches[pair[0].queryIdx] = (pair[0].trainIdx, pair[0].distance)

    ours_idx = np.asarray(res.best_idx)
    ours_match = np.asarray(res.is_match)
    ours_dist = np.asarray(res.best_dist)

    got = {i: (int(ours_idx[i]), int(ours_dist[i]))
           for i in range(100) if ours_match[i]}
    # distances agree exactly; tie-breaks on equal distance may differ
    assert set(got) == set(cv_matches)
    for i in got:
        assert got[i][1] == int(cv_matches[i][1])


def test_invalid_columns_never_matched():
    rng = np.random.default_rng(2)
    q, t = _random_bits(rng, 8), _random_bits(rng, 8)
    t[4] = q[0]  # perfect match but we will invalidate it
    tv = np.ones(8, bool)
    tv[4] = False
    res = knn2_ratio_match(jnp.asarray(q), jnp.ones(8, bool),
                           jnp.asarray(t), jnp.asarray(tv), 0.6)
    assert int(res.best_idx[0]) != 4 or not bool(res.is_match[0])


def test_invalid_query_rows_not_matches():
    rng = np.random.default_rng(3)
    q = _random_bits(rng, 4)
    t = np.concatenate([q, _random_bits(rng, 4)])
    qv = np.array([True, False, True, False])
    res = knn2_ratio_match(jnp.asarray(q), jnp.asarray(qv),
                           jnp.asarray(t), jnp.ones(8, bool), 0.6)
    m = np.asarray(res.is_match)
    assert not m[1] and not m[3]
