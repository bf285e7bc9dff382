"""Pallas kernel correctness (interpret mode on CPU; the same kernels
compile natively on TPU — see kbslam/ops/pallas_hamming.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import kbslam.ops.pallas_hamming as ph
from kbslam.matching.hamming import hamming_distance_matrix


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ph.pl, "pallas_call", interp)


def test_hamming_top2_matches_reference():
    rng = np.random.default_rng(0)
    q = rng.integers(0, 2, (512, 256), dtype=np.uint8)
    t = rng.integers(0, 2, (1024, 256), dtype=np.uint8)
    tv = rng.random(1024) < 0.9

    best, idx, second = ph.hamming_top2_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(tv),
        tile_q=256, tile_t=512)

    d = np.asarray(hamming_distance_matrix(jnp.asarray(q), jnp.asarray(t))).copy()
    d[:, ~tv] = 1 << 20
    want_best = np.minimum(d.min(1), int(1e9))
    wi = d.argmin(1)
    ds = d.copy()
    ds[np.arange(512), wi] = 1 << 20
    want_second = np.minimum(ds.min(1), int(1e9))

    np.testing.assert_array_equal(np.asarray(best), want_best)
    np.testing.assert_array_equal(np.asarray(second), want_second)
    # index parity up to equal-distance ties
    got_i = np.asarray(idx)
    agree = got_i == wi
    ties = d[np.arange(512), got_i] == want_best
    assert (agree | ties).all()


def test_all_invalid_train():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 2, (256, 256), dtype=np.uint8)
    t = rng.integers(0, 2, (512, 256), dtype=np.uint8)
    tv = np.zeros(512, bool)
    best, idx, second = ph.hamming_top2_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(tv),
        tile_q=256, tile_t=512)
    assert (np.asarray(best) == int(1e9)).all()
