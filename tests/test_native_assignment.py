"""Native capacitated assignment solver (breaching_tpu/native).

Exactness is pinned against scipy.optimize.linear_sum_assignment on the
column-replicated matrix — the semantics the Decepticon clustering used before
(and still uses as the no-toolchain fallback)."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from breaching_tpu import native


def _replicated_lsa_cost(cost, caps):
    replicated = np.repeat(cost, caps, axis=1)
    rows, cols = linear_sum_assignment(replicated)
    return replicated[rows, cols].sum()


@pytest.mark.parametrize("n,k,seed", [(12, 3, 0), (40, 5, 1), (64, 8, 2),
                                      (100, 4, 3), (33, 7, 4)])
def test_matches_replicated_lsa_optimum(n, k, seed):
    rng = np.random.default_rng(seed)
    cost = rng.normal(size=(n, k))
    cap = int(np.ceil(n / k)) + rng.integers(0, 3)
    caps = np.full(k, cap, np.int64)
    labels = native.capacitated_assignment(cost, caps)
    assert labels.shape == (n,)
    counts = np.bincount(labels, minlength=k)
    assert (counts <= caps).all(), counts
    ours = cost[np.arange(n), labels].sum()
    ref = _replicated_lsa_cost(cost, caps)
    assert ours == pytest.approx(ref, abs=1e-8), (ours, ref)


def test_uneven_capacities():
    rng = np.random.default_rng(7)
    cost = rng.normal(size=(30, 4))
    caps = np.asarray([3, 10, 2, 15], np.int64)
    labels = native.capacitated_assignment(cost, caps)
    counts = np.bincount(labels, minlength=4)
    assert (counts <= caps).all()
    assert cost[np.arange(30), labels].sum() == pytest.approx(
        _replicated_lsa_cost(cost, caps), abs=1e-8)


def test_tight_capacities_force_balanced_partition():
    rng = np.random.default_rng(9)
    cost = rng.normal(size=(24, 3))
    labels = native.capacitated_assignment(cost, 8)  # scalar cap broadcast
    assert (np.bincount(labels, minlength=3) == 8).all()
    assert cost[np.arange(24), labels].sum() == pytest.approx(
        _replicated_lsa_cost(cost, np.full(3, 8)), abs=1e-8)


def test_infeasible_raises():
    with pytest.raises(ValueError):
        native.capacitated_assignment(np.zeros((10, 2)), 4)


def test_fallback_agrees_with_native():
    rng = np.random.default_rng(11)
    cost = rng.normal(size=(25, 5))
    caps = np.full(5, 6, np.int64)
    a = native.capacitated_assignment(cost, caps)
    b = native._fallback_capacitated_assignment(
        np.ascontiguousarray(cost), caps)
    assert cost[np.arange(25), a].sum() == pytest.approx(
        cost[np.arange(25), b].sum(), abs=1e-8)
