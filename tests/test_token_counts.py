"""Calibrated power-law repeat-count estimation (text_utils.estimate_repeat_counts).

The estimator recovers per-token repeat counts from squared embedding-gradient
row norms under the measured model E(count) ~ E0 * count^p, bisecting the
architecture-dependent exponent p so counts sum to the known token total
(reference has no counterpart: base_attack.py:559-572 greedily subtracts a
linear norm estimate and under-counts repeats)."""

import numpy as np
import pytest

from breaching_tpu.attacks.auxiliaries.text_utils import estimate_repeat_counts


def _energies(counts, p, rng, jitter=0.01):
    base = rng.uniform(0.99, 1.01)
    return base * counts.astype(np.float64) ** p * (1 + jitter * rng.standard_normal(len(counts)))


@pytest.mark.parametrize("p", [0.8, 1.0, 1.7, 2.0])
def test_exact_recovery_across_exponents(p):
    rng = np.random.default_rng(3)
    counts = np.concatenate([np.ones(120, np.int64),
                             rng.integers(2, 9, size=30)])
    rng.shuffle(counts)
    est = estimate_repeat_counts(_energies(counts, p, rng), int(counts.sum()))
    assert est.sum() == counts.sum()
    # with ~1% energy jitter (the measured gpt2 spread) the calibrated
    # exponent recovers nearly every count exactly
    assert (est == counts).mean() > 0.95, (est, counts)


def test_all_singletons_stays_flat():
    rng = np.random.default_rng(5)
    counts = np.ones(64, np.int64)
    est = estimate_repeat_counts(_energies(counts, 1.7, rng), 64)
    assert (est == 1).all()


def test_sum_never_exceeds_total():
    rng = np.random.default_rng(7)
    counts = rng.integers(1, 5, size=40)
    for total in [int(counts.sum()), 45, 200]:
        est = estimate_repeat_counts(_energies(counts, 1.5, rng), total)
        assert est.min() >= 1
        assert est.sum() <= total


def test_huge_dynamic_range_does_not_overflow():
    # BERT-style sparsity branch: noise rows 1e-35 of the singleton level
    sq = np.concatenate([np.full(300, 1.0), np.full(10, 25.0), np.full(50, 1e-30)])
    est = estimate_repeat_counts(sq, 512)
    assert est.sum() <= 512 and np.isfinite(est).all()
    # the repeated rows absorb the extra slots, not the noise rows
    assert est[300:310].min() > est[310:].max()
