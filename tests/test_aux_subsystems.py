"""Aux subsystem tests: checkpoint/resume, imprint guarantee, cached dataset."""

import os

import numpy as np

import breaching_tpu as breaching


def test_attack_checkpoint_resume(tmp_path):
    """A checkpointed attack resumes bit-identically from the saved chunk."""
    ckpt = str(tmp_path / "attack_state.npz")
    base = [
        "case=1_single_image_small", "attack=invertinggradients",
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
        "attack.optim.callback=10", "seed=123",
        f"attack.impl.checkpoint_path={ckpt}", "attack.impl.checkpoint_every=1",
    ]

    def run(max_iters):
        cfg = breaching.get_config(base + [f"attack.optim.max_iterations={max_iters}"])
        setup = breaching.utils.system_startup(cfg=cfg)
        user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
        attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
        shared, payloads, true_data = server.run_protocol(user)
        rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
        return rec, stats

    # Run 20 iterations straight through:
    rec_full, stats_full = run(20)
    assert os.path.exists(ckpt)
    # Fresh run with the checkpoint present resumes at iteration 20 instantly:
    rec_resumed, stats_resumed = run(20)
    assert sum(stats_resumed["chunk_iters"]) == 0 or sum(stats_resumed["chunk_iters"]) < 20


def test_imprint_guarantee_formulas():
    from breaching_tpu.analysis.imprint_guarantee import (
        expected_number_of_breached_bins,
        expected_number_of_recovered_points,
        probability_of_recovery,
    )

    assert probability_of_recovery(1, 100) == 1.0
    assert 0 < probability_of_recovery(50, 100) < 1
    assert np.isclose(expected_number_of_recovered_points(1, 64), 1.0)
    # with many bins nearly everything is recovered
    assert expected_number_of_recovered_points(8, 10_000) > 7.99
    assert expected_number_of_breached_bins(8, 10_000) > 7.99


def test_cached_dataset_roundtrip():
    from breaching_tpu.cases.data.cached_dataset import CachedDataset
    from breaching_tpu.cases.data.datasets_vision import VisionDataset

    cfg = breaching.get_case_config("1_single_image_small")
    cfg.data.shape = [3, 8, 8]
    ds = VisionDataset(cfg.data, split="validation")
    small = ds.subset(np.arange(5))
    cached = CachedDataset(small)
    assert len(cached) == 5
    np.testing.assert_allclose(cached[2]["inputs"], small[2]["inputs"])
    assert cached[2]["labels"] == small[2]["labels"]


def test_gabor_cw_ssim_golden_values():
    """The CW-SSIM *index formula* matches the reference but the complex
    coefficients come from a Gabor bank, not pytorch_wavelets' DTCWT — the
    report key is `gabor_cw_ssim` and these golden values pin THIS metric's
    scale (identity=1, graceful falloff, near-zero for unrelated images)."""
    import jax
    import jax.numpy as jnp

    from breaching_tpu.analysis.metrics import cw_ssim

    rng = np.random.RandomState(0)
    base = jnp.asarray(jax.nn.sigmoid(2 * jax.image.resize(
        jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32), (2, 32, 32, 3), "bilinear")))
    noisy = base + 0.1 * jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    shifted = jnp.roll(base, (1, 1), axis=(1, 2))
    random = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)

    np.testing.assert_allclose(float(cw_ssim(base, base)), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(cw_ssim(noisy, base)), 0.67789, atol=2e-3)
    np.testing.assert_allclose(float(cw_ssim(shifted, base)), 0.89044, atol=2e-3)
    np.testing.assert_allclose(float(cw_ssim(random, base)), 0.06041, atol=2e-3)
    # shift-robustness ordering: small shift >> independent noise image
    assert float(cw_ssim(shifted, base)) > float(cw_ssim(random, base)) + 0.5
