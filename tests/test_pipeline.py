"""End-to-end pipeline tests on CPU with tiny settings."""

import jax.numpy as jnp
import numpy as np

import breaching_tpu as breaching


def _tiny_cfg(extra=()):
    return breaching.get_config([
        "case=1_single_image_small",
        "attack=invertinggradients",
        "case.model=ConvNetSmall16",
        "case.data.shape=[3, 16, 16]",
        "attack.optim.max_iterations=30",
        "attack.optim.callback=10",
        "seed=17",
        "dryrun=False",
        *extra,
    ])


def _run(cfg):
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets, dryrun=cfg.dryrun)
    metrics = breaching.analysis.report(rec, true_data, payloads, server.model,
                                        cfg_case=cfg.case, setup=setup)
    return rec, true_data, metrics, stats


def test_end_to_end_single_image():
    cfg = _tiny_cfg()
    rec, true_data, metrics, stats = _run(cfg)
    assert rec["data"].shape == true_data["data"].shape == (1, 16, 16, 3)
    assert np.isfinite(metrics["mse"])
    assert metrics["label_acc"] == 1.0
    assert len(stats["Trial_0_Val"]) == 30
    # the optimization must actually reduce the matching loss
    assert stats["Trial_0_Val"][-1] < stats["Trial_0_Val"][0]


def test_end_to_end_restarts_and_label_recovery():
    cfg = _tiny_cfg(["attack.restarts.num_trials=3",
                     "case.user.provide_labels=False",
                     "case.user.num_data_points=2"])
    rec, true_data, metrics, stats = _run(cfg)
    assert rec["data"].shape == (2, 16, 16, 3)
    for t in range(3):
        assert len(stats[f"Trial_{t}_Val"]) == 30
    assert np.isfinite(metrics["psnr"]) or metrics["psnr"] == float("inf")


def test_end_to_end_fedavg():
    cfg = breaching.get_config([
        "case=4_fedavg_small_scale",
        "attack=invertinggradients",
        # case 4 now matches the reference (ResNet18/ImageNetAnimals); the
        # test keeps the fast CIFAR sandbox via explicit overrides
        "case/data=CIFAR10",
        "case.user.provide_labels=True",
        "case.model=ConvNetSmall16",
        "case.data.shape=[3, 16, 16]",
        "case.user.num_data_points=4",
        "case.user.num_local_updates=2",
        "case.user.num_data_per_local_update_step=2",
        "attack.optim.max_iterations=12",
        "attack.optim.callback=6",
        "seed=3",
    ])
    rec, true_data, metrics, stats = _run(cfg)
    assert rec["data"].shape == (4, 16, 16, 3)
    assert np.isfinite(metrics["mse"])


def test_dp_noise_and_clipping_defenses():
    cfg = _tiny_cfg([
        "case.user.local_diff_privacy.gradient_noise=0.01",
        "case.user.local_diff_privacy.per_example_clipping=1.0",
        "case.user.local_diff_privacy.distribution=gaussian",
        "attack.optim.max_iterations=4",
        "attack.optim.callback=2",
    ])
    rec, true_data, metrics, stats = _run(cfg)
    assert np.isfinite(metrics["mse"])


def test_dryrun_single_iteration():
    cfg = _tiny_cfg(["dryrun=True"])
    rec, true_data, metrics, stats = _run(cfg)
    assert len(stats["Trial_0_Val"]) == 1


def test_chunk_cost_analysis_probe():
    """bench.py's MFU accounting: the attacker exposes the XLA cost model of
    its steady-state compiled chunk (flops for chunk_length x trials)."""
    cfg = _tiny_cfg()
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    attacker.reconstruct(payloads, shared, server.secrets)
    cost = attacker.chunk_cost_analysis()
    assert cost is not None
    assert cost["chunk_length"] == 10
    assert cost["trials"] == int(cfg.attack.restarts.num_trials)
    assert cost["flops"] > 1e6  # a conv double-backward chunk is megaflops+
    assert cost["bytes_accessed"] > 0
