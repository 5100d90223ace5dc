"""APRIL, multiscale, fishing, and label-strategy coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import breaching_tpu as breaching


def _run(overrides):
    cfg = breaching.get_config(overrides)
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets, dryrun=cfg.dryrun)
    metrics = breaching.analysis.report(rec, true_data, payloads, server.model,
                                        cfg_case=cfg.case, setup=setup)
    return rec, true_data, metrics


def test_april_vit_inversion():
    rec, true_data, metrics = _run([
        "case=2_single_imagenet", "attack=april_analytic",
        "case/data=ImageNet",  # keeps this test's synthetic images stable across the
        # case-2 ImageNetAnimals restore (seeds hash the dataset name)
        "case.model=vit_small_april", "case.data.shape=[3, 32, 32]",
        "case.data.classes=20", "case.user.num_data_points=1",
        "case.user.provide_labels=True", "seed=21",
    ])
    assert metrics["psnr"] > 14, metrics


def test_fishing_class_collision_binary_attack():
    rec, true_data, metrics = _run([
        "case=1_single_image_small", "attack=clsattack",
        "case/server=malicious-fishing", "case.model=ConvNetSmall16",
        "case.data.shape=[3, 16, 16]", "case.data.partition=unique-class",
        "case.user.user_idx=3", "case.user.num_data_points=3",
        "case.user.provide_labels=True",
        "attack.optim.max_iterations=20", "attack.optim.callback=10", "seed=13",
    ])
    # one image isolated out of three same-class images; rest zero-padded
    assert rec["data"].shape[0] == 3
    assert np.isfinite(metrics["mse"])


@pytest.mark.parametrize("strategy", ["iDLG", "analytic", "yin", "wainakh-simple",
                                      "bias-corrected", "random"])
def test_label_recovery_strategies(strategy):
    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
        "case.user.provide_labels=False", "case.user.num_data_points=1",
        f"attack.label_strategy={strategy}",
        "attack.optim.max_iterations=2", "attack.optim.callback=1", "seed=99",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    assert rec["labels"].shape == (1,)
    if strategy in ("iDLG", "analytic", "yin", "bias-corrected", "wainakh-simple"):
        # single-point label recovery is exact for these strategies
        assert int(rec["labels"][0]) == int(true_data["labels"][0]), strategy


def test_augmentations_shapes_and_differentiability():
    from breaching_tpu.attacks.auxiliaries.augmentations import augmentation_lookup

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    key = jax.random.PRNGKey(1)
    for name, cls in augmentation_lookup.items():
        if name in ("focus", "zoom", "centerzoom"):
            aug = cls(size=8, out_size=16, initial_fov=8)
        elif name == "continuous_shift":
            aug = cls(shift=2, padding="circular")
        elif name == "discrete_shift":
            aug = cls(lim=4)
        else:
            aug = cls()
        out = aug(x, key)
        assert out.shape[0] == 2 and out.shape[-1] == 3, name
        assert np.isfinite(np.asarray(out)).all(), name
    # the grid-sampled transform must be differentiable
    shift = augmentation_lookup["continuous_shift"](shift=2)
    grad = jax.grad(lambda img: jnp.sum(shift(img, key) ** 2))(x)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0


def test_keyboard_interrupt_returns_partial_results(monkeypatch):
    """Ctrl-C mid-attack returns the best-so-far reconstruction (reference
    optimization_based_attack.py:75-77, 139-141) instead of losing the run."""
    import breaching_tpu.attacks.optimization_based_attack as oba

    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
        "case.user.provide_labels=True", "case.user.num_data_points=1",
        "attack.optim.max_iterations=40", "attack.optim.callback=10", "seed=4",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)

    real_info = oba.log.info
    chunks = {"n": 0}

    def interrupting_info(msg, *args, **kwargs):
        if isinstance(msg, str) and msg.startswith("| It:"):
            chunks["n"] += 1
            if chunks["n"] == 2:
                raise KeyboardInterrupt
        return real_info(msg, *args, **kwargs)

    monkeypatch.setattr(oba.log, "info", interrupting_info)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    assert stats["interrupted_at"] == 20          # stopped after chunk 2 of 4
    assert len(stats["Trial_0_Val"]) == 20        # only completed chunks logged
    assert np.isfinite(np.asarray(rec["data"])).all()
    assert rec["data"].shape == np.asarray(true_data["data"]).shape
