"""Exact oracles for the analytic attack family (SURVEY §4: analytic attacks on
known settings have closed-form answers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import breaching_tpu as breaching


def _run_case(overrides):
    cfg = breaching.get_config(overrides)
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets, dryrun=cfg.dryrun)
    return rec, true_data, cfg


def test_analytic_attack_on_linear_model_is_exact():
    """FC inversion of a linear model recovers the input to machine precision
    (the reference's sanity-check case 0)."""
    rec, true_data, cfg = _run_case([
        "case=0_sanity_check", "attack=analytic",
        "case.data.shape=[3, 16, 16]", "case.data.classes=10",
        "case/data=CIFAR10", "case.model=linear",
        "case.user.num_data_points=1", "seed=42",
    ])
    err = float(jnp.mean(jnp.square(rec["data"] - true_data["data"])))
    assert err < 1e-6, f"analytic inversion not exact: mse={err}"


def test_imprint_attack_single_image_near_exact():
    """Robbing-the-Fed oracle: with one datapoint and enough bins, the imprint
    readout reproduces the input almost exactly."""
    rec, true_data, cfg = _run_case([
        "case=1_single_image_small", "attack=imprint",
        "case/server=malicious-model-rtf",
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
        "case.server.model_modification.num_bins=32",
        "case.user.num_data_points=1", "case.user.provide_labels=True", "seed=12",
    ])
    mse = float(jnp.mean(jnp.square(rec["data"] - true_data["data"])))
    # the hit bin reproduces the exact input; allow slack for the box projection
    assert mse < 5e-2, f"imprint readout too lossy: mse={mse}"
    # PSNR in image space should be high
    from breaching_tpu.analysis.metrics import mse_psnr

    dm = jnp.asarray(cfg.case.data.mean).reshape(1, 1, 1, -1)
    ds = jnp.asarray(cfg.case.data.std).reshape(1, 1, 1, -1)
    _, psnr = mse_psnr(jnp.clip(rec["data"] * ds + dm, 0, 1),
                       jnp.clip(true_data["data"] * ds + dm, 0, 1), clip=True)
    assert float(psnr) > 25, f"imprint PSNR too low: {float(psnr)}"


def test_deep_imprint_placement_with_linearized_prefix():
    """Imprint block one stage deep in a ResNet with the prefix linearized to an
    identity map recovers the input near-exactly (reference deep `position`
    placement + _linearize_up_to_imprint)."""
    rec, true_data, cfg = _run_case([
        "case=1_single_image_small", "attack=imprint",
        "case/server=malicious-model-rtf", "case.model=resnet20",
        "case.data.shape=[3, 16, 16]",
        "case.server.model_modification.position=1",
        "case.server.model_modification.num_bins=32",
        "case.server.model_modification.handle_preceding_layers=identity",
        "case.user.num_data_points=1", "case.user.provide_labels=True", "seed=12",
    ])
    mse = float(jnp.mean(jnp.square(rec["data"] - true_data["data"])))
    assert mse < 1e-4, f"deep imprint readout too lossy: mse={mse}"


def test_cah_trap_attack_runs():
    rec, true_data, cfg = _run_case([
        "case=1_single_image_small", "attack=imprint",
        "case/server=malicious-model-cah",
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
        "case.server.model_modification.num_bins=24",
        "case.user.num_data_points=2", "case.user.provide_labels=True", "seed=9",
    ])
    assert rec["data"].shape == true_data["data"].shape
    assert np.isfinite(np.asarray(rec["data"])).all()


def test_joint_label_attack_recovers_label():
    """DLG-style joint optimization recovers data and labels together."""
    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=deepleakage",
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
        "case.user.provide_labels=False", "case.user.num_data_points=1",
        "attack.optim.max_iterations=40", "attack.optim.callback=20",
        "attack.optim.optimizer=adam", "attack.optim.step_size=0.1", "seed=21",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    assert rec["data"].shape == (1, 16, 16, 3)
    assert rec["labels"].shape == (1,)
    assert stats["Trial_0_Val"][-1] < stats["Trial_0_Val"][0]


@pytest.mark.slow
def test_deep_imprint_with_trained_feature_decoder():
    """handle_preceding_layers=VAE at a stage-2 placement: the decoder is
    trained to invert the real prefix feature map (reference feat_decoders.py),
    so the readout returns to input space at high quality."""
    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=imprint",
        "case/server=malicious-model-rtf", "case.model=resnet20",
        "case.data.shape=[3, 16, 16]",
        "case.server.model_modification.position=2",
        "case.server.model_modification.num_bins=32",
        "case.server.model_modification.handle_preceding_layers=VAE",
        "case.server.has_external_data=True",
        "case.user.num_data_points=1", "case.user.provide_labels=True", "seed=12",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    metrics = breaching.analysis.report(rec, true_data, payloads, server.model,
                                        cfg_case=cfg.case, setup=setup)
    assert metrics["psnr"] > 20, metrics
