"""Fleet mode: N independent experiments batched into one attack scan."""

import jax.numpy as jnp
import numpy as np

import breaching_tpu as breaching


def test_fleet_matches_sequential_quality():
    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
        "case.user.provide_labels=True", "case.user.num_data_points=1",
        "attack.optim.max_iterations=400", "attack.optim.callback=200",
        "seed=11",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)

    # one case = one model: fleet batches experiments against SHARED weights
    # (the reference benchmark constructs the case once, users per trial)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    payload_lists, shared_lists, truths = [], [], []
    for user_idx in range(3):
        cfg.case.user.user_idx = user_idx
        user = breaching.cases.construct_user(model, server.loss, cfg.case, setup)
        shared, payloads, true_data = server.run_protocol(user)
        payload_lists.append(payloads)
        shared_lists.append(shared)
        truths.append(true_data)

    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    results, stats = attacker.reconstruct_fleet(payload_lists, shared_lists)
    assert len(results) == 3

    psnrs = []
    for rec, true_data, payloads in zip(results, truths, payload_lists):
        metrics = breaching.analysis.report(rec, true_data, payloads, server.model,
                                            cfg_case=cfg.case, setup=setup)
        psnrs.append(metrics["psnr"])
        # every experiment matched ITS OWN gradient, not a shared one
        assert int(rec["labels"][0]) == int(true_data["labels"][0])
    assert min(psnrs) > 13, psnrs  # solo 400-iter runs land ~14-22 here

    # distinct experiments produced distinct reconstructions
    d01 = float(jnp.mean(jnp.square(results[0]["data"] - results[1]["data"])))
    assert d01 > 1e-3


def test_fleet_with_restarts_selects_per_experiment():
    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
        "case.user.provide_labels=True", "case.user.num_data_points=1",
        "attack.optim.max_iterations=60", "attack.optim.callback=30",
        "attack.restarts.num_trials=2", "seed=5",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    payload_lists, shared_lists = [], []
    for user_idx in range(2):
        cfg.case.user.user_idx = user_idx
        user = breaching.cases.construct_user(model, server.loss, cfg.case, setup)
        shared, payloads, _ = server.run_protocol(user)
        payload_lists.append(payloads)
        shared_lists.append(shared)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    results, stats = attacker.reconstruct_fleet(payload_lists, shared_lists)
    assert len(results) == 2
    assert all(np.isfinite(np.asarray(r["data"])).all() for r in results)
    # restarts config restored after the fleet run
    assert int(cfg.attack.restarts.num_trials) == 2
    # each experiment picked its own argmin over its OWN trial block — the two
    # users' gradients differ, so the selected reconstructions must too
    d01 = float(jnp.mean(jnp.square(results[0]["data"] - results[1]["data"])))
    assert d01 > 1e-4, d01


def test_fleet_rejects_diverging_model_parameters():
    """The batched trials share ONE weight tree; payloads with different
    parameters must fail loudly instead of silently matching wrong weights."""
    import jax
    import pytest

    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
        "case.user.provide_labels=True", "case.user.num_data_points=1",
        "attack.optim.max_iterations=2", "attack.optim.callback=1", "seed=5",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    payload_lists, shared_lists = [], []
    for user_idx in range(2):
        cfg.case.user.user_idx = user_idx
        user = breaching.cases.construct_user(model, server.loss, cfg.case, setup)
        shared, payloads, _ = server.run_protocol(user)
        payload_lists.append(payloads)
        shared_lists.append(shared)
    # corrupt the second experiment's weights
    payload_lists[1] = list(payload_lists[1])
    payload_lists[1][0] = dict(payload_lists[1][0], parameters=jax.tree_util.tree_map(
        lambda x: x + 1e-3, payload_lists[1][0]["parameters"]))
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    with pytest.raises(ValueError, match="identical model parameters"):
        attacker.reconstruct_fleet(payload_lists, shared_lists)


def test_fleet_restart_selection_uses_configured_scoring():
    """Fleet selection must apply cfg.restarts.scoring per experiment block,
    exactly like the solo path (reference optimization_based_attack.py:191-218)
    — not argmin(best_vals). Captures the fleet's trial blocks and re-scores
    each with the solo scoring path; the fleet's returned reconstruction must
    be the solo-selected trial of its own block."""
    import jax

    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
        "case.user.provide_labels=True", "case.user.num_data_points=1",
        "attack.optim.max_iterations=60", "attack.optim.callback=30",
        "attack.restarts.num_trials=2", "attack.restarts.scoring=euclidean",
        "seed=8",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    payload_lists, shared_lists = [], []
    for user_idx in range(2):
        cfg.case.user.user_idx = user_idx
        user = breaching.cases.construct_user(model, server.loss, cfg.case, setup)
        shared, payloads, _ = server.run_protocol(user)
        payload_lists.append(payloads)
        shared_lists.append(shared)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)

    captured = {}
    orig_run = attacker._run_all_trials

    def spy(*args, **kwargs):
        out = orig_run(*args, **kwargs)
        captured["best_trees"] = out[0]
        return out

    attacker._run_all_trials = spy
    results, stats = attacker.reconstruct_fleet(payload_lists, shared_lists)
    attacker._run_all_trials = orig_run

    assert "fleet_opt_values" in stats and len(stats["fleet_opt_values"]) == 2
    trees = captured["best_trees"]
    for i in range(2):
        block = jax.tree_util.tree_map(lambda x: x[2 * i:2 * i + 2], trees)
        # solo scoring of this experiment's block, on its own target gradient
        rec_models_i, labels_i, _ = attacker.prepare_attack(
            payload_lists[i], shared_lists[i])
        scores = attacker._score_all_trials(
            block, labels_i, rec_models_i, attacker._shared_data_cache)
        j = int(np.argmin(scores))
        np.testing.assert_allclose(
            np.asarray(results[i]["data"]),
            np.asarray(block["data"][j]), rtol=1e-6, atol=1e-7)
        assert stats["fleet_opt_values"][i] == pytest.approx(
            float(scores[j]), rel=1e-4)


import pytest  # noqa: E402  (used by the scoring test above)
