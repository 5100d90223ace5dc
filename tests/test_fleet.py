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

    payload_lists, shared_lists, truths = [], [], []
    server = None
    for user_idx in range(3):
        cfg.case.user.user_idx = user_idx
        user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
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
    payload_lists, shared_lists = [], []
    server = None
    for user_idx in range(2):
        cfg.case.user.user_idx = user_idx
        user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
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
