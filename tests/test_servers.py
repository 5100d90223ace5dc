"""Server model-state and threat-model tests."""

import jax
import numpy as np

import breaching_tpu as breaching


def _build(overrides):
    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]", "seed=3",
        *overrides,
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    return cfg, setup, server, model


def _flat(params):
    return np.concatenate([np.asarray(x).reshape(-1)
                           for x in jax.tree_util.tree_leaves(params)])


def test_untrained_state_reinitializes():
    cfg, setup, server, model = _build(["case.server.model_state=untrained"])
    before = _flat(server.model.params)
    server.distribute_payload(query_id=0)
    after = _flat(server.model.params)
    assert not np.allclose(before, after)


def test_orthogonal_state_orthogonalizes_kernels():
    cfg, setup, server, model = _build(["case.server.model_state=orthogonal"])
    server.distribute_payload(query_id=0)
    kernel = np.asarray(server.model.params["conv0"]["conv"]["kernel"])
    flat = kernel.reshape(-1, kernel.shape[-1])
    gram = flat.T @ flat
    np.testing.assert_allclose(gram, np.eye(gram.shape[0]), atol=1e-4)


def test_default_state_keeps_parameters():
    cfg, setup, server, model = _build(["case.server.model_state=default"])
    before = _flat(server.model.params)
    server.distribute_payload(query_id=0)
    np.testing.assert_allclose(before, _flat(server.model.params))


def test_wainakh_whitebox_label_recovery():
    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "case.model=ConvNetSmall16", "case.data.shape=[3, 16, 16]",
        "case.user.provide_labels=False", "case.user.num_data_points=1",
        "attack.label_strategy=wainakh-whitebox",
        "attack.optim.max_iterations=2", "attack.optim.callback=1", "seed=19",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    assert int(rec["labels"][0]) == int(true_data["labels"][0])
