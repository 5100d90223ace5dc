"""Per-layer throughput normalization (reference: servers.py:314-366)."""

import jax
import jax.numpy as jnp
import numpy as np

import breaching_tpu as breaching


def _build(overrides):
    cfg = breaching.get_config(overrides)
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    return cfg, user, server


OVERRIDES = [
    "case=1_single_image_small", "attack=imprint",
    "case/server=malicious-model-rtf", "case.model=resnet20",
    "case.data.shape=[3, 16, 16]",
    "case.server.model_modification.num_bins=32",
    "case.server.normalize_rounds=2",
    "case.user.num_data_points=1", "case.user.provide_labels=True", "seed=12",
]


def _norm_layer_stds(server):
    """Std of every normalized layer's output on the probe batch."""
    model = server.model
    x = server._probe_batch()
    variables = {"params": model.params}
    if model.buffers:
        variables["batch_stats"] = model.buffers
    _, inter = model.module.apply(
        variables, x, train=False, mutable=["intermediates"],
        capture_intermediates=lambda mdl, name: name == "__call__")
    stds = {}

    def walk(tree, params, prefix=()):
        for key, val in tree.items():
            if key == "__call__":
                node = params if isinstance(params, dict) else {}
                if "scale" in node and "bias" in node \
                        and not any("downsample" in str(k) for k in prefix):
                    stds["/".join(map(str, prefix))] = float(np.std(val[0]))
            elif isinstance(val, dict):
                walk(val, params.get(key, {}) if isinstance(params, dict) else {},
                     prefix + (key,))

    walk(dict(inter)["intermediates"], model.params)
    return stds


def test_per_layer_std_near_unity_after_normalization():
    cfg, user, server = _build(OVERRIDES)
    stds = _norm_layer_stds(server)
    assert len(stds) >= 10, f"expected many norm layers, saw {list(stds)}"
    values = np.asarray(list(stds.values()))
    # iterated per-layer correction pins every norm output near unit std
    assert (np.abs(values - 1.0) < 0.35).all(), stds

    # downsample convs zeroed like the reference's 'downsample.0'
    down = server.model.params["victim"]["stage1_block0"]["downsample_conv"]["conv"]["kernel"]
    assert float(jnp.abs(down).max()) == 0.0


def test_imprint_recovery_survives_normalization():
    cfg, user, server = _build(OVERRIDES)
    setup = breaching.utils.system_startup(cfg=cfg)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    mse = float(jnp.mean(jnp.square(rec["data"] - true_data["data"])))
    assert mse < 5e-2, f"imprint readout broken by normalization: mse={mse}"
