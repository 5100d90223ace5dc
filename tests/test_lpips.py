"""LPIPS scorer: npz round-trip, metric sanity, and report() wiring."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from breaching_tpu.analysis.lpips import LPIPS, find_lpips_weights, load_lpips


@pytest.fixture(scope="module")
def alex_weights(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "lpips_alex.npz"
    LPIPS.random_init("alex").save_npz(path)
    return str(path)


def test_roundtrip_and_metric_properties(alex_weights):
    model = LPIPS.from_npz(alex_weights)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 64, 64, 3))
    y = jax.random.uniform(jax.random.fold_in(key, 1), (2, 64, 64, 3))
    d_same = model(x, x)
    d_diff = model(x, y)
    d_sym = model(y, x)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-5)
    assert bool(jnp.all(d_diff > 1e-4))
    np.testing.assert_allclose(np.asarray(d_diff), np.asarray(d_sym), rtol=1e-5)


def test_vgg_trunk_shapes():
    model = LPIPS.random_init("vgg")
    d = model(jnp.zeros((1, 32, 32, 3)), jnp.ones((1, 32, 32, 3)))
    assert d.shape == (1,) and bool(jnp.isfinite(d[0]))


def test_features_separate_images(alex_weights):
    model = LPIPS.from_npz(alex_weights)
    x = jax.random.uniform(jax.random.PRNGKey(2), (3, 32, 32, 3))
    f = model.features(x)
    assert f.shape[0] == 3
    # distinct inputs produce distinct features
    assert float(jnp.sum(jnp.square(f[0] - f[1]))) > 1e-6


def test_env_discovery_and_report_wiring(alex_weights, monkeypatch):
    monkeypatch.setenv("BREACHING_LPIPS_WEIGHTS", alex_weights)
    assert find_lpips_weights(None) == alex_weights
    assert load_lpips(None) is not None

    import breaching_tpu as breaching

    cfg = breaching.get_config([
        "case=1_single_image_small", "attack=invertinggradients",
        "case.data.shape=[3,16,16]", "case.model=ConvNetSmall16",
        "case.user.provide_labels=True",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    shared, payloads, true_data = server.run_protocol(user)
    fake_rec = dict(data=true_data["data"] + 0.1, labels=true_data["labels"])
    metrics = breaching.analysis.report(fake_rec, true_data, payloads, server.model,
                                        cfg_case=cfg.case, setup=setup)
    assert np.isfinite(metrics["lpips"]) and metrics["lpips"] > 0

    monkeypatch.delenv("BREACHING_LPIPS_WEIGHTS")
    if find_lpips_weights(cfg.case) is None:  # no real weights on this machine
        metrics = breaching.analysis.report(fake_rec, true_data, payloads, server.model,
                                            cfg_case=cfg.case, setup=setup)
        assert np.isnan(metrics["lpips"])
