"""Text stack tests: models, data, TAG attack, Decepticon readout."""

import jax
import jax.numpy as jnp
import numpy as np

import breaching_tpu as breaching


def _text_cfg(extra=()):
    return breaching.get_config([
        "case=10_causal_lang_training", "case.model=transformer1",
        "case.data.shape=[8]", "case.data.vocab_size=128",
        "case.user.num_data_points=1", "seed=5", *extra,
    ])


def test_text_model_forward_and_embeddings():
    from breaching_tpu.cases.models import construct_model

    cfg = _text_cfg()
    model, loss_fn = construct_model("transformer3", cfg.case.data, key=jax.random.PRNGKey(0))
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    logits, _ = model.apply(model.params, {}, ids, train=False)
    assert logits.shape == (1, 8, 128)
    # embeddings can be fed directly (run-embedding attack path)
    emb = model.params["embedding"][ids]
    logits2, _ = model.apply(model.params, {}, emb, train=False)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), rtol=1e-5)
    loss = loss_fn(logits, ids)
    assert np.isfinite(float(loss))


def test_causal_loss_shift():
    from breaching_tpu.cases.models.losses import CausalLoss

    logits = jnp.zeros((1, 4, 8)).at[0, 0, 3].set(10.0)  # predicts token 3 at position 0
    labels = jnp.asarray([[9 % 8, 3, 0, 0]])             # token at position 1 is 3
    focused = CausalLoss()(logits, labels)
    labels_wrong = jnp.asarray([[0, 5, 0, 0]])
    assert float(focused) < float(CausalLoss()(logits, labels_wrong))


def test_tag_attack_end_to_end():
    cfg = _text_cfg(["attack=tag", "attack.optim.max_iterations=30",
                     "attack.optim.callback=15"])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    assert rec["data"].shape == (1, 8)          # token ids after postprocessing
    assert rec["data"].dtype in (jnp.int32, jnp.int64)
    metrics = breaching.analysis.report(rec, true_data, payloads, server.model,
                                        cfg_case=cfg.case, setup=setup)
    assert 0.0 <= metrics["accuracy"] <= 1.0


def test_decepticon_readout_recovers_tokens():
    cfg = breaching.get_config([
        "case=10_causal_lang_training", "attack=decepticon",
        "case/server=malicious-transformer", "case/data=random-tokens",
        "case.data.task=causal-lm", "case.model=transformer3",
        "case.data.shape=[12]", "case.data.vocab_size=512",
        "case.data.default_clients=40", "case.server.has_external_data=False",
        "case.user.num_data_points=1", "seed=13",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    metrics = breaching.analysis.report(rec, true_data, payloads, server.model,
                                        cfg_case=cfg.case, setup=setup)
    # multiset token recovery must be strong; exact positions mostly right
    assert metrics["token_acc"] > 0.5, metrics
    assert metrics["accuracy"] > 0.3, metrics


def test_imprint_attack_on_text():
    """Robbing-the-Fed with the block after the embedding recovers the exact
    token sequence (reference benchmark: token acc 0.86 on wikitext)."""
    cfg = breaching.get_config([
        "case=10_causal_lang_training", "attack=imprint",
        "case/server=malicious-model-rtf", "case/data=random-tokens",
        "case.data.task=causal-lm", "case.model=transformer3",
        "case.data.shape=[12]", "case.data.vocab_size=512",
        "case.data.default_clients=40",
        "case.server.model_modification.num_bins=48",
        "case.user.num_data_points=1", "seed=4",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    metrics = breaching.analysis.report(rec, true_data, payloads, server.model,
                                        cfg_case=cfg.case, setup=setup)
    assert metrics["accuracy"] > 0.9, metrics


def test_text_metrics_oracle():
    from breaching_tpu.analysis.text_metrics import bleu, rouge_n, run_text_metrics

    a = [[1, 2, 3, 4]]
    assert np.isclose(bleu(a, a), 1.0)
    assert np.isclose(rouge_n(a, a, 1), 1.0)
    res = run_text_metrics(dict(data=np.asarray(a)), dict(data=np.asarray(a)),
                           [dict(metadata=None)], None, order_batch=False)
    assert res["accuracy"] == 1.0


def test_lstm_and_linear_text_models():
    from breaching_tpu.cases.models import construct_model

    cfg = _text_cfg()
    for name in ("LSTM", "linear"):
        model, loss_fn = construct_model(name, cfg.case.data, key=jax.random.PRNGKey(0))
        ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
        logits, _ = model.apply(model.params, {}, ids, train=False)
        assert logits.shape == (1, 8, 128)


def test_bias_text_label_strategy():
    """bias-text recovers the full (n, seq_len) token grid from decoder-bias
    gradients + embedding-row hits (reference: base_attack.py:426-452)."""
    import collections

    cfg = breaching.get_config([
        "case=10_causal_lang_training", "attack=invertinggradients",
        "case/data=random-tokens", "case.data.task=causal-lm",
        "case.model=transformer3", "case.data.shape=[12]",
        "case.data.vocab_size=512", "case.data.default_clients=20",
        "case.user.num_data_points=2", "case.user.provide_labels=False",
        "attack.label_strategy=bias-text", "attack.token_strategy=",
        "attack.optim.max_iterations=2", "attack.optim.callback=1", "seed=3",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec_models, labels, stats = attacker.prepare_attack(payloads, shared)
    assert labels.shape == (2, 12)
    true = np.asarray(true_data["data"]).reshape(-1)
    recv = np.asarray(labels).reshape(-1)
    tb = collections.Counter(true.tolist())
    rb = collections.Counter(recv.tolist())
    overlap = sum(min(tb[k], rb[k]) for k in tb)
    assert overlap >= 0.8 * true.size, (overlap, true.size)


def test_embedding_norm_underfill_pads_to_num_missing():
    """ADVICE r2: with one distinct recovered token and num_missing >= 4 the
    no-repeat-evidence fallback used to return < num_missing tokens and the
    final reshape raised; now padding cycles rows until the grid is full."""
    from types import SimpleNamespace

    from breaching_tpu.attacks.auxiliaries.text_utils import recover_token_information

    vocab, dim, seq_len = 16, 4, 8
    grads = np.zeros((vocab, dim), np.float32)
    grads[5] = 1.0  # exactly one token row carries gradient signal
    attacker = SimpleNamespace(cfg={"token_strategy": "embedding-norm",
                                    "token_cutoff": 3.5})
    attacker.cfg = type("Cfg", (dict,), {})(attacker.cfg)
    model = SimpleNamespace(aux={"registry": {"embedding": ("embedding",)}})
    user_data = [{"metadata": {"num_data_points": 1},
                  "gradients": {"embedding": jnp.asarray(grads)}}]
    payload = [{"metadata": SimpleNamespace(shape=[seq_len])}]
    tokens = recover_token_information(attacker, user_data, payload, model)
    assert tokens.shape == (1, seq_len)
    assert np.all(np.asarray(tokens) == 5)
