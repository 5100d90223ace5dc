"""Sequence-classification (GLUE cola) text stack.

The reference reaches this task via AutoModelForSequenceClassification +
the cola label column (reference model_preparation.py:101-108,
datasets_text.py:114-121); here the transformer grows a first-position
classifier head and the data backend emits per-sequence class labels.
"""

import jax
import jax.numpy as jnp
import numpy as np

import breaching_tpu as breaching


def _cfg(extra=()):
    return breaching.get_config([
        "case=10_causal_lang_training", "case/data=cola",
        "case.data.task=classification",  # case 10 pins causal-lm over the group
        "case.model=transformer3", "case.data.shape=[8]",
        "case.data.vocab_size=128", "case.data.size=64",
        "case.data.default_clients=16", "case.user.num_data_points=2",
        "seed=11", *extra,
    ])


def test_classification_model_and_labels():
    from breaching_tpu.cases.models import construct_model

    cfg = _cfg()
    model, loss_fn = construct_model("transformer3", cfg.case.data,
                                     key=jax.random.PRNGKey(0))
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    logits, _ = model.apply(model.params, {}, ids, train=False)
    assert logits.shape == (1, 2)  # (batch, classes), not (batch, T, vocab)
    assert model.head_path == ("classifier",)
    loss = loss_fn(logits, jnp.asarray([1]))
    assert np.isfinite(float(loss))


def test_cola_dataset_scalar_labels():
    from breaching_tpu.cases.data.data_preparation import construct_dataloader

    cfg = _cfg()
    loader = construct_dataloader(cfg.case.data, cfg.case.impl, user_idx=3)
    batch = next(iter(loader))
    assert batch["input_ids"].shape[1:] == (8,)
    assert batch["labels"].ndim == 1  # one class id per sequence
    assert set(np.unique(batch["labels"])) <= {0, 1}


def test_hf_classification_heads():
    """hf-* families grow the Flax sequence-classification head when the data
    task asks for it (reference AutoModelForSequenceClassification)."""
    from types import SimpleNamespace

    from breaching_tpu.cases.models.language_models import construct_text_model

    for name, head in (("hf-bert-tiny", ("classifier",)),
                       ("hf-roberta-tiny", ("classifier", "out_proj")),
                       ("hf-distilbert-tiny", ("classifier",))):
        cfg_data = SimpleNamespace(vocab_size=128, shape=[8],
                                   task="classification", classes=2)
        model, loss_fn = construct_text_model(name, cfg_data,
                                              key=jax.random.PRNGKey(0))
        ids = jnp.arange(8)[None] % 120 + 2
        logits, _ = model.apply(model.params, {}, ids)
        assert logits.shape == (1, 2), (name, logits.shape)
        assert model.head_path == head
        assert np.isfinite(float(loss_fn(logits, jnp.asarray([1]))))


def test_tag_attack_on_classification():
    cfg = _cfg(["attack=tag", "attack.optim.max_iterations=30",
                "attack.optim.callback=15", "attack.label_strategy=yin",
                "attack.token_strategy=", "case.user.provide_labels=False"])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    assert rec["data"].shape == (2, 8)
    metrics = breaching.analysis.report(rec, true_data, payloads, server.model,
                                        cfg_case=cfg.case, setup=setup)
    assert 0.0 <= metrics["accuracy"] <= 1.0
