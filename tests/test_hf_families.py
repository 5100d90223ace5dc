"""HF Flax family generality: roberta + distilbert wrappers (config-only).

The reference wraps ANY AutoModelForMaskedLM/CausalLM through
HuggingFaceContainer (reference model_preparation.py:97-149); this repo's
counterpart is the registry-driven `hf-*` factory in language_models.py.
These tests prove the two families beyond gpt2/bert load, expose the full
attack surface (capture, embedding inputs, rewiring registry), and run the
Decepticon and TAG paths end to end on random init.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from types import SimpleNamespace

import breaching_tpu as breaching
from breaching_tpu.cases.models.language_models import construct_text_model

FAMILIES = ["hf-roberta-tiny", "hf-distilbert-tiny"]


def _tiny(name, seq=16, vocab=128, task="masked-lm"):
    cfg_data = SimpleNamespace(vocab_size=vocab, shape=[seq], task=task)
    return construct_text_model(name, cfg_data, key=jax.random.PRNGKey(0))


@pytest.mark.parametrize("name", FAMILIES)
def test_forward_capture_and_registry(name):
    model, loss_fn = _tiny(name)
    ids = jnp.arange(16)[None] % 120 + 2
    logits, _ = model.apply(model.params, {}, ids)
    assert logits.shape == (1, 16, 128)
    logits2, aux = model.apply(model.params, {}, ids, capture=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), rtol=1e-5)
    inter = aux["intermediates"]
    reg = model.aux["registry"]
    assert {"layer0", "layer1", "layer2", "features"} <= set(inter)
    assert inter["layer0"]["ff_input"][0].shape == (1, 16, 96)
    # registry paths resolve in the real param tree
    def fetch(tree, path):
        for k in path:
            tree = tree[k]
        return tree
    assert fetch(model.params, reg["embedding"]).shape == (128, 96)
    assert fetch(model.params, reg["decoder_bias"]).shape == (128,)
    for entry in reg["attention_qkv"]:
        for p in entry.values():
            assert "kernel" in fetch(model.params, p)
    # tied decoder: head gradients come from the embedding path
    w, b = model.head_grads(model.params)
    assert w.shape == (128, 96) and b.shape == (128,)


@pytest.mark.parametrize("name", FAMILIES)
def test_embedding_inputs_match_ids(name):
    """The inputs_embeds interceptor: float (B, T, D) candidates must produce
    the same logits as the ids they embed (TAG's relaxation requirement)."""
    model, _ = _tiny(name)
    ids = (jnp.arange(16)[None] * 7) % 120 + 2
    def fetch(tree, path):
        for k in path:
            tree = tree[k]
        return tree
    table = fetch(model.params, model.aux["registry"]["embedding"])
    emb = table[ids]
    ref_logits, _ = model.apply(model.params, {}, ids)
    emb_logits, _ = model.apply(model.params, {}, emb)
    np.testing.assert_allclose(np.asarray(ref_logits), np.asarray(emb_logits),
                               rtol=1e-4, atol=1e-4)
    # and gradients flow back to the candidate embeddings
    g = jax.grad(lambda e: model.apply(model.params, {}, e)[0].sum())(emb)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_roberta_positional_table_offset():
    """HF roberta reads position rows starting at pad_token_id + 1; the
    registry's pos_offset must make positional_table return the runtime rows."""
    from breaching_tpu.cases.malicious.transformer_rewiring import positional_table

    model, _ = _tiny("hf-roberta-tiny")
    reg = model.aux["registry"]
    assert reg["pos_offset"] == 2
    table = positional_table(model, model.params, 8)
    def fetch(tree, path):
        for k in path:
            tree = tree[k]
        return tree
    full = np.asarray(fetch(model.params, reg["pos_embedding"]))
    np.testing.assert_array_equal(table, full[2:10])


def _run_decepticon(model, n_points=1):
    cfg = breaching.get_config([
        "case=10_causal_lang_training", "attack=decepticon",
        "case/server=malicious-transformer", "case/data=random-tokens",
        "case.data.task=masked-lm", f"case.model={model}",
        "case.data.shape=[12]", "case.data.vocab_size=512",
        "case.data.default_clients=40", "case.server.has_external_data=False",
        f"case.user.num_data_points={n_points}", "seed=13",
        "case.server.param_modification.reset_embedding=True",
        "case.server.param_modification.v_length=16",
        "case.server.param_modification.measurement_scale=1e8",
        "case.server.param_modification.eps=1e-8",
        "case.server.param_modification.softmax_skew=1e8",
        "attack.token_strategy=embedding-norm",
        "attack.embedding_token_weight=0.0",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, _, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    return breaching.analysis.report(rec, true_data, payloads, server.model,
                                     cfg_case=cfg.case, setup=setup)


def test_decepticon_hf_roberta():
    metrics = _run_decepticon("hf-roberta-tiny")
    assert metrics["token_acc"] > 0.7, metrics
    assert metrics["accuracy"] > 0.5, metrics


def test_decepticon_hf_distilbert():
    metrics = _run_decepticon("hf-distilbert-tiny")
    assert metrics["token_acc"] > 0.7, metrics
    assert metrics["accuracy"] > 0.5, metrics


def _run_tag(model, seq=8, vocab=128, iters=20):
    cfg = breaching.get_config([
        "case=10_causal_lang_training", f"case.model={model}",
        f"case.data.shape=[{seq}]", f"case.data.vocab_size={vocab}",
        "case.data.task=masked-lm", "case.user.num_data_points=1", "seed=5",
        "attack=tag", f"attack.optim.max_iterations={iters}",
        f"attack.optim.callback={iters // 2}",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, _, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    metrics = breaching.analysis.report(rec, true_data, payloads, server.model,
                                        cfg_case=cfg.case, setup=setup)
    return rec, metrics


@pytest.mark.parametrize("name", FAMILIES)
def test_tag_attack_on_family(name):
    rec, metrics = _run_tag(name)
    assert rec["data"].shape == (1, 8)
    assert rec["data"].dtype in (jnp.int32, jnp.int64)
    assert 0.0 <= metrics["accuracy"] <= 1.0


def test_mlm_loss_soft_labels():
    """MLMLoss must accept the joint-optimization relaxation (soft [B, T, V])
    — matches torch CrossEntropyLoss semantics for probability targets."""
    from breaching_tpu.cases.models.losses import MLMLoss

    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7))
    hard = jnp.asarray([[1, 2, 3, -100, -100], [4, 5, 6, -100, -100]])
    soft = jax.nn.one_hot(jnp.maximum(hard, 0), 7)
    loss = MLMLoss()
    assert np.isfinite(float(loss(logits, hard)))
    assert np.isfinite(float(loss(logits, soft)))
    g = jax.grad(lambda s: loss(logits, s))(soft)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_full_size_roberta_base_composes_and_runs():
    """`case.model=hf-roberta-base` builds the 12x768 architecture and runs a
    short TAG attack on random init (vocab reduced to keep the 1-core host
    honest; depth/width are the real roberta-base geometry)."""
    model, _ = _tiny("hf-roberta-base", seq=8, vocab=512)
    assert model.aux["nlayers"] == 12 and model.aux["ninp"] == 768
    rec, metrics = _run_tag("hf-roberta-base", seq=8, vocab=512, iters=4)
    assert rec["data"].shape == (1, 8)
