"""Decepticon at reference strength: multi-sentence hard inputs, the clustering
zoo, pre-LN (gpt2-style) and masked-lm (bert-style) architectures.

Reference baselines (BASELINE.md): acc 0.89 FL-transformer3, 0.91 BERT,
0.87 small GPT-2 — all on 8-sentence wikitext."""

import numpy as np
import pytest

import breaching_tpu as breaching


def _run_decepticon(model, task, n_points, extra=()):
    cfg = breaching.get_config([
        "case=10_causal_lang_training", "attack=decepticon",
        "case/server=malicious-transformer", "case/data=random-tokens",
        f"case.data.task={task}", f"case.model={model}",
        "case.data.shape=[12]", "case.data.vocab_size=512",
        "case.data.default_clients=40", "case.server.has_external_data=False",
        f"case.user.num_data_points={n_points}", "seed=13", *extra,
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, _, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    attacker = breaching.attacks.prepare_attack(server.model, server.loss, cfg.attack, setup)
    shared, payloads, true_data = server.run_protocol(user)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    return breaching.analysis.report(rec, true_data, payloads, server.model,
                                     cfg_case=cfg.case, setup=setup), rec


@pytest.mark.parametrize("algorithm", ["k-means", "dynamic-threshold"])
def test_decepticon_four_sentences(algorithm):
    """4 Zipf-repetitive sentences: clustering + backfill paths exercised end to
    end; positional accuracy must be near the single-sentence level."""
    metrics, rec = _run_decepticon(
        "transformer3", "causal-lm", 4,
        extra=[f"attack.sentence_algorithm={algorithm}"])
    assert metrics["token_acc"] > 0.8, metrics
    assert metrics["accuracy"] > 0.8, metrics
    assert rec["confidence"].shape == (4, 12)


def test_decepticon_gpt2_style_preln_tied():
    metrics, _ = _run_decepticon("gpt2-tiny", "causal-lm", 2)
    assert metrics["token_acc"] > 0.6, metrics
    assert metrics["accuracy"] > 0.5, metrics


def test_decepticon_bert_style_masked_lm():
    metrics, _ = _run_decepticon("bert-tiny", "masked-lm", 2)
    assert metrics["token_acc"] > 0.5, metrics
    assert metrics["accuracy"] > 0.5, metrics


def test_clustering_zoo_respects_size_constraint():
    """Every algorithm separates 3 well-separated key clusters of 10 rows and
    never exceeds the max cluster size."""
    from breaching_tpu.attacks.decepticon_attack import DecepticonAttacker

    rng = np.random.default_rng(0)
    seeds = rng.standard_normal((3, 6)) * 3
    keys = np.concatenate([seeds[i] + 0.05 * rng.standard_normal((10, 6))
                           for i in range(3)])
    truth = np.repeat(np.arange(3), 10)

    attacker = DecepticonAttacker.__new__(DecepticonAttacker)
    attacker.cfg = breaching.get_config(
        ["case=10_causal_lang_training", "attack=decepticon"]).attack

    for algorithm in ["k-means", "k-medoids", "dynamic-threshold",
                      "dynamic-threshold-median", "threshold", "fcluster",
                      "pca", "pca-direct"]:
        attacker.cfg.sentence_algorithm = algorithm
        labels = attacker._cluster_sentences(keys, 3, seq_len=10)
        assert labels.shape == (30,), algorithm
        assert np.bincount(labels, minlength=3).max() <= 10 or "pca" in algorithm \
            or algorithm == "threshold", algorithm
        # perfect recovery up to permutation for the well-separated case
        agree = max(
            (labels == perm[truth]).mean()
            for perm in map(np.asarray, __import__("itertools").permutations(range(3))))
        assert agree == 1.0, (algorithm, labels)


HF_COMMON = [
    "case.server.param_modification.eps=1e-8",
    "case.server.param_modification.softmax_skew=1e8",
    "attack.token_strategy=embedding-norm",
    "attack.embedding_token_weight=0.0",
]


def test_decepticon_hf_gpt2_architecture():
    """Decepticon on the REAL HuggingFace Flax GPT-2 architecture (Conv1D
    out-in kernels, pre-LN, causal mask, tied bias-free head) with the
    reference notebook's hyperparameters (measurement_scale circumvents GELU)."""
    metrics, _ = _run_decepticon(
        "hf-gpt2-tiny", "causal-lm", 1,
        extra=["case.server.param_modification.v_length=32",
               "case.server.param_modification.measurement_scale=1e6",
               *HF_COMMON])
    assert metrics["token_acc"] > 0.8, metrics
    assert metrics["accuracy"] > 0.6, metrics


def test_decepticon_hf_bert_architecture():
    """Decepticon on the REAL HuggingFace Flax BERT (separate q/k/v paths,
    embedding LayerNorm as norm_layer0, masked-lm equalize path,
    reset_embedding like the reference notebook)."""
    metrics, _ = _run_decepticon(
        "hf-bert-tiny", "masked-lm", 1,
        extra=["case.server.param_modification.reset_embedding=True",
               "case.server.param_modification.v_length=16",
               "case.server.param_modification.measurement_scale=1e8",
               *HF_COMMON])
    assert metrics["token_acc"] > 0.7, metrics
    assert metrics["accuracy"] > 0.4, metrics
