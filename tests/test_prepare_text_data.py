"""Tokenizer-backed on-disk text pipeline: produce npz -> attack real-ish data."""

import numpy as np

import breaching_tpu as breaching
from breaching_tpu.cases.data.prepare_text_data import prepare_text_npz


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "federated learning shares gradients not data",
    "gradients leak more than you think about privacy",
    "the server can rewire the model maliciously",
] * 40


def test_roundtrip_and_attack_on_tokenized_corpus(tmp_path):
    path, tokenizer = prepare_text_npz(
        CORPUS, tmp_path, "smallcorpus", split="training", seq_len=12,
        vocab_size=64)
    ids = np.load(path)["input_ids"]
    assert ids.shape[1] == 12 and ids.shape[0] >= 40
    assert ids.max() < 64
    # ids decode back to the corpus vocabulary (no <unk> flood)
    unk = tokenizer.token_to_id("<unk>")
    assert (ids == unk).mean() < 0.1

    cfg = breaching.get_config([
        "case=10_causal_lang_training", "attack=decepticon",
        "case/server=malicious-transformer", "case/data=random-tokens",
        "case.data.task=causal-lm", "case.model=transformer3",
        "case.data.name=smallcorpus", f"case.data.path={tmp_path}",
        "case.data.shape=[12]", "case.data.vocab_size=64",
        "case.data.default_clients=10", "case.server.has_external_data=False",
        "case.user.num_data_points=1", "seed=7",
    ])
    setup = breaching.utils.system_startup(cfg=cfg)
    user, server, model, loss_fn = breaching.cases.construct_case(cfg.case, setup)
    shared, payloads, true_data = server.run_protocol(user)
    # the loader must have read OUR npz, not the synthetic fallback
    flat = np.asarray(true_data["data"]).reshape(-1)
    assert set(flat.tolist()) <= set(np.unique(ids).tolist())

    attacker = breaching.attacks.prepare_attack(server.model, server.loss,
                                                cfg.attack, setup)
    rec, stats = attacker.reconstruct(payloads, shared, server.secrets)
    metrics = breaching.analysis.report(rec, true_data, payloads, server.model,
                                        cfg_case=cfg.case, setup=setup)
    assert metrics["token_acc"] > 0.5, metrics


def test_canine_tokenizer_offline():
    """The reference's 'character' tokenizer is CanineTokenizer (reference
    datasets_text.py:142) — pure unicode codepoints, offline-constructible."""
    from breaching_tpu.cases.data.datasets_text import tokenizer_for
    from breaching_tpu.config.loader import ConfigNode

    cfg = ConfigNode(tokenizer="canine", vocab_size=1114112, path="~/data")
    tok = tokenizer_for(cfg)
    ids = tok.encode("Hi!").ids
    assert ids == [ord("H"), ord("i"), ord("!")]
    assert tok.vocab_size == 1114112
    assert "Hi!" in tok.decode(ids)
