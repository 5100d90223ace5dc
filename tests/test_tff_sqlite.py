"""TFF sqlite client-data backend: pure-python tf.Example codec + natural
per-client partition (reference breaching/cases/data/datasets_text.py:262-392)."""

import numpy as np
import pytest

import breaching_tpu as breaching
from breaching_tpu.cases.data.tff_sqlite import (
    client_ids,
    create_tff_database,
    encode_tf_example,
    load_client_texts,
    parse_tf_example,
    tff_split_name,
)


def test_tf_example_codec_roundtrip():
    features = {
        "snippets": ["to be or not to be", "that is the question"],
        "score": [3, -7, 2**40],
        "weight": [0.5, -1.25],
    }
    decoded = parse_tf_example(encode_tf_example(features))
    assert [v.decode() for v in decoded["snippets"]] == features["snippets"]
    assert decoded["score"] == features["score"]
    np.testing.assert_allclose(decoded["weight"], features["weight"])


def test_split_name_mapping():
    assert tff_split_name("stackoverflow", "training") == "train"
    assert tff_split_name("stackoverflow", "validation") == "heldout"
    assert tff_split_name("shakespeare", "validation") == "test"
    with pytest.raises(ValueError):
        tff_split_name("stackoverflow", "nonsense")


def _make_shakespeare_db(path):
    rows = []
    speeches = {
        "THE_KING": ["o for a muse of fire that would ascend " * 6],
        "FOOL": ["truly thou art damned like an ill roasted egg " * 6],
        "WITCH_3": ["double double toil and trouble fire burn " * 6],
    }
    for client, lines in speeches.items():
        for line in lines:
            rows.append((client, "train", {"snippets": [line]}))
    rows.append(("THE_KING", "test", {"snippets": ["held out speech " * 8]}))
    return create_tff_database(str(path / "shakespeare.sqlite"), rows), speeches


def test_client_partition_through_pipeline(tmp_path):
    db_path, speeches = _make_shakespeare_db(tmp_path)
    assert client_ids(db_path, "train") == list(speeches)
    assert load_client_texts(db_path, 1, "train", "snippets")[0].startswith("truly")
    with pytest.raises(ValueError):
        load_client_texts(db_path, 99, "train", "snippets")

    cfg = breaching.get_config([
        "case=10_causal_lang_training", "case/data=shakespeare",
        f"case.data.path={tmp_path}", "case.data.shape=[16]",
        "case.data.tokenizer=character", "case.data.name=shakespeare",
        "case.data.vocab_size=90", "case.user.num_data_points=1",
    ])
    loaders = [
        breaching.cases.construct_dataloader(cfg.case.data, cfg.case.impl, user_idx=i)
        for i in range(3)
    ]
    batches = [next(iter(loader)) for loader in loaders]
    for batch in batches:
        assert batch["input_ids"].shape[1] == 16
        assert batch["input_ids"].dtype == np.int64
        assert 0 <= batch["input_ids"].min() and batch["input_ids"].max() < 90
    # natural partition: different clients own different text
    assert not np.array_equal(batches[0]["input_ids"], batches[1]["input_ids"])

    full = breaching.cases.construct_dataloader(
        cfg.case.data, cfg.case.impl, user_idx=0, return_full_dataset=True)
    assert len(full.dataset) >= sum(len(next(iter(ld)).get("input_ids", []))
                                    for ld in loaders)


def test_stackoverflow_wordlevel(tmp_path):
    rows = [("user_a", "train",
             {"tokens": ["how do i invert a gradient in jax " * 4],
              "score": [5], "tags": ["jax"], "title": ["inverting"],
              "type": ["question"], "creation_date": ["2021-01-01"]}),
            ("user_b", "train",
             {"tokens": ["use jacobian vector products for the inversion " * 4]})]
    create_tff_database(str(tmp_path / "stackoverflow.sqlite"), rows)
    cfg = breaching.get_config([
        "case=10_causal_lang_training", "case/data=stackoverflow",
        f"case.data.path={tmp_path}", "case.data.shape=[8]",
        "case.data.tokenizer=word-level", "case.data.name=stackoverflow",
        "case.data.vocab_size=32",
    ])
    loader = breaching.cases.construct_dataloader(cfg.case.data, cfg.case.impl,
                                                  user_idx=1)
    ids = next(iter(loader))["input_ids"]
    assert ids.shape[1] == 8 and ids.max() < 32
