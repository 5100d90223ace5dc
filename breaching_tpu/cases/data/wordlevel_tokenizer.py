"""Word-level tokenizer generation (reference: breaching/cases/data/wordlevel_tokenizer.py:23-50).

The reference trains a HF WordLevel tokenizer on ag_news/wikitext downloads; this
offline variant trains on any iterable of text lines (or a deterministic synthetic
corpus) using the local `tokenizers` library.
"""

from __future__ import annotations


def generate_word_level_tokenizer(lines=None, vocab_size: int = 10_004, save_path=None):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    if lines is None:
        import numpy as np

        rng = np.random.default_rng(0)
        words = [f"word{i}" for i in range(vocab_size * 2)]
        lines = [" ".join(rng.choice(words, size=16)) for _ in range(2000)]

    tokenizer = Tokenizer(models.WordLevel(unk_token="<unk>"))
    tokenizer.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.WordLevelTrainer(
        vocab_size=vocab_size, special_tokens=["<unk>", "<pad>", "<bos>", "<eos>"])
    tokenizer.train_from_iterator(lines, trainer)
    if save_path:
        tokenizer.save(str(save_path))
    return tokenizer
