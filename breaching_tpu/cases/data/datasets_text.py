"""Text datasets: tokenized sequences with federated partitions.

Counterpart of reference breaching/cases/data/datasets_text.py. This environment
has no network egress, so the HF-download-backed corpora (wikitext, stackoverflow,
shakespeare, cola) fall back to a deterministic *synthetic corpus*: Zipf-distributed
token sequences with local bigram structure, generated lazily per index. Real data
is used when a `<path>/<name>_<split>.npz` file with an `input_ids[N, T]` array
exists on disk. `random-tokens` (reference: datasets_text.py:60-64) is uniform by
construction.

The partition is "given": each user owns a contiguous range of sequences
(the reference uses natural article/author splits). For the TFF corpora
(stackoverflow/shakespeare) a `<path>/<name>.sqlite` database in the TFF schema
provides the reference's *natural per-client partition* (reference
datasets_text.py:326-361): user_idx selects a client, whose texts are tokenized
and grouped into blocks on the fly (see tff_sqlite.py for the format).
"""

from __future__ import annotations

import os
from types import SimpleNamespace

import numpy as np

from .datasets_vision import _stable_seed

_ZM_CDF_CACHE: dict = {}


def _zipf_mandelbrot_cdf(vocab_size: int, a: float = 1.1, b: float = 2.7) -> np.ndarray:
    """Cumulative rank-frequency distribution P(r) ~ 1/(r+b)^a over the vocab."""
    key = (vocab_size, a, b)
    if key not in _ZM_CDF_CACHE:
        w = 1.0 / (np.arange(1, vocab_size + 1) + b) ** a
        cdf = np.cumsum(w)
        cdf /= cdf[-1]
        _ZM_CDF_CACHE[key] = cdf
    return _ZM_CDF_CACHE[key]


class CharTokenizer:
    """Character-level tokenizer: printable ASCII 32..126 -> 1..95 (clamped to
    vocab-1), everything else -> 0 (<unk>). Deterministic offline counterpart of
    the reference's CanineTokenizer option (reference datasets_text.py:141-142,
    which needs a network fetch of google/canine-c)."""

    def __init__(self, vocab_size: int):
        self.vocab_size = int(vocab_size)

    def encode(self, text: str):
        ids = [min(ord(c) - 31, self.vocab_size - 1) if 32 <= ord(c) <= 126 else 0
               for c in text]
        return SimpleNamespace(ids=ids)

    def get_vocab_size(self) -> int:
        return self.vocab_size


def tokenizer_for(cfg_data, lines=None):
    """Resolve cfg.data.tokenizer to an object with `.encode(text).ids`.

    word-level: cached `<path>/cache/word-tokenizer_<vocab>.json` if present,
    else trained on `lines` (the reference trains on ag_news/wikitext downloads,
    reference wordlevel_tokenizer.py:23-50 — unavailable offline).
    """
    name = str(cfg_data.tokenizer)
    if name == "character":
        return CharTokenizer(cfg_data.vocab_size)
    if name == "canine":
        # the reference's "character" tokenizer is CanineTokenizer (reference
        # datasets_text.py:142) — pure unicode codepoints, constructible fully
        # OFFLINE (no vocab files); ids are ord(char) + special codepoints
        from transformers import CanineTokenizer

        class _CanineAdapter:
            def __init__(self):
                self._tok = CanineTokenizer()
                self.vocab_size = self._tok.vocab_size

            def encode(self, text):
                ids = self._tok(text, add_special_tokens=False)["input_ids"]
                return type("Enc", (), {"ids": ids})()

            def decode(self, ids):
                return self._tok.decode(ids)

        return _CanineAdapter()
    if name == "word-level":
        from tokenizers import Tokenizer

        from .wordlevel_tokenizer import generate_word_level_tokenizer

        path = os.path.expanduser(os.path.join(
            str(cfg_data.path), "cache", f"word-tokenizer_{cfg_data.vocab_size}.json"))
        if os.path.isfile(path):
            return Tokenizer.from_file(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        return generate_word_level_tokenizer(
            lines=lines, vocab_size=int(cfg_data.vocab_size), save_path=path)
    raise ValueError(f"Tokenizer {name} requires a network fetch; pre-tokenize "
                     f"to npz with prepare_text_data.py instead.")


class TextDataset:
    def __init__(self, cfg_data, split: str, indices=None):
        self.cfg = cfg_data
        self.name = cfg_data.name
        self.split = split
        self.seq_len = int(cfg_data.shape[0])
        self.vocab_size = int(cfg_data.vocab_size)
        self.task = cfg_data.task
        self.mlm_probability = float(cfg_data.get("mlm_probability", 0.15) or 0.15)

        self._raw, self._raw_labels = self._load_real(cfg_data, split)
        if self._raw is not None:
            self._size = len(self._raw)
        else:
            self._size = min(int(cfg_data.size), 200_000)
        self.indices = np.arange(self._size) if indices is None else np.asarray(indices)

    @staticmethod
    def _load_real(cfg_data, split):
        """Returns (input_ids, labels-or-None); decoded ONCE — __getitem__
        indexes the in-memory arrays (a per-sample np.load of the npz costs a
        zip open + full decompress on this 1-core host)."""
        path = os.path.expanduser(os.path.join(str(cfg_data.path), f"{cfg_data.name}_{split}.npz"))
        if os.path.exists(path):
            z = np.load(path)
            labels = z["labels"] if "labels" in z.files else None
            return z["input_ids"], labels
        return None, None

    def _real_class_label(self, gidx: int):
        """Sequence-level class label from the on-disk npz, if it ships one.

        Only meaningful for datasets whose _raw came from _load_real — for
        from_input_ids wrappers (in-memory TFF client shards) _raw_labels is
        None, so an unrelated same-named npz can never mispair labels."""
        if self._raw_labels is not None:
            return np.int64(self._raw_labels[gidx])
        return None

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx: int):
        gidx = int(self.indices[idx])
        if self._raw is not None:
            ids = self._raw[gidx][: self.seq_len].astype(np.int64)
        else:
            ids = self._synthesize(gidx)
        labels = self._labels_for(ids, gidx)
        return dict(input_ids=ids, labels=labels)

    def _synthesize(self, gidx: int) -> np.ndarray:
        rng = np.random.default_rng(_stable_seed(self.name, self.split, gidx))
        if self.name == "random-tokens":
            return rng.integers(0, self.vocab_size, self.seq_len, dtype=np.int64)
        # Zipf-Mandelbrot unigram (P(rank r) ~ 1/(r+2.7)^1.1, the rank-frequency
        # law of natural English) with a bigram drift: token_{t+1} is near
        # token_t with probability 0.3, giving local structure for matching
        # attacks. The exponent/offset are chosen so repeat statistics match
        # real wikitext at BPE granularity (~11% of positions in a 32-token
        # block hold a token that repeats within the block, top token ~2x) —
        # a plain zipf(1.3) makes 44% of positions repeats (top token ~6x),
        # far harder than the reference's real-wikitext setting and previously
        # the cap on Decepticon positional accuracy.
        cdf = _zipf_mandelbrot_cdf(self.vocab_size)
        ids = np.searchsorted(cdf, rng.uniform(size=self.seq_len)).astype(np.int64)
        for t in range(1, self.seq_len):
            if rng.uniform() < 0.3:
                ids[t] = (ids[t - 1] + rng.integers(1, 17)) % self.vocab_size
        return ids

    def _labels_for(self, ids: np.ndarray, gidx: int) -> np.ndarray:
        if self.task == "classification":
            # GLUE-style sequence classification (reference datasets_text.py:114
            # pulls the dataset's label column). Real data: `labels` array in the
            # npz. Synthetic fallback: a deterministic content-derived label so
            # training is learnable and label-recovery attacks are meaningful —
            # class = parity of the low-rank-token count (depends on every
            # position, like real linguistic acceptability).
            real = self._real_class_label(gidx) if self._raw is not None else None
            if real is not None:
                return real
            classes = int(self.cfg.get("classes", 2) or 2)
            return np.int64(int((ids < self.vocab_size // 8).sum()) % classes)
        if self.task == "masked-lm" and not self.cfg.get("disable_mlm", False):
            rng = np.random.default_rng(_stable_seed("mlm", self.name, gidx))
            labels = np.full_like(ids, -100)
            mask = rng.uniform(size=len(ids)) < self.mlm_probability
            labels[mask] = ids[mask]
            return labels
        return ids.copy()

    def subset(self, indices):
        view = TextDataset.__new__(TextDataset)
        view.__dict__.update(self.__dict__)
        view.indices = self.indices[np.asarray(indices)]
        return view

    @classmethod
    def from_input_ids(cls, cfg_data, split: str, input_ids: np.ndarray):
        """Wrap an in-memory [N, T] token array (TFF sqlite clients)."""
        self = cls.__new__(cls)
        self.cfg = cfg_data
        self.name = cfg_data.name
        self.split = split
        self.seq_len = int(cfg_data.shape[0])
        self.vocab_size = int(cfg_data.vocab_size)
        self.task = cfg_data.task
        self.mlm_probability = float(cfg_data.get("mlm_probability", 0.15) or 0.15)
        self._raw = np.asarray(input_ids, np.int64)
        self._raw_labels = None
        self._size = len(self._raw)
        self.indices = np.arange(self._size)
        return self


def _build_tff_dataset(cfg_data, db_path: str, user_idx: int,
                       return_full_dataset: bool):
    """Natural per-client partition from a TFF-schema sqlite database
    (reference datasets_text.py:326-361; full dataset = first 250 clients,
    reference :204-209)."""
    from ..data.prepare_text_data import tokenize_and_group
    from .tff_sqlite import TFF_TEXT_FIELDS, load_client_texts, tff_split_name

    split = cfg_data.examples_from_split
    split_name = tff_split_name(cfg_data.name, split)
    field = TFF_TEXT_FIELDS[cfg_data.name]
    if return_full_dataset:
        from .tff_sqlite import client_ids

        texts = []
        for idx in range(min(len(client_ids(db_path, split_name)), 250)):
            texts.extend(load_client_texts(db_path, idx, split_name, field))
    else:
        texts = load_client_texts(db_path, int(user_idx or 0), split_name, field)
    if not texts:
        raise ValueError(f"This user does not exist or has no data in {db_path}.")
    ids = tokenize_and_group(texts, tokenizer_for(cfg_data, texts), int(cfg_data.shape[0]))
    return TextDataset.from_input_ids(cfg_data, split, ids)


def build_text_dataset(cfg_data, user_idx: int, return_full_dataset: bool = False):
    db_path = os.path.expanduser(os.path.join(
        str(cfg_data.path), f"{cfg_data.name}.sqlite"))
    if cfg_data.name in ("stackoverflow", "shakespeare") and os.path.exists(db_path):
        return _build_tff_dataset(cfg_data, db_path, user_idx, return_full_dataset)
    full = TextDataset(cfg_data, split=cfg_data.examples_from_split)
    if return_full_dataset:
        return full
    num_users = int(cfg_data.default_clients)
    per_user = max(len(full) // num_users, 1)
    if user_idx is None:
        user_idx = 0
    if user_idx >= num_users or user_idx * per_user >= len(full):
        raise ValueError(f"user_idx {user_idx} exceeds the {num_users} text users.")
    indices = np.arange(user_idx * per_user, min((user_idx + 1) * per_user, len(full)))
    return full.subset(indices)
