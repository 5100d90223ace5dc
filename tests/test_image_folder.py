"""ImageFolder backend: lazy decode of a torchvision-layout directory tree."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from breaching_tpu.cases.data.datasets_vision import VisionDataset, _load_image_folder


class _Cfg(dict):
    __getattr__ = dict.__getitem__

    def get(self, k, d=None):
        return dict.get(self, k, d)


def _make_tree(root, n_classes=3, per_class=2, size=(40, 52)):
    for split in ("train", "val"):
        for c in range(n_classes):
            d = root / split / f"n{c:04d}"
            d.mkdir(parents=True)
            for i in range(per_class):
                arr = np.full((*size, 3), 40 * c + 10 * i, np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.JPEG")


def _cfg(root, shape=(3, 16, 16), classes=3):
    return _Cfg(name="ImageNet", path=str(root), shape=list(shape), classes=classes,
                normalize=True, mean=[0.5, 0.5, 0.5], std=[0.25, 0.25, 0.25],
                size=6, batch_size=2, partition="none", default_clients=1,
                examples_from_split="train", caching=False)


def test_image_folder_lazy_decode(tmp_path):
    _make_tree(tmp_path)
    raw = _load_image_folder(_cfg(tmp_path), "training")
    assert raw is not None
    folder, labels = raw
    assert len(folder) == 6 and list(labels) == [0, 0, 1, 1, 2, 2]
    img = folder[2]  # class 1, image 0 -> constant value 40
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    assert int(img.mean()) == 40


def test_vision_dataset_uses_folder(tmp_path):
    _make_tree(tmp_path)
    ds = VisionDataset(_cfg(tmp_path), "training")
    assert len(ds) == 6
    sample = ds[4]  # class 2 -> value 80 -> (80/255 - .5)/.25
    assert sample["labels"] == 2
    np.testing.assert_allclose(sample["inputs"].mean(), (80 / 255 - 0.5) / 0.25, atol=1e-3)


def test_missing_tree_falls_back_to_synthetic(tmp_path):
    ds = VisionDataset(_cfg(tmp_path / "nothing_here", classes=4), "training")
    assert len(ds) > 0  # synthetic backend
    assert ds[0]["inputs"].shape == (16, 16, 3)


def test_measure_mean_std(tmp_path):
    """Welford merge reproduces numpy's global per-channel stats. (The
    reference's merge has a variance bug — ds/(n_b-1) instead of ds*(n_b-1),
    _get_meanstd datasets_vision.py:190 — fixed here and verified.)"""
    from breaching_tpu.cases.data.datasets_vision import measure_mean_std

    rng = np.random.default_rng(5)
    imgs = (rng.uniform(0, 255, size=(6, 16, 16, 3))).astype(np.uint8)
    root = tmp_path
    for split in ("train",):
        for c in range(3):
            d = root / split / f"n{c:04d}"
            d.mkdir(parents=True)
            for i in range(2):
                # PNG: lossless, exact-size (the loader skips resize/crop)
                Image.fromarray(imgs[c * 2 + i]).save(d / f"img_{i}.png")
    ds = VisionDataset(_cfg(root), "training")
    mean, std = measure_mean_std(ds)
    flat = imgs.astype(np.float64).reshape(-1, 3) / 255.0
    np.testing.assert_allclose(mean, flat.mean(axis=0), atol=1e-3)
    np.testing.assert_allclose(std, flat.std(axis=0, ddof=1), atol=1e-3)
