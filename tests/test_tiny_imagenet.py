"""TinyImageNet on-disk layout: `train/<wnid>/images/<wnid>_<n>.JPEG`,
`val/images/*` + `val_annotations.txt`, labels = sorted-wnids index
(reference breaching/cases/data/datasets_vision.py:224-350)."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from breaching_tpu.cases.data.datasets_vision import VisionDataset, _load_tiny_imagenet


class _Cfg(dict):
    __getattr__ = dict.__getitem__

    def get(self, k, d=None):
        return dict.get(self, k, d)


WNIDS = ["n02100", "n01443", "n09999"]  # unsorted on purpose in wnids.txt


def _make_tiny_tree(root, per_class=2):
    base = root / "tiny-imagenet-200"
    (base / "train").mkdir(parents=True)
    (base / "wnids.txt").write_text("\n".join(WNIDS) + "\n")
    sorted_wnids = sorted(WNIDS)
    for wnid in WNIDS:
        d = base / "train" / wnid / "images"
        d.mkdir(parents=True)
        for i in range(per_class):
            value = 50 * sorted_wnids.index(wnid) + 10 * i
            arr = np.full((64, 64, 3), value, np.uint8)
            Image.fromarray(arr).save(d / f"{wnid}_{i}.JPEG")
    val = base / "val" / "images"
    val.mkdir(parents=True)
    lines = []
    for i, wnid in enumerate(WNIDS):
        arr = np.full((64, 64, 3), 200 + i, np.uint8)
        Image.fromarray(arr).save(val / f"val_{i}.JPEG")
        lines.append(f"val_{i}.JPEG\t{wnid}\t0\t0\t62\t62")
    (base / "val" / "val_annotations.txt").write_text("\n".join(lines) + "\n")
    return base


def _cfg(root):
    return _Cfg(name="TinyImageNet", path=str(root), shape=[3, 64, 64], classes=3,
                normalize=False, mean=[0.0] * 3, std=[1.0] * 3, size=6,
                batch_size=2, partition="none", default_clients=1,
                examples_from_split="training", caching=False)


def test_train_split_labels_from_sorted_wnids(tmp_path):
    _make_tiny_tree(tmp_path)
    folder, labels = _load_tiny_imagenet(_cfg(tmp_path), "training")
    assert len(folder) == 6
    # paths glob-sorted by wnid dir; labels index into SORTED wnids
    sorted_wnids = sorted(WNIDS)
    for path, label in zip(folder.samples, labels):
        wnid = path.rsplit("/", 3)[-3]
        assert sorted_wnids[label] == wnid
        img = folder[list(folder.samples).index(path)]
        assert abs(int(img.mean()) - 50 * label) <= 12  # JPEG-lossy constant


def test_val_split_uses_annotations(tmp_path):
    _make_tiny_tree(tmp_path)
    folder, labels = _load_tiny_imagenet(_cfg(tmp_path), "validation")
    assert len(folder) == 3
    sorted_wnids = sorted(WNIDS)
    expected = [sorted_wnids.index(w) for w in WNIDS]
    assert list(labels) == expected


def test_vision_dataset_dispatches_tiny_imagenet(tmp_path):
    _make_tiny_tree(tmp_path)
    ds = VisionDataset(_cfg(tmp_path), "training")
    assert len(ds) == 6
    sample = ds[0]
    assert sample["inputs"].shape == (64, 64, 3)
    assert 0 <= sample["labels"] < 3
