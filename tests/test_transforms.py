"""Config-driven data augmentations (reference _parse_data_augmentations,
breaching/cases/data/datasets_vision.py:200-221)."""

import numpy as np
import pytest

from breaching_tpu.cases.data.datasets_vision import VisionDataset
from breaching_tpu.cases.data.transforms import parse_data_augmentations


class _Cfg(dict):
    __getattr__ = dict.__getitem__

    def get(self, k, d=None):
        return dict.get(self, k, d)


def _img(h=40, w=52, seed=0):
    return np.random.default_rng(seed).uniform(0, 1, (h, w, 3)).astype(np.float32)


def test_empty_config_is_identity():
    assert parse_data_augmentations(None) is None
    assert parse_data_augmentations({}) is None


def test_random_crop_with_padding_preserves_shape():
    t = parse_data_augmentations({"RandomCrop": [32, 4]})
    out = t(_img(32, 32), np.random.default_rng(0))
    assert out.shape == (32, 32, 3)


def test_horizontal_flip_probability():
    img = _img(8, 8)
    always = parse_data_augmentations({"RandomHorizontalFlip": 1.0})
    never = parse_data_augmentations({"RandomHorizontalFlip": 0.0})
    rng = np.random.default_rng(0)
    np.testing.assert_array_equal(always(img, rng), img[:, ::-1])
    np.testing.assert_array_equal(never(img, rng), img)


def test_resize_center_crop_eval_chain():
    t = parse_data_augmentations({"Resize": 36, "CenterCrop": 32})
    out = t(_img(48, 64), np.random.default_rng(0))
    assert out.shape == (32, 32, 3)


def test_random_resized_crop_target_shape():
    t = parse_data_augmentations({"RandomResizedCrop": 24})
    for seed in range(3):
        out = t(_img(), np.random.default_rng(seed))
        assert out.shape == (24, 24, 3)
        assert np.isfinite(out).all()


def test_unknown_transform_raises():
    with pytest.raises(ValueError, match="Unsupported augmentation"):
        parse_data_augmentations({"ColorJitter": 0.4})


def _cfg(**over):
    cfg = _Cfg(name="CIFAR10", path="/nonexistent", shape=[3, 16, 16], classes=4,
               normalize=False, mean=[0.0] * 3, std=[1.0] * 3, size=32,
               batch_size=2, partition="none", default_clients=1,
               examples_from_split="training", caching=False,
               augmentations_train={"RandomHorizontalFlip": 1.0},
               augmentations_val=None)
    cfg.update(over)
    return cfg


def test_vision_dataset_applies_train_augmentations():
    """Training-split samples are augmented; the flip is deterministic per
    index (seed discipline replaces torch global RNG state)."""
    plain = VisionDataset(_cfg(augmentations_train=None), "training")
    flipped = VisionDataset(_cfg(), "training")
    a, b = plain[0]["inputs"], flipped[0]["inputs"]
    np.testing.assert_array_equal(b, a[:, ::-1])
    np.testing.assert_array_equal(flipped[0]["inputs"], b)  # deterministic


def test_vision_dataset_val_split_untouched_at_target_shape():
    """Validation transforms only fire when the backend yields off-shape
    images; lazily generated target-shaped images stay un-resized."""
    ds = VisionDataset(_cfg(augmentations_val={"Resize": 20, "CenterCrop": 16}),
                       "validation")
    ref = VisionDataset(_cfg(augmentations_val=None), "validation")
    np.testing.assert_array_equal(ds[0]["inputs"], ref[0]["inputs"])
