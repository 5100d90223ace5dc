"""In-repo trainer (tools/train_model.py): loss decreases, checkpoint loads.

This is the offline stand-in for the reference's pretrained-checkpoint
downloads (reference model_preparation.py:170, 194-214): a trained npz written
by the trainer must be picked up by `pretrained=True` model construction.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import breaching_tpu as breaching  # noqa: E402
from breaching_tpu.cases.models.model_preparation import construct_model  # noqa: E402


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from tools.train_model import TRAIN_DEFAULTS, train

    out_dir = tmp_path_factory.mktemp("ckpt")
    cfg = breaching.get_config([
        "case=1_single_image_small",
        "case.model=ConvNetSmall16",
        "case.data.shape=[3, 16, 16]",
        "case.data.classes=10",
        # the CIFAR10 train augmentations assume 32x32 (RandomCrop 32)
        "case.data.augmentations_train=None",
    ])
    tr = dict(TRAIN_DEFAULTS, epochs=2, batch_size=32, limit=256, lr=0.05,
              eval_batches=2, out=str(out_dir / "ConvNetSmall16.npz"))
    path = train(cfg, tr)
    return cfg, path


def test_training_reduces_loss(trained, capsys=None):
    cfg, path = trained
    assert os.path.exists(path)
    flat = dict(np.load(path))
    assert any(k.startswith("params/") for k in flat)


def test_checkpoint_loads_via_pretrained_path(trained):
    cfg, path = trained
    # stage the npz where _maybe_load_pretrained looks for it
    ckpt_dir = os.path.expanduser(os.path.join(str(cfg.case.data.path), "checkpoints"))
    os.makedirs(ckpt_dir, exist_ok=True)
    staged = os.path.join(ckpt_dir, "ConvNetSmall16.npz")
    import shutil

    shutil.copy(path, staged)
    try:
        fresh, _ = construct_model("ConvNetSmall16", cfg.case.data)
        loaded, _ = construct_model("ConvNetSmall16", cfg.case.data, pretrained=True)
        flat = dict(np.load(path))
        # the loaded model must match the checkpoint, not the random init
        from tools.train_model import dump_flat_state

        flat_loaded = dump_flat_state(loaded)
        flat_fresh = dump_flat_state(fresh)
        same_as_ckpt = sum(np.allclose(flat_loaded[k], flat[k]) for k in flat)
        assert same_as_ckpt == len(flat)
        assert any(not np.allclose(flat_fresh[k], flat[k]) for k in flat
                   if k.startswith("params/"))
    finally:
        os.remove(staged)


def test_pretrained_without_checkpoint_warns(trained, caplog):
    import logging

    cfg, _ = trained
    with caplog.at_level(logging.WARNING):
        construct_model("ConvNetSmall16", cfg.case.data, pretrained=True)
    assert any("keeping random init" in r.message for r in caplog.records)


def test_trained_model_fits_train_split(trained):
    # the 2-epoch run on 256 examples must beat chance on its own train data
    cfg, path = trained
    import jax.numpy as jnp

    from breaching_tpu.cases.data.data_preparation import construct_dataloader
    from breaching_tpu.cases.models.model_preparation import load_flat_state

    model, _ = construct_model("ConvNetSmall16", cfg.case.data)
    load_flat_state(model, dict(np.load(path)))
    cfg.case.data.examples_from_split = "training"
    cfg.case.data.partition = "none"
    cfg.case.data.batch_size = 64
    loader = construct_dataloader(cfg.case.data, cfg.case.impl, 0,
                                  return_full_dataset=True)
    batch = next(iter(loader))
    logits, _ = model.apply(model.params, model.buffers,
                            jnp.asarray(batch["inputs"]), train=False)
    acc = float((jnp.argmax(logits, -1) == jnp.asarray(batch["labels"])).mean())
    assert acc > 0.2, f"trained model at chance level ({acc:.3f})"


def test_resume_continues_from_checkpoint(trained):
    """train.resume=1 must start from the saved weights, not random init."""
    from tools.train_model import TRAIN_DEFAULTS, dump_flat_state, train

    cfg, path = trained
    before = dict(np.load(path))
    tr = dict(TRAIN_DEFAULTS, epochs=1, batch_size=32, limit=64, lr=0.0,
              eval_batches=0, out=path, resume=1, weight_decay=0.0,
              momentum=0.0)
    train(cfg, tr)  # lr=0, wd=0: a resumed no-op epoch must keep the weights
    after = dict(np.load(path))
    for k in before:
        if k.startswith("params/"):
            np.testing.assert_allclose(after[k], before[k], atol=1e-6,
                                       err_msg=k)


def test_checkpoint_loads_via_assets_fallback(trained):
    """When <data.path>/checkpoints/ has no npz, _maybe_load_pretrained must
    fall back to the git-tracked <repo>/assets/checkpoints/ (the scratch data
    dir is ephemeral in this environment; the in-repo-trained checkpoints
    behind the 'trained (in-repo)' parity rows live with the repository)."""
    import shutil

    cfg, path = trained
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assets_dir = os.path.join(repo, "assets", "checkpoints")
    os.makedirs(assets_dir, exist_ok=True)
    staged = os.path.join(assets_dir, "ConvNetSmall16.npz")
    shutil.copy(path, staged)
    try:
        loaded, _ = construct_model("ConvNetSmall16", cfg.case.data, pretrained=True)
        from tools.train_model import dump_flat_state

        flat = dict(np.load(path))
        flat_loaded = dump_flat_state(loaded)
        assert all(np.allclose(flat_loaded[k], flat[k]) for k in flat)
    finally:
        os.remove(staged)
