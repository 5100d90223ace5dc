"""Config composition tests (hydra-style semantics)."""

import breaching_tpu as breaching


def test_default_compose():
    cfg = breaching.get_config([])
    assert cfg.case.name == "single_imagenet"
    assert cfg.attack.type == "invertinggradients"
    assert cfg.attack.optim.max_iterations == 24_000
    # reference case 2 composes data=ImageNetAnimals (397 animal classes)
    assert cfg.case.data.classes == 397


def test_group_swap_and_override():
    cfg = breaching.get_config(
        ["case=1_single_image_small", "attack=deepleakage",
         "case.user.num_data_points=4", "attack.optim.max_iterations=7"])
    assert cfg.case.data.name == "CIFAR10"
    assert cfg.case.model == "ConvNet"
    assert cfg.attack.attack_type == "joint-optimization"
    assert cfg.case.user.num_data_points == 4
    assert cfg.attack.optim.max_iterations == 7


def test_nested_group_swap():
    cfg = breaching.get_config(["case=1_single_image_small", "case/data=CIFAR100"])
    assert cfg.case.data.classes == 100


def test_attack_inheritance():
    cfg = breaching.get_attack_config("invertinggradients")
    # inherited from _default_optimization_attack:
    assert cfg.label_strategy == "bias-corrected"
    assert cfg.optim.langevin_noise == 0.0
    # overridden by the child:
    assert cfg.objective.type == "cosine-similarity"
    assert cfg.optim.signed == "hard"


def test_case_user_merge():
    cfg = breaching.get_case_config("1_single_image_small")
    # the case file sets provide_labels on top of the user group defaults
    assert cfg.user.provide_labels is True
    assert cfg.user.provide_buffers is False
