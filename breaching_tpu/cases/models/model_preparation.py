"""Model factory: name -> (JaxModel, loss_fn).

Counterpart of the reference's construct_model dispatch
(reference: breaching/cases/models/model_preparation.py:17-39, vision dispatch
163-405). Models here are pure flax modules wrapped in a `JaxModel`, which owns
the (params, buffers) pytrees and a pure `apply` function — the functional
equivalent of a torch Module with its state baked in. The server payload and
attacker both operate directly on these pytrees.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .losses import LOSSES, CrossEntropyLoss
from .resnets import build_resnet
from .vision_nets import (
    CNN6,
    ConvNet,
    ConvNetSmall,
    LeNetZhu,
    LinearModel,
    MLP,
    NoneModel,
)


@dataclasses.dataclass
class JaxModel:
    """A model as pure data: flax module + parameter/buffer pytrees + metadata.

    apply(params, buffers, inputs, train, capture) -> (outputs, aux) where aux may
    contain 'batch_stats' (updated running statistics, train mode) and
    'intermediates' (sown bn_stats / features, capture mode). This replaces the
    reference's stateful nn.Module + forward hooks.
    """

    name: str
    module: Any
    params: dict
    buffers: dict
    modality: str = "vision"
    head_path: tuple = ("head",)
    input_example: Optional[jnp.ndarray] = None
    # architecture-specific hooks, preserved across dataclasses.replace:
    bn_train: bool = False
    rgap_layers: Optional[list] = None       # R-GAP recursion plan (cnn6)
    april_refs: Optional[Callable] = None    # APRIL pytree accessors (ViT)
    april_retile: Optional[Callable] = None  # APRIL patch re-tiling (ViT)
    aux: Optional[dict] = None               # free-form extras (text registries etc.)

    def apply(self, params, buffers, inputs, train: bool = False, capture: bool = False):
        variables = {"params": params}
        if buffers:
            variables["batch_stats"] = buffers
        mutable = []
        if train and buffers:
            mutable.append("batch_stats")
        if capture:
            mutable.append("intermediates")
        if mutable:
            outputs, updated = self.module.apply(variables, inputs, train=train, mutable=mutable)
            return outputs, dict(updated)
        outputs = self.module.apply(variables, inputs, train=train)
        return outputs, {}

    def init_state(self, key, input_example=None):
        """(Re)initialize parameters and buffers; returns fresh pytrees."""
        example = input_example if input_example is not None else self.input_example
        variables = self.module.init(key, example, train=False)
        params = variables.get("params", {})
        buffers = variables.get("batch_stats", {})
        return jax.tree_util.tree_map(jnp.asarray, dict(params)), dict(buffers)

    def head_grads(self, grads):
        """Return (weight_grad[out, in], bias_grad[out]) of the classification head.

        flax Dense kernels are (in, out); the transpose presents them in the
        (out, in) convention the label-recovery literature uses
        (reference: base_attack.py:305-475 assumes last two gradient entries).
        """
        node = grads
        for key in self.head_path:
            node = node[key]
        if not isinstance(node, dict) or ("embedding" in node and "kernel" not in node):
            # tied-decoder text model: the head weight IS the embedding
            # (vocab, dim), already in (out, in) convention; its bias is a
            # separate parameter — or absent entirely (HF GPT-2).
            weight = node if not isinstance(node, dict) else node["embedding"]
            bias = grads.get("decoder_bias")
            if bias is None:
                bias = jnp.zeros((weight.shape[0],), weight.dtype)
            return weight, bias
        if "kernel" not in node:  # wrapped Dense submodule
            node = node.get("dense", node.get("transform", node))
            if "kernel" not in node and "decoder" in node:
                node = node["decoder"]
        return jnp.transpose(node["kernel"]), node["bias"]

    @property
    def has_batchnorm(self):
        return bool(self.buffers)

    def __repr__(self):
        num_params = sum(x.size for x in jax.tree_util.tree_leaves(self.params))
        num_buffers = sum(x.size for x in jax.tree_util.tree_leaves(self.buffers))
        return f"JaxModel({self.name}, {num_params} parameters, {num_buffers} buffer entries)"


def construct_model(cfg_model, cfg_data, pretrained: bool = False, key=None):
    """Build (model, loss_fn) from a model name and data config.

    Note on `pretrained`: the reference downloads torchvision/timm/HF checkpoints
    (model_preparation.py:170, 194-214); in this offline TPU build, checkpoint
    loading is supported through `load_pretrained_npz` if a converted .npz exists
    on disk, otherwise initialization is used.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if cfg_data.modality == "text":
        from .language_models import construct_text_model

        return construct_text_model(cfg_model, cfg_data, key=key, pretrained=pretrained)

    channels, height, width = cfg_data.shape
    classes = cfg_data.classes
    name = str(cfg_model)
    lname = name.lower()

    if "resnet" in lname and "wsl" not in lname and "swsl" not in lname \
            and "ssl" not in lname and "moco" not in lname:
        module = build_resnet(name, channels, classes, is_imagenet_data="ImageNet" in cfg_data.name)
    elif any(tag in lname for tag in ("wsl", "swsl", "ssl", "moco")):
        # reference loads WSL/SWSL/MoCo pretrained resnets from torch.hub
        # (model_preparation.py:193-214); offline, these map to the matching
        # ResNet architecture (resnext group-width variations are approximated).
        depth = "101" if "101" in lname else "50"
        module = build_resnet(f"resnet{depth}", channels, classes, is_imagenet_data=True)
    elif "densenet" in lname:
        from .densenets import DenseNet, densenet_depths_to_config

        growth, blocks, init_feats = densenet_depths_to_config(
            int("".join(filter(str.isdigit, lname))))
        module = DenseNet(growth_rate=growth, block_config=blocks,
                          num_init_features=init_feats, num_classes=classes,
                          stem="ImageNet" if "ImageNet" in cfg_data.name else "CIFAR")
    elif "vgg" in lname:
        from .vgg import VGG

        module = VGG(plan_name=name, num_classes=classes,
                     head="ImageNet" if "ImageNet" in cfg_data.name else "CIFAR")
    elif "nfnet" in lname:
        from .nfnets import NFNet, nfnet_params

        variant = next((v for v in nfnet_params if v.lower() in lname), "F0")
        module = NFNet(num_classes=classes, variant=variant,
                       stem="ImageNet" if "ImageNet" in cfg_data.name else "CIFAR")
    elif lname == "convnet-trivial":
        from .vision_nets import ConvNetTrivial

        module = ConvNetTrivial(num_classes=classes)
    elif lname == "convnet_beyond":
        from .vision_nets import ConvNetBeyond

        module = ConvNetBeyond(num_classes=classes)
    elif lname == "convnetsmall":
        module = ConvNetSmall(width=256, num_classes=classes)
    elif lname.startswith("convnetsmall"):  # convnetsmall16 etc: width-parameterized
        module = ConvNetSmall(width=int("".join(filter(str.isdigit, lname))), num_classes=classes)
    elif lname == "convnet":
        module = ConvNet(width=64, num_classes=classes)
    elif lname.startswith("convnet"):  # convnet64 etc: width-parameterized
        digits = "".join(filter(str.isdigit, lname))
        module = ConvNet(width=int(digits) if digits else 64, num_classes=classes)
    elif lname == "lenet_zhu" or lname == "lenetzhu":
        module = LeNetZhu(num_classes=classes)
    elif lname == "cnn6":
        module = CNN6(num_classes=classes)
    elif lname == "mlp":
        module = MLP(num_classes=classes)
    elif lname == "linear":
        module = LinearModel(num_classes=classes)
    elif lname == "none":
        module = NoneModel(num_classes=classes)
    elif "vit" in lname:
        from .vit import build_vit

        module = build_vit(name, classes)
    else:
        raise ValueError(f"Unknown vision model {cfg_model}.")

    example = jnp.zeros((1, height, width, channels), jnp.float32)
    model = JaxModel(name=name, module=module, params={}, buffers={}, input_example=example)
    model.params, model.buffers = model.init_state(key, example)

    if "vit" in lname:
        from .vit import vit_april_refs, vit_april_retile

        model.april_refs = vit_april_refs
        model.april_retile = lambda patches: vit_april_retile(patches, module.patch_size)

    if lname == "cnn6":
        # Recursion plan for the R-GAP attack: alternating conv/leakyrelu stack.
        model.rgap_layers = [
            dict(path=(f"conv{i}", "conv"), features=f, kernel=k, stride=s, padding=p, slope=0.2)
            for i, (f, k, s, p) in enumerate(CNN6.SPECS)
        ]

    if pretrained:
        _maybe_load_pretrained(model, cfg_data)

    loss_cls = LOSSES.get(getattr(cfg_data, "task", "classification"), CrossEntropyLoss)
    return model, loss_cls()


def load_flat_state(model: JaxModel, flat: dict, strict: bool = False) -> int:
    """Restore params/buffers from a flat `{"params/a/b": array}` mapping
    (the layout written by tools/convert_checkpoint.py). Returns the number of
    leaves replaced; with strict=True, raises if any leaf has no entry or an
    entry has the wrong shape."""
    replaced = 0

    def restore(tree, prefix):
        nonlocal replaced

        def pick(kp, leaf):
            nonlocal replaced
            key = prefix + "/".join(str(getattr(k, "key", k)) for k in kp)
            if key not in flat:
                if strict:
                    raise KeyError(f"Checkpoint has no entry for {key}.")
                return leaf
            value = jnp.asarray(flat[key])
            if value.shape != leaf.shape:
                raise ValueError(f"Checkpoint leaf {key} has shape {value.shape}, "
                                 f"model expects {leaf.shape}.")
            replaced += 1
            return value.astype(leaf.dtype)

        return jax.tree_util.tree_map_with_path(pick, tree)

    model.params = restore(model.params, "params/")
    model.buffers = restore(model.buffers, "buffers/")
    return replaced


def _maybe_load_pretrained(model: JaxModel, cfg_data) -> None:
    """Load converted pretrained weights from <data.path>/checkpoints/<name>.npz
    or, as a fallback, the git-tracked <repo>/assets/checkpoints/<name>.npz.

    The repo-local fallback exists because this environment's data directory is
    ephemeral (wiped between sessions) while the in-repo-trained checkpoints are
    the basis of every `trained (in-repo)` parity row — they must survive with
    the repository, not with the scratch disk.
    """
    import os

    import numpy as np

    candidates = [
        os.path.expanduser(os.path.join(str(cfg_data.path), "checkpoints",
                                        f"{model.name}.npz")),
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))), "assets",
            "checkpoints", f"{model.name}.npz"),
    ]
    path = next((p for p in candidates if os.path.exists(p)), None)
    if path is None:
        import logging

        # The reference downloads checkpoints here (model_preparation.py:170,
        # 194-214); offline, a missing npz silently meant random init — loud
        # warning so "trained" parity runs can't be mistaken for trained ones.
        logging.getLogger(__name__).warning(
            f"pretrained=True but no checkpoint at {candidates[0]} (nor the "
            f"repo fallback {candidates[1]}); keeping random init. "
            f"Produce one with tools/train_model.py or tools/convert_checkpoint.py.")
        return
    import logging

    try:
        replaced = load_flat_state(model, dict(np.load(path)))
    except ValueError as err:
        # A checkpoint trained for another head width (e.g. ImageNet-1000 vs
        # ImageNetAnimals-397 sharing <path>/checkpoints) must not crash the
        # case factory — warn loudly and keep random init instead.
        logging.getLogger(__name__).warning(
            f"Checkpoint at {path} does not fit this model ({err}); "
            f"keeping random init.")
        return
    logging.getLogger(__name__).info(
        f"Loaded {replaced} pretrained tensors for {model.name} from {path}.")
