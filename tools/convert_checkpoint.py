"""Convert pretrained torch checkpoints to the npz layout breaching-tpu loads.

The reference downloads torchvision/timm/HF checkpoints at construction time
(reference: breaching/cases/models/model_preparation.py:170, 194-214). This
offline build instead reads `<data.path>/checkpoints/<model>.npz` written by
this tool (`_maybe_load_pretrained`, cases/models/model_preparation.py), where
the npz holds flat keys `params/<slash/joined/pytree/path>` and
`buffers/<path>` in the flax layout (conv kernels HWIO, dense kernels (in,out),
NHWC activations).

Supported source layouts:
- torchvision ResNets    (resnet18/34/50/101/152, ImageNet stem)
- torchvision DenseNets  (densenet121/161/169/201)
- torchvision VGGs       (vgg11/13/16/19, plain or _bn, ImageNet head)
- timm ViTs              (vit_base_patch16_224-style state dicts)
- HuggingFace LMs        (gpt2 / bert local checkpoint dirs, converted through
                          the matching Flax class with from_pt=True)

Forward-output equivalence between the torch source and the converted flax
model is covered by tests/test_convert_checkpoint.py (torch CPU is available
in this image; real weights merely need to be placed on disk).

Usage:
    python tools/convert_checkpoint.py resnet18 path/to/resnet18.pth ~/data
    python tools/convert_checkpoint.py hf-gpt2 path/to/gpt2_checkpoint_dir ~/data
writes `<data_path>/checkpoints/<model>.npz`.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np


def _t_conv(w) -> np.ndarray:
    """torch conv weight (O, I, kh, kw) -> flax kernel (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _t_dense(w) -> np.ndarray:
    """torch linear weight (O, I) -> flax kernel (I, O)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w)))


def _put_norm(flat: dict, sd: dict, src: str, dst: str) -> None:
    """Map one torch BatchNorm/LayerNorm prefix onto flax params + buffers."""
    flat[f"params/{dst}/scale"] = np.asarray(sd[f"{src}.weight"])
    flat[f"params/{dst}/bias"] = np.asarray(sd[f"{src}.bias"])
    if f"{src}.running_mean" in sd:
        flat[f"buffers/{dst}/mean"] = np.asarray(sd[f"{src}.running_mean"])
        flat[f"buffers/{dst}/var"] = np.asarray(sd[f"{src}.running_var"])
        nbt = sd.get(f"{src}.num_batches_tracked")
        if nbt is not None:
            flat[f"buffers/{dst}/num_batches_tracked"] = np.asarray(nbt, np.float32)


def convert_resnet(sd: dict) -> dict:
    """torchvision ResNet state_dict -> flat npz dict.

    torchvision: conv1/bn1, layer{1..4}.{B}.(conv*/bn*/downsample.0/.1), fc.
    breaching-tpu (cases/models/resnets.py): stem_conv/stem_norm,
    stage{0..3}_block{B}.(conv*/bn*/downsample_conv/downsample_norm), head.
    """
    flat: dict = {}
    flat["params/stem_conv/conv/kernel"] = _t_conv(sd["conv1.weight"])
    _put_norm(flat, sd, "bn1", "stem_norm")
    for key in sd:
        m = re.match(r"layer(\d+)\.(\d+)\.(.+)", key)
        if not m:
            continue
        stage, block, rest = int(m.group(1)) - 1, int(m.group(2)), m.group(3)
        prefix = f"stage{stage}_block{block}"
        cm = re.match(r"conv(\d)\.weight", rest)
        if cm:
            flat[f"params/{prefix}/conv{cm.group(1)}/conv/kernel"] = _t_conv(sd[key])
        elif rest == "downsample.0.weight":
            flat[f"params/{prefix}/downsample_conv/conv/kernel"] = _t_conv(sd[key])
        elif rest.startswith("downsample.1.") and rest.endswith(".weight"):
            _put_norm(flat, sd, f"layer{stage + 1}.{block}.downsample.1",
                      f"{prefix}/downsample_norm")
        elif re.match(r"bn(\d)\.weight", rest):
            bn = rest.split(".")[0]
            _put_norm(flat, sd, f"layer{stage + 1}.{block}.{bn}", f"{prefix}/{bn}")
    flat["params/head/dense/kernel"] = _t_dense(sd["fc.weight"])
    flat["params/head/dense/bias"] = np.asarray(sd["fc.bias"])
    return flat


def convert_densenet(sd: dict) -> dict:
    """torchvision DenseNet state_dict -> flat npz dict
    (cases/models/densenets.py naming: stem_conv/stem_norm,
    block{D}_layer{L}.(norm1/conv1/norm2/conv2), transition{T}.(norm/conv),
    final_norm, head)."""
    flat: dict = {}
    flat["params/stem_conv/conv/kernel"] = _t_conv(sd["features.conv0.weight"])
    _put_norm(flat, sd, "features.norm0", "stem_norm")
    for key in sd:
        m = re.match(r"features\.denseblock(\d+)\.denselayer(\d+)\.(norm|conv)(\d)\.(.+)", key)
        if m:
            block, layer, kind, idx = (int(m.group(1)) - 1, int(m.group(2)) - 1,
                                       m.group(3), m.group(4))
            dst = f"block{block}_layer{layer}/{kind}{idx}"
            if kind == "conv":
                flat[f"params/{dst}/conv/kernel"] = _t_conv(sd[key])
            elif key.endswith(".weight"):
                _put_norm(flat, sd,
                          f"features.denseblock{block + 1}.denselayer{layer + 1}.norm{idx}",
                          dst)
            continue
        m = re.match(r"features\.transition(\d+)\.(norm|conv)\.(.+)", key)
        if m:
            t, kind = int(m.group(1)) - 1, m.group(2)
            if kind == "conv":
                flat[f"params/transition{t}/conv/conv/kernel"] = _t_conv(sd[key])
            elif key.endswith(".weight"):
                _put_norm(flat, sd, f"features.transition{t + 1}.norm", f"transition{t}/norm")
    _put_norm(flat, sd, "features.norm5", "final_norm")
    flat["params/head/dense/kernel"] = _t_dense(sd["classifier.weight"])
    flat["params/head/dense/bias"] = np.asarray(sd["classifier.bias"])
    return flat


def convert_vgg(sd: dict) -> dict:
    """torchvision VGG state_dict -> flat npz dict (cases/models/vgg.py naming:
    conv{i}/bn{i} in order of appearance, fc0/fc1/head). Works for plain and
    _bn variants: convs and norms are enumerated in features order.

    The first classifier layer reads the FLATTENED feature map, and torch
    flattens NCHW (channel-major) while the flax model flattens NHWC — its
    input rows are permuted from (C, H, W) to (H, W, C) order before the usual
    (O, I) -> (I, O) transpose. Later dense layers see 1-D activations and
    need no permutation."""
    flat: dict = {}
    conv_idx = bn_idx = last_conv_out = 0
    feature_keys = sorted(
        (int(k.split(".")[1]), k) for k in sd if k.startswith("features.") and k.endswith(".weight"))
    for _, key in feature_keys:
        src = key[: -len(".weight")]
        if np.asarray(sd[key]).ndim == 4:
            flat[f"params/conv{conv_idx}/conv/kernel"] = _t_conv(sd[key])
            if f"{src}.bias" in sd:
                flat[f"params/conv{conv_idx}/conv/bias"] = np.asarray(sd[f"{src}.bias"])
            last_conv_out = np.asarray(sd[key]).shape[0]
            conv_idx += 1
        else:  # 1-D weight in features = batchnorm
            _put_norm(flat, sd, src, f"bn{bn_idx}")
            bn_idx += 1
    first = True
    for src, dst in (("classifier.0", "fc0"), ("classifier.3", "fc1"), ("classifier.6", "head")):
        if f"{src}.weight" in sd:
            w = np.asarray(sd[f"{src}.weight"])
            if first and last_conv_out and w.shape[1] % last_conv_out == 0:
                side = int(round((w.shape[1] // last_conv_out) ** 0.5))
                if side * side * last_conv_out == w.shape[1]:
                    w = (w.reshape(w.shape[0], last_conv_out, side, side)
                         .transpose(0, 2, 3, 1).reshape(w.shape[0], -1))
                else:
                    import warnings

                    warnings.warn(
                        f"VGG fc0 input ({w.shape[1]}) is divisible by the last "
                        f"conv width ({last_conv_out}) but the feature map is "
                        f"not square — leaving the torch channel-major layout "
                        f"unpermuted; verify forward equivalence before use.")
            flat[f"params/{dst}/dense/kernel"] = _t_dense(w)
            flat[f"params/{dst}/dense/bias"] = np.asarray(sd[f"{src}.bias"])
            first = False
    return flat


def convert_vit(sd: dict) -> dict:
    """timm ViT state_dict -> flat npz dict (cases/models/vit.py naming:
    patch_embed (bare nn.Conv), cls_token, pos_embed,
    block{i}.(norm1/attn.qkv/attn.proj/norm2/mlp.fc1/mlp.fc2), norm, head)."""
    flat: dict = {
        "params/cls_token": np.asarray(sd["cls_token"]),
        "params/pos_embed": np.asarray(sd["pos_embed"]),
        "params/patch_embed/kernel": _t_conv(sd["patch_embed.proj.weight"]),
        "params/patch_embed/bias": np.asarray(sd["patch_embed.proj.bias"]),
        "params/head/kernel": _t_dense(sd["head.weight"]),
        "params/head/bias": np.asarray(sd["head.bias"]),
    }
    _put_norm(flat, sd, "norm", "norm")
    for key in sd:
        m = re.match(r"blocks\.(\d+)\.(.+)", key)
        if not m:
            continue
        i, rest = m.group(1), m.group(2)
        if rest in ("norm1.weight", "norm2.weight"):
            _put_norm(flat, sd, f"blocks.{i}.{rest[:-7]}", f"block{i}/{rest[:-7]}")
        elif rest.endswith(".weight") and rest.startswith(("attn.", "mlp.")):
            leaf = rest[: -len(".weight")].replace(".", "/").replace("attn", "attn").replace("mlp", "mlp")
            flat[f"params/block{i}/{leaf}/kernel"] = _t_dense(sd[key])
        elif rest.endswith(".bias") and rest.startswith(("attn.", "mlp.")):
            leaf = rest[: -len(".bias")].replace(".", "/")
            flat[f"params/block{i}/{leaf}/bias"] = np.asarray(sd[key])
    return flat


def convert_hf(model_dir: str, name: str) -> dict:
    """Local HuggingFace torch checkpoint dir -> flat npz of the Flax params
    consumed by the hf-gpt2/hf-bert wrappers (language_models.py:333-359).
    transformers performs the pt->flax tensor conversion; we flatten its tree."""
    if "gpt2" in name:
        from transformers import FlaxGPT2LMHeadModel as cls
    elif "bert" in name:
        from transformers import FlaxBertForMaskedLM as cls
    else:
        raise ValueError(f"Unsupported HF model {name}.")
    model = cls.from_pretrained(model_dir, from_pt=True)
    flat: dict = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (str(k),))
        else:
            flat["params/" + "/".join(path)] = np.asarray(node)

    walk(model.params, ())
    return flat


_VISION_CONVERTERS = (
    ("densenet", convert_densenet),
    ("resnet", convert_resnet),
    ("vgg", convert_vgg),
    ("vit", convert_vit),
)


def convert_state_dict(model_name: str, sd: dict) -> dict:
    lname = model_name.lower()
    for tag, fn in _VISION_CONVERTERS:
        if tag in lname:
            return fn(sd)
    raise ValueError(f"No converter for model {model_name}.")


def load_torch_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def save_npz(flat: dict, data_path: str, model_name: str) -> str:
    out_dir = os.path.expanduser(os.path.join(data_path, "checkpoints"))
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{model_name}.npz")
    np.savez(out, **flat)
    return out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    model_name, source, data_path = argv
    if model_name.startswith("hf-") or os.path.isdir(source):
        flat = convert_hf(source, model_name)
    else:
        flat = convert_state_dict(model_name, load_torch_state_dict(source))
    out = save_npz(flat, data_path, model_name)
    print(f"Wrote {len(flat)} tensors to {out}.")


if __name__ == "__main__":
    main()
