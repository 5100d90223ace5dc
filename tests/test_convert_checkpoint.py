"""torch->npz checkpoint converter: forward-output equivalence tests.

Real pretrained weights cannot be downloaded in this environment, so each test
builds a RANDOMLY-initialized torch model in the source layout (torchvision /
timm / HF), converts its state dict with tools/convert_checkpoint.py, loads the
result into the flax model via the production `load_flat_state` path, and
asserts the two frameworks produce the same logits on a fixed input. That
validates every name/transpose rule the converter applies; a user with real
checkpoints runs the same code path (reference downloads these at construction,
breaching/cases/models/model_preparation.py:170,194-214)."""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from convert_checkpoint import (  # noqa: E402
    convert_hf,
    convert_resnet,
    convert_vit,
    save_npz,
)
from breaching_tpu.cases.models.model_preparation import load_flat_state  # noqa: E402


def _randomize_bn_stats(module, gen):
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)


class _TorchBasicBlock(tnn.Module):
    """torchvision BasicBlock layout (conv1/bn1/conv2/bn2/downsample)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + identity)


class _TorchTinyResNet(tnn.Module):
    """torchvision ResNet layout at toy width: conv1/bn1/maxpool/layer1/layer2/fc."""

    def __init__(self, width=8, classes=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(_TorchBasicBlock(width, width, 1))
        self.layer2 = tnn.Sequential(_TorchBasicBlock(width, 2 * width, 2))
        self.fc = tnn.Linear(2 * width, classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer2(self.layer1(x))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def test_resnet_converter_forward_equivalence():
    from breaching_tpu.cases.models.resnets import ResNet

    gen = torch.Generator().manual_seed(0)
    tm = _TorchTinyResNet()
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
        _randomize_bn_stats(tm, gen)
    tm.eval()

    flat = convert_resnet({k: v.numpy() for k, v in tm.state_dict().items()})
    module = ResNet(block="basic", layers=(1, 1), num_classes=10, stem="ImageNet",
                    width=8, strides=(1, 2))
    x = np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    model = SimpleNamespace(params=variables["params"],
                            buffers=variables.get("batch_stats", {}))
    replaced = load_flat_state(model, flat, strict=True)  # every leaf must be covered
    assert replaced > 0

    logits = module.apply({"params": model.params, "batch_stats": model.buffers},
                          jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-4, atol=1e-5)


class _TorchAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x):
        B, N, D = x.shape
        hd = D // self.heads
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1) / hd ** 0.5).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(out)


class _TorchMLP(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(tnn.functional.gelu(self.fc1(x)))


class _TorchViTBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = _TorchAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TorchMLP(dim, 4 * dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _TorchPatchEmbed(tnn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, patch, patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class _TorchTinyViT(tnn.Module):
    """timm ViT layout: cls_token/pos_embed/patch_embed.proj/blocks.N/norm/head."""

    def __init__(self, dim=32, depth=2, heads=4, patch=8, img=16, classes=10):
        super().__init__()
        T = (img // patch) ** 2
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = tnn.Parameter(torch.zeros(1, T + 1, dim))
        self.patch_embed = _TorchPatchEmbed(dim, patch)
        self.blocks = tnn.Sequential(*[_TorchViTBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Linear(dim, classes)

    def forward(self, x):
        tokens = self.patch_embed(x)
        cls = self.cls_token.expand(tokens.shape[0], -1, -1)
        x = torch.cat([cls, tokens], dim=1) + self.pos_embed
        x = self.blocks(x)
        return self.head(self.norm(x)[:, 0])


def test_vit_converter_forward_equivalence():
    from breaching_tpu.cases.models.vit import VisionTransformer

    gen = torch.Generator().manual_seed(2)
    tm = _TorchTinyViT()
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    tm.eval()

    flat = convert_vit({k: v.numpy() for k, v in tm.state_dict().items()})
    module = VisionTransformer(patch_size=8, dim=32, depth=2, num_heads=4, num_classes=10)
    x = np.random.RandomState(3).randn(2, 16, 16, 3).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    model = SimpleNamespace(params=variables["params"], buffers={})
    load_flat_state(model, flat, strict=True)

    logits = module.apply({"params": model.params}, jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-4, atol=1e-5)


def test_hf_gpt2_converter_roundtrip(tmp_path):
    """Tiny random torch GPT2 -> save_pretrained -> convert_hf -> npz -> the
    production pretrained=True path of construct_text_model -> same logits."""
    transformers = pytest.importorskip("transformers")
    from transformers import GPT2Config, GPT2LMHeadModel

    from breaching_tpu.cases.models.language_models import construct_text_model
    from breaching_tpu.config.loader import ConfigNode

    config = GPT2Config(vocab_size=128, n_positions=64, n_embd=96, n_layer=3,
                        n_head=8, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    tm = GPT2LMHeadModel(config).eval()
    src = tmp_path / "gpt2_src"
    tm.save_pretrained(src)

    flat = convert_hf(str(src), "hf-gpt2")
    save_npz(flat, str(tmp_path), "hf-gpt2-tiny")

    cfg_data = ConfigNode(
        name="wikitext", modality="text", task="causal-lm", vocab_size=128,
        shape=[16], path=str(tmp_path), size=1000, classes=None,
        examples_from_split="training", partition="none", default_clients=1,
        batch_size=1, caching=False)
    model, loss_fn = construct_text_model("hf-gpt2-tiny", cfg_data, pretrained=True)

    ids = np.random.RandomState(4).randint(0, 128, size=(2, 16))
    logits, _ = model.apply(model.params, model.buffers, jnp.asarray(ids), train=False)
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-4, atol=2e-4)


def test_hf_bert_converter_roundtrip(tmp_path):
    """Tiny random torch BERT -> save_pretrained -> convert_hf -> npz -> the
    production pretrained=True path -> same MLM logits."""
    pytest.importorskip("transformers")
    from transformers import BertConfig, BertForMaskedLM

    from breaching_tpu.cases.models.language_models import construct_text_model
    from breaching_tpu.config.loader import ConfigNode

    config = BertConfig(vocab_size=128, hidden_size=96, num_hidden_layers=3,
                        num_attention_heads=8, intermediate_size=384,
                        max_position_embeddings=64, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    tm = BertForMaskedLM(config).eval()
    src = tmp_path / "bert_src"
    tm.save_pretrained(src)

    flat = convert_hf(str(src), "hf-bert")
    save_npz(flat, str(tmp_path), "hf-bert-tiny")

    cfg_data = ConfigNode(
        name="wikitext", modality="text", task="masked-lm", vocab_size=128,
        shape=[16], path=str(tmp_path), size=1000, classes=None,
        examples_from_split="training", partition="none", default_clients=1,
        batch_size=1, caching=False)
    model, loss_fn = construct_text_model("hf-bert-tiny", cfg_data, pretrained=True)

    ids = np.random.RandomState(5).randint(0, 128, size=(2, 16))
    logits, _ = model.apply(model.params, model.buffers, jnp.asarray(ids), train=False)
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids)).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-4, atol=2e-4)


class _TorchVGG11BN(tnn.Module):
    """torchvision vgg11_bn layout: features.{i} Sequential + classifier.{0,3,6}
    Linears; flatten between them is NCHW (the permutation convert_vgg must
    absorb for fc0 whenever the feature map is spatially > 1x1)."""

    def __init__(self, classes=10):
        super().__init__()
        layers, cin = [], 3
        for entry in (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"):
            if entry == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(cin, entry, 3, padding=1),
                           tnn.BatchNorm2d(entry), tnn.ReLU()]
                cin = entry
        self.features = tnn.Sequential(*layers)
        self.classifier = tnn.Sequential(
            tnn.Linear(512 * 2 * 2, 4096), tnn.ReLU(), tnn.Identity(),
            tnn.Linear(4096, 4096), tnn.ReLU(), tnn.Identity(),
            tnn.Linear(4096, classes))

    def forward(self, x):
        return self.classifier(torch.flatten(self.features(x), 1))


def test_vgg_converter_forward_equivalence():
    from breaching_tpu.cases.models.vgg import VGG
    from convert_checkpoint import convert_vgg

    gen = torch.Generator().manual_seed(0)
    tm = _TorchVGG11BN()
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        _randomize_bn_stats(tm, gen)
    tm.eval()

    flat = convert_vgg({k: v.numpy() for k, v in tm.state_dict().items()})
    module = VGG(plan_name="VGG11", num_classes=10, use_norm=True, head="ImageNet")
    # 64px input -> 2x2x512 feature map: exercises the NCHW->NHWC fc0 permutation
    x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    model = SimpleNamespace(params=variables["params"],
                            buffers=variables.get("batch_stats", {}))
    replaced = load_flat_state(model, flat, strict=True)
    assert replaced > 0

    logits = module.apply({"params": model.params, "batch_stats": model.buffers},
                          jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-3, atol=1e-4)


class _Container(tnn.Module):
    def forward(self, x):  # pragma: no cover - name container only
        raise NotImplementedError


class _TorchDenseLayer(tnn.Module):
    def __init__(self, cin, growth, bn_size):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(cin)
        self.conv1 = tnn.Conv2d(cin, bn_size * growth, 1, bias=False)
        self.norm2 = tnn.BatchNorm2d(bn_size * growth)
        self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        y = self.conv1(torch.relu(self.norm1(x)))
        y = self.conv2(torch.relu(self.norm2(y)))
        return torch.cat([x, y], 1)


class _TorchTinyDenseNet(tnn.Module):
    """torchvision DenseNet state-dict layout (features.conv0/norm0,
    denseblock{B}.denselayer{L}, transition{T}, norm5, classifier)."""

    def __init__(self, growth=4, blocks=(2, 2), init=8, bn_size=2, classes=10):
        super().__init__()
        f = _Container()
        f.conv0 = tnn.Conv2d(3, init, 7, 2, 3, bias=False)
        f.norm0 = tnn.BatchNorm2d(init)
        feats = init
        for b, n in enumerate(blocks):
            block = _Container()
            for i in range(n):
                setattr(block, f"denselayer{i + 1}",
                        _TorchDenseLayer(feats + i * growth, growth, bn_size))
            setattr(f, f"denseblock{b + 1}", block)
            feats += n * growth
            if b != len(blocks) - 1:
                tr = _Container()
                tr.norm = tnn.BatchNorm2d(feats)
                tr.conv = tnn.Conv2d(feats, feats // 2, 1, bias=False)
                setattr(f, f"transition{b + 1}", tr)
                feats //= 2
        f.norm5 = tnn.BatchNorm2d(feats)
        self.features = f
        self.classifier = tnn.Linear(feats, classes)
        self.blocks = blocks

    def forward(self, x):
        f = self.features
        x = tnn.functional.max_pool2d(torch.relu(f.norm0(f.conv0(x))), 3, 2, 1)
        for b in range(len(self.blocks)):
            block = getattr(f, f"denseblock{b + 1}")
            for i in range(self.blocks[b]):
                x = getattr(block, f"denselayer{i + 1}")(x)
            if b != len(self.blocks) - 1:
                tr = getattr(f, f"transition{b + 1}")
                x = tnn.functional.avg_pool2d(tr.conv(torch.relu(tr.norm(x))), 2)
        x = torch.relu(f.norm5(x)).mean(dim=(2, 3))
        return self.classifier(x)


def test_densenet_converter_forward_equivalence():
    from breaching_tpu.cases.models.densenets import DenseNet
    from convert_checkpoint import convert_densenet

    gen = torch.Generator().manual_seed(0)
    tm = _TorchTinyDenseNet()
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
        _randomize_bn_stats(tm, gen)
    tm.eval()

    flat = convert_densenet({k: v.numpy() for k, v in tm.state_dict().items()})
    module = DenseNet(growth_rate=4, block_config=(2, 2), num_init_features=8,
                      bn_size=2, num_classes=10, stem="ImageNet")
    x = np.random.RandomState(1).randn(2, 32, 32, 3).astype(np.float32)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    model = SimpleNamespace(params=variables["params"],
                            buffers=variables.get("batch_stats", {}))
    replaced = load_flat_state(model, flat, strict=True)
    assert replaced > 0

    logits = module.apply({"params": model.params, "batch_stats": model.buffers},
                          jnp.asarray(x), train=False)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-4, atol=1e-5)
