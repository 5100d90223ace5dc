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
