"""LPIPS (Learned Perceptual Image Patch Similarity) in pure JAX.

Counterpart of the reference's torchmetrics LPIPS scorer
(reference breaching/analysis/analysis.py:217-219 reports `lpips`, and
analysis.py:332-375 orders batches with an `lpips.LPIPS(net='alex')` scorer).

The network is Zhang et al. (2018): a fixed pretrained trunk (AlexNet or VGG16
feature stacks), unit-normalized channel activations at the tap layers, squared
differences, then learned non-negative 1x1 "linear calibration" heads averaged
over space and summed over layers.

Weights cannot be downloaded in this environment, so the scorer loads a
converted `.npz` from `<data.path>/checkpoints/lpips_<net>.npz` (same convention
as model_preparation._maybe_load_pretrained) or `$BREACHING_LPIPS_WEIGHTS`.
`convert_torch_lpips` produces that file from the official `lpips` pip package
checkpoint on a machine that has it. When no weights exist on disk, `report()`
keeps `lpips=NaN` — documented, not silent.

npz key schema (all arrays HWIO for convs):
    trunk/<i>/w, trunk/<i>/b    conv weights/biases of the feature stack, in order
    lin/<k>/w                   1x1 head for tap k, shape [1,1,C_k,1]
    meta/net                    "alex" | "vgg"  (0-d string array)
    meta/shift, meta/scale      input normalization (3,)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# Trunk architectures: (out_channels, kernel, stride, padding, maxpool_before)
# Taps are after each ReLU listed in _TAPS.
_ALEX_CONVS = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]
_ALEX_TAPS = [0, 1, 2, 3, 4]  # relu1..relu5

_VGG_CONVS = [
    (64, 3, 1, 1, False), (64, 3, 1, 1, False),
    (128, 3, 1, 1, True), (128, 3, 1, 1, False),
    (256, 3, 1, 1, True), (256, 3, 1, 1, False), (256, 3, 1, 1, False),
    (512, 3, 1, 1, True), (512, 3, 1, 1, False), (512, 3, 1, 1, False),
    (512, 3, 1, 1, True), (512, 3, 1, 1, False), (512, 3, 1, 1, False),
]
_VGG_TAPS = [1, 3, 6, 9, 12]  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3

_ARCHS = {"alex": (_ALEX_CONVS, _ALEX_TAPS), "vgg": (_VGG_CONVS, _VGG_TAPS)}

# Zhang et al. input scaling (images in [-1, 1]).
_DEFAULT_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_DEFAULT_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, padding):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b.reshape(1, 1, 1, -1)


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


class LPIPS:
    """Batched LPIPS distance. Construct via `LPIPS.from_npz(path)`.

    `__call__(x, y)` takes NHWC images in [0, 1] and returns per-example
    distances [B]. `features(x)` returns the normalized tap activations used by
    the IIP 'lpips' scorer and LPIPS batch ordering.
    """

    def __init__(self, net, trunk_params, lin_params, shift=None, scale=None):
        if net not in _ARCHS:
            raise ValueError(f"Unknown LPIPS trunk {net!r}")
        self.net = net
        self.convs, self.taps = _ARCHS[net]
        self.trunk_params = trunk_params  # list of (w, b)
        self.lin_params = lin_params      # list of [1,1,C,1] (may be None -> mean)
        self.shift = jnp.asarray(_DEFAULT_SHIFT if shift is None else shift)
        self.scale = jnp.asarray(_DEFAULT_SCALE if scale is None else scale)
        self._dist = jax.jit(self._distance)
        self._feats = jax.jit(self._normalized_taps)

    # ---------------------------------------------------------------- weights

    @classmethod
    def from_npz(cls, path):
        flat = dict(np.load(path, allow_pickle=False))
        net = str(flat["meta/net"]) if "meta/net" in flat else "alex"
        convs, taps = _ARCHS[net]
        trunk = [(jnp.asarray(flat[f"trunk/{i}/w"]), jnp.asarray(flat[f"trunk/{i}/b"]))
                 for i in range(len(convs))]
        lin = [jnp.asarray(flat[f"lin/{k}/w"]) if f"lin/{k}/w" in flat else None
               for k in range(len(taps))]
        return cls(net, trunk, lin,
                   shift=flat.get("meta/shift"), scale=flat.get("meta/scale"))

    def save_npz(self, path):
        out = {"meta/net": np.asarray(self.net),
               "meta/shift": np.asarray(self.shift), "meta/scale": np.asarray(self.scale)}
        for i, (w, b) in enumerate(self.trunk_params):
            out[f"trunk/{i}/w"], out[f"trunk/{i}/b"] = np.asarray(w), np.asarray(b)
        for k, w in enumerate(self.lin_params):
            if w is not None:
                out[f"lin/{k}/w"] = np.asarray(w)
        np.savez(path, **out)

    @classmethod
    def random_init(cls, net="alex", key=None):
        """He-initialized trunk + uniform heads. NOT perceptually calibrated —
        only for tests and as a structural placeholder."""
        key = jax.random.PRNGKey(0) if key is None else key
        convs, taps = _ARCHS[net]
        trunk, c_in = [], 3
        for i, (c_out, k, s, p, _) in enumerate(convs):
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (k, k, c_in, c_out)) * jnp.sqrt(2.0 / (k * k * c_in))
            trunk.append((w, jnp.zeros((c_out,))))
            c_in = c_out
        lin = [jnp.full((1, 1, convs[t][0], 1), 1.0 / convs[t][0]) for t in taps]
        return cls(net, trunk, lin)

    # ---------------------------------------------------------------- forward

    def _normalized_taps(self, x):
        """x: NHWC in [0,1] -> list of channel-unit-normalized tap activations."""
        # Tiny images (16x16 tests) collapse to zero spatial size through the
        # stride-4 conv + maxpools; bilinearly upsample below 32px per side.
        B, H, W, C = x.shape
        if min(H, W) < 32:
            s = -(-32 // min(H, W))  # ceil
            x = jax.image.resize(x, (B, H * s, W * s, C), "bilinear")
        h = (2.0 * x - 1.0 - self.shift.reshape(1, 1, 1, 3)) / self.scale.reshape(1, 1, 1, 3)
        outs = []
        for i, ((c, k, s, p, pool), (w, b)) in enumerate(zip(self.convs, self.trunk_params)):
            if pool:
                h = _maxpool(h)
            h = jax.nn.relu(_conv(h, w, b, s, p))
            if i in self.taps:
                norm = jnp.sqrt(jnp.sum(jnp.square(h), axis=-1, keepdims=True) + 1e-10)
                outs.append(h / norm)
        return outs

    def _distance(self, x, y):
        fx, fy = self._normalized_taps(x), self._normalized_taps(y)
        total = jnp.zeros((x.shape[0],), jnp.float32)
        for k, (a, b) in enumerate(zip(fx, fy)):
            d2 = jnp.square(a - b)
            w = self.lin_params[k]
            if w is None:
                layer = jnp.mean(d2, axis=(1, 2, 3))
            else:
                # learned heads are non-negative 1x1 convs in the original model
                layer = jnp.mean(jnp.sum(d2 * jax.nn.relu(w[0, 0, :, 0]), axis=-1),
                                 axis=(1, 2))
            total = total + layer
        return total

    def __call__(self, x, y):
        return self._dist(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))

    def features(self, x, max_side=None):
        """Flattened concatenated tap features (for IIP / batch ordering)."""
        taps = self._feats(jnp.asarray(x, jnp.float32))
        return jnp.concatenate([t.reshape(t.shape[0], -1) for t in taps], axis=-1)


# ---------------------------------------------------------------- discovery


def find_lpips_weights(cfg_case=None, net="alex"):
    """Locate a converted LPIPS npz: $BREACHING_LPIPS_WEIGHTS, then
    <data.path>/checkpoints/lpips_<net>.npz, then ~/data/checkpoints/."""
    candidates = []
    env = os.environ.get("BREACHING_LPIPS_WEIGHTS")
    if env:
        candidates.append(env)
    if cfg_case is not None:
        try:
            candidates.append(os.path.expanduser(
                os.path.join(str(cfg_case.data.path), "checkpoints", f"lpips_{net}.npz")))
        except AttributeError:
            pass
    candidates.append(os.path.expanduser(f"~/data/checkpoints/lpips_{net}.npz"))
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def load_lpips(cfg_case=None, net="alex"):
    """Returns an LPIPS scorer or None when no weights file exists on disk."""
    path = find_lpips_weights(cfg_case, net)
    if path is None:
        return None
    return LPIPS.from_npz(path)


# ---------------------------------------------------------------- conversion


def convert_torch_lpips(lpips_module, out_path):
    """Convert an instantiated `lpips.LPIPS(net=...)` torch module (official pip
    package, Zhang et al. weights) to this module's npz schema. Run on a machine
    with the weights; ship the npz to <data.path>/checkpoints/.

    Torch conv weights are OIHW; ours are HWIO.
    """
    import torch  # noqa: F401 — only needed where the torch module exists

    net = lpips_module.pnet_type  # 'alex' | 'vgg'
    convs, taps = _ARCHS[net]
    tnet = lpips_module.net  # trunk wrapper with .slice1..sliceN
    torch_convs = []
    for slice_idx in range(1, len(taps) + 1):
        for layer in getattr(tnet, f"slice{slice_idx}"):
            if layer.__class__.__name__ == "Conv2d":
                torch_convs.append(layer)
    assert len(torch_convs) == len(convs), (len(torch_convs), len(convs))
    trunk = [(jnp.asarray(c.weight.detach().numpy().transpose(2, 3, 1, 0)),
              jnp.asarray(c.bias.detach().numpy())) for c in torch_convs]
    lin = [jnp.asarray(l.model[-1].weight.detach().numpy().transpose(2, 3, 1, 0))
           for l in lpips_module.lins]
    scaling = lpips_module.scaling_layer
    model = LPIPS(net, trunk, lin,
                  shift=scaling.shift.detach().numpy().reshape(3),
                  scale=scaling.scale.detach().numpy().reshape(3))
    model.save_npz(out_path)
    return model
