"""VGG in flax, NHWC (capability parity with reference breaching/cases/models/vgg.py)."""

from __future__ import annotations

from flax import linen as nn

from .layers import BatchNorm, Conv, Dense, max_pool

VGG_PLANS = {
    "VGG11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "VGG13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "VGG16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512, "M"],
    "VGG19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512,
              "M", 512, 512, 512, 512, "M"],
}


class VGG(nn.Module):
    plan_name: str = "VGG11"
    num_classes: int = 10
    use_norm: bool = True
    head: str = "CIFAR"

    @nn.compact
    def __call__(self, x, train: bool = False):
        plan = VGG_PLANS[self.plan_name.upper()]
        conv_idx = 0
        for entry in plan:
            if entry == "M":
                x = max_pool(x, 2, 2)
            else:
                x = Conv(entry, name=f"conv{conv_idx}")(x)
                if self.use_norm:
                    x = BatchNorm(name=f"bn{conv_idx}")(x, use_running_average=not train)
                x = nn.relu(x)
                conv_idx += 1
        x = x.reshape((x.shape[0], -1))
        if self.head == "ImageNet":
            x = nn.relu(Dense(4096, name="fc0")(x))
            x = nn.relu(Dense(4096, name="fc1")(x))
        self.sow("intermediates", "features", x)
        return Dense(self.num_classes, name="head")(x)
