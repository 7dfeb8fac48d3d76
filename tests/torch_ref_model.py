"""Minimal torch transcription of the reference's two-head ResNet.

The reference builds ``torchvision.models.resnet50`` and swaps the fc head
(reference ``model.py:5-39``); torchvision itself is not in this image, so
this module re-creates the torchvision ResNet architecture (v1.5
bottleneck, groups/base_width knobs) directly in ``torch.nn`` with the
exact ``state_dict`` key layout the reference checkpoints use
(``resnet_base.conv1.weight`` ... ``logits.weight``).  Tests use it as the
ground truth for forward-output parity and parameter-count parity of the
flax model across all variant families (resnet / resnext / wide_resnet).

Test-only: nothing in the package imports this.
"""
import torch
from torch import nn


def conv3x3(cin, cout, stride=1, groups=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, groups=groups,
                     bias=False)


def conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 groups=1, base_width=64):
        super().__init__()
        if groups != 1 or base_width != 64:
            raise ValueError("BasicBlock only supports groups=1, "
                             "base_width=64")
        self.conv1 = conv3x3(inplanes, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 groups=1, base_width=64):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = conv1x1(inplanes, width)
        self.bn1 = nn.BatchNorm2d(width)
        # v1.5: stride on the 3x3 (torchvision's layout).
        self.conv2 = conv3x3(width, width, stride, groups)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = conv1x1(width, planes * self.expansion)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNetBase(nn.Module):
    """torchvision-style ResNet backbone (fc included, 1000-way default)."""

    def __init__(self, block, layers, width=64, groups=1, base_width=64,
                 num_classes=1000):
        super().__init__()
        self.groups, self.base_width = groups, base_width
        self.inplanes = width
        self.conv1 = nn.Conv2d(3, width, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, width, layers[0])
        self.layer2 = self._make_layer(block, width * 2, layers[1], 2)
        self.layer3 = self._make_layer(block, width * 4, layers[2], 2)
        self.layer4 = self._make_layer(block, width * 8, layers[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(width * 8 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                conv1x1(self.inplanes, planes * block.expansion, stride),
                nn.BatchNorm2d(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample,
                        self.groups, self.base_width)]
        self.inplanes = planes * block.expansion
        layers += [block(self.inplanes, planes, groups=self.groups,
                         base_width=self.base_width)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


# Variant table mirroring openset_imagenet_tpu.models.resnet._VARIANTS.
TORCH_VARIANTS = {
    "resnet18": dict(block=BasicBlock, layers=(2, 2, 2, 2)),
    "resnet34": dict(block=BasicBlock, layers=(3, 4, 6, 3)),
    "resnet50": dict(block=Bottleneck, layers=(3, 4, 6, 3)),
    "resnet101": dict(block=Bottleneck, layers=(3, 4, 23, 3)),
    "resnet152": dict(block=Bottleneck, layers=(3, 8, 36, 3)),
    "resnext50_32x4d": dict(block=Bottleneck, layers=(3, 4, 6, 3),
                            groups=32, base_width=4),
    "resnext101_32x8d": dict(block=Bottleneck, layers=(3, 4, 23, 3),
                             groups=32, base_width=8),
    "wide_resnet50_2": dict(block=Bottleneck, layers=(3, 4, 6, 3),
                            base_width=128),
    "wide_resnet101_2": dict(block=Bottleneck, layers=(3, 4, 23, 3),
                             base_width=128),
    "tiny": dict(block=BasicBlock, layers=(1, 1, 1, 1), width=8),
    "tiny50": dict(block=Bottleneck, layers=(1, 1, 1, 1), width=8),
    "tinyx": dict(block=Bottleneck, layers=(1, 1, 1, 1), width=8,
                  groups=4, base_width=32),
}


class TorchTwoHead(nn.Module):
    """The reference's two-head wrapper (reference ``model.py:5-39``):
    backbone fc replaced by Linear(feat, fc_layer_dim) + a logits head."""

    def __init__(self, variant, fc_layer_dim, out_features,
                 logit_bias=False):
        super().__init__()
        spec = dict(TORCH_VARIANTS[variant])
        block, layers = spec.pop("block"), spec.pop("layers")
        self.resnet_base = TorchResNetBase(block, layers, **spec)
        fc_in = self.resnet_base.fc.in_features
        self.resnet_base.fc = nn.Linear(fc_in, fc_layer_dim)
        self.logits = nn.Linear(fc_layer_dim, out_features, bias=logit_bias)

    def forward(self, x):
        features = self.resnet_base(x)
        return self.logits(features), features
