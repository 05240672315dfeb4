"""Minimal torch models with torchvision-compatible state_dict naming.

torchvision is not installed (SURVEY.md §4), so parity tests build these
oracles, randomize their weights AND BatchNorm running stats, and port the
state_dict through ``models.torch_port`` — proving "same weights ⇒ same
descriptors" end to end.
"""

import torch
import torch.nn as nn


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNetTrunkTorch(nn.Module):
    """torchvision-named ResNet trunk (no avgpool/fc)."""

    def __init__(self, block, layers):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], 2)
        self.layer3 = self._make_layer(block, 256, layers[2], 2)
        self.layer4 = self._make_layer(block, 512, layers[3], 2)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def resnet18_trunk():
    return ResNetTrunkTorch(BasicBlock, [2, 2, 2, 2])


def resnet50_trunk():
    return ResNetTrunkTorch(Bottleneck, [3, 4, 6, 3])


class VGG16Torch(nn.Module):
    """torchvision-named VGG-16 features, final max-pool stripped."""

    def __init__(self):
        super().__init__()
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
        layers = []
        in_ch = 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(in_ch, v, 3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                in_ch = v
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        return self.features(x)


def randomize_bn_stats(model, seed=0):
    """Give BN layers non-trivial running stats so the port is fully tested."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.5
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5
    return model


class AlexNetTorch(nn.Module):
    """torchvision-named AlexNet features, final max-pool stripped."""

    def __init__(self):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(inplace=True), nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(inplace=True), nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.features(x)


class FireTorch(nn.Module):
    def __init__(self, inp, s, e1, e3):
        super().__init__()
        self.squeeze = nn.Conv2d(inp, s, 1)
        self.squeeze_activation = nn.ReLU(inplace=True)
        self.expand1x1 = nn.Conv2d(s, e1, 1)
        self.expand1x1_activation = nn.ReLU(inplace=True)
        self.expand3x3 = nn.Conv2d(s, e3, 3, padding=1)
        self.expand3x3_activation = nn.ReLU(inplace=True)

    def forward(self, x):
        x = self.squeeze_activation(self.squeeze(x))
        return torch.cat([
            self.expand1x1_activation(self.expand1x1(x)),
            self.expand3x3_activation(self.expand3x3(x)),
        ], 1)


class SqueezeNetTorch(nn.Module):
    """torchvision-named SqueezeNet 1.1 features."""

    def __init__(self):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 3, stride=2), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            FireTorch(64, 16, 64, 64), FireTorch(128, 16, 64, 64),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            FireTorch(128, 32, 128, 128), FireTorch(256, 32, 128, 128),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            FireTorch(256, 48, 192, 192), FireTorch(384, 48, 192, 192),
            FireTorch(384, 64, 256, 256), FireTorch(512, 64, 256, 256),
        )

    def forward(self, x):
        return self.features(x)


class DenseLayerTorch(nn.Module):
    def __init__(self, in_ch, growth, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.relu1 = nn.ReLU(inplace=True)
        self.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.relu2 = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        h = self.conv1(self.relu1(self.norm1(x)))
        h = self.conv2(self.relu2(self.norm2(h)))
        return torch.cat([x, h], 1)


class TransitionTorch(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.norm = nn.BatchNorm2d(in_ch)
        self.relu = nn.ReLU(inplace=True)
        self.conv = nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.pool = nn.AvgPool2d(2, 2)

    def forward(self, x):
        return self.pool(self.conv(self.relu(self.norm(x))))


class DenseNetTorch(nn.Module):
    """torchvision-named DenseNet-121 features + final ReLU (trunk form)."""

    def __init__(self, growth=32, blocks=(6, 12, 24, 16), init=64):
        super().__init__()
        from collections import OrderedDict

        layers = OrderedDict()
        layers["conv0"] = nn.Conv2d(3, init, 7, 2, 3, bias=False)
        layers["norm0"] = nn.BatchNorm2d(init)
        layers["relu0"] = nn.ReLU(inplace=True)
        layers["pool0"] = nn.MaxPool2d(3, 2, 1)
        ch = init
        for bi, n in enumerate(blocks):
            block = nn.Module()
            for li in range(n):
                block.add_module(f"denselayer{li+1}", DenseLayerTorch(ch + li * growth, growth))
            # emulate torchvision's _DenseBlock forward (sequential)
            def make_fwd(b, n=n):
                def fwd(x):
                    for li in range(n):
                        x = getattr(b, f"denselayer{li+1}")(x)
                    return x
                return fwd
            block.forward = make_fwd(block)
            layers[f"denseblock{bi+1}"] = block
            ch += n * growth
            if bi < len(blocks) - 1:
                layers[f"transition{bi+1}"] = TransitionTorch(ch, ch // 2)
                ch //= 2
        layers["norm5"] = nn.BatchNorm2d(ch)
        self.features = nn.Sequential(layers)

    def forward(self, x):
        return torch.relu(self.features(x))


def densenet121_trunk(blocks=(6, 12, 24, 16)):
    return DenseNetTorch(blocks=blocks)
