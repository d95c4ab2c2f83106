"""A minimal torch ResNet-18 with torchvision's module/key naming.

Used as the *oracle* for the PyTorch→JAX weight importer and for conv-stack
activation parity (the automated version of the reference repo's
detectron2-comparison scripts, SURVEY.md §4). Written from the standard
ResNet recipe — torchvision itself is not installed in this image.
"""

from __future__ import annotations

import torch
import torch.nn as nn


class TorchBasicBlock(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                nn.BatchNorm2d(out_ch),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class TorchResNet18(nn.Module):
    def __init__(self, num_classes: int = 0):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        chans = [64, 128, 256, 512]
        blocks = []
        in_ch = 64
        for i, ch in enumerate(chans):
            stride = 1 if i == 0 else 2
            layer = nn.Sequential(
                TorchBasicBlock(in_ch, ch, stride), TorchBasicBlock(ch, ch, 1)
            )
            blocks.append(layer)
            in_ch = ch
        self.layer1, self.layer2, self.layer3, self.layer4 = blocks
        self.num_classes = num_classes
        if num_classes:
            self.fc = nn.Linear(512, num_classes)

    def forward(self, x, return_features: bool = True):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        feats = {}
        for i, layer in enumerate([self.layer1, self.layer2, self.layer3, self.layer4]):
            x = layer(x)
            feats[f"res{i + 1}"] = x
        if self.num_classes:
            pooled = x.mean(dim=(2, 3))
            feats["logits"] = self.fc(pooled)
        return feats


def randomized_resnet18(seed: int = 0, num_classes: int = 0) -> TorchResNet18:
    torch.manual_seed(seed)
    model = TorchResNet18(num_classes)
    # randomize BN stats so frozen-BN folding is actually exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    model.eval()
    return model
