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


# ---------------------------------------------------------------------------
# FPN + RPN-head oracle modules (weights loaded FROM detax params) for the
# end-to-end box-parity gate — the automated analog of the reference's
# detectron2 comparison (`python/test/test_detectron.py:17-52`).


class TorchFPN(nn.Module):
    """Reference FPN semantics (`backbones/fpn.py:13-129`): lateral 1×1 +
    nearest ×2 upsample-add + output 3×3 per stage, P5 = k1/s2 maxpool(P4)."""

    def __init__(self, in_channels=(64, 128, 256, 512), out_channels=64):
        super().__init__()
        self.laterals = nn.ModuleList(
            [nn.Conv2d(c, out_channels, 1, bias=True) for c in in_channels]
        )
        self.outputs = nn.ModuleList(
            [nn.Conv2d(out_channels, out_channels, 3, padding=1, bias=True) for _ in in_channels]
        )

    def forward(self, feats):
        """feats: dict res1..res4 (NCHW) → dict p1..p5."""
        names = [f"res{i+1}" for i in range(len(self.laterals))]
        top = None
        out = {}
        for i in reversed(range(len(names))):
            lat = self.laterals[i](feats[names[i]])
            if top is not None:
                lat = lat + torch.nn.functional.interpolate(top, scale_factor=2, mode="nearest")
            top = lat
            out[f"p{i+1}"] = self.outputs[i](lat)
        out["p5"] = torch.nn.functional.max_pool2d(out["p4"], 1, stride=2)
        return out


class TorchRPNHead(nn.Module):
    """Reference RPNHead (`modules/rpn_heads.py:9-121`): shared 3×3+ReLU then
    1×1 objectness (A ch) + 1×1 deltas (A·4 ch)."""

    def __init__(self, channels=64, num_anchors=3):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)
        self.objectness = nn.Conv2d(channels, num_anchors, 1)
        self.deltas = nn.Conv2d(channels, num_anchors * 4, 1)

    def forward(self, feats):
        """per-level NCHW → (logits (N,H*W*A), deltas (N,H*W*A,4)) per level,
        flattened in detax's (h, w, a) order."""
        logits, deltas = [], []
        for x in feats:
            x = torch.relu(self.conv(x))
            lg = self.objectness(x)  # (N, A, H, W)
            dl = self.deltas(x)  # (N, A*4, H, W)
            n, a, h, w = lg.shape
            logits.append(lg.permute(0, 2, 3, 1).reshape(n, h * w * a))
            deltas.append(dl.permute(0, 2, 3, 1).reshape(n, h * w * a, 4))
        return logits, deltas


class TorchRetinaHead(nn.Module):
    """RetinaNet head oracle mirroring ``detax.nn.retina_head``: shared
    ``num_convs``-deep cls/box towers + 3×3 predictors, flattened in detax's
    (h, w, a) order."""

    def __init__(self, channels=64, num_anchors=3, num_classes=8, num_convs=1):
        super().__init__()
        self.cls_tower = nn.ModuleList(
            [nn.Conv2d(channels, channels, 3, padding=1) for _ in range(num_convs)]
        )
        self.box_tower = nn.ModuleList(
            [nn.Conv2d(channels, channels, 3, padding=1) for _ in range(num_convs)]
        )
        self.cls_score = nn.Conv2d(channels, num_anchors * num_classes, 3, padding=1)
        self.bbox_pred = nn.Conv2d(channels, num_anchors * 4, 3, padding=1)
        self.num_classes = num_classes

    def forward(self, feats):
        logits, deltas = [], []
        for x in feats:
            c = x
            for conv in self.cls_tower:
                c = torch.relu(conv(c))
            b = x
            for conv in self.box_tower:
                b = torch.relu(conv(b))
            lg = self.cls_score(c)  # (N, A*C, H, W)
            dl = self.bbox_pred(b)  # (N, A*4, H, W)
            n, _, h, w = lg.shape
            logits.append(lg.permute(0, 2, 3, 1).reshape(n, h * w * lg.shape[1] // self.num_classes, self.num_classes))
            deltas.append(dl.permute(0, 2, 3, 1).reshape(n, h * w * dl.shape[1] // 4, 4))
        return logits, deltas


def _t_kernel(k):
    """detax HWIO conv kernel → torch OIHW tensor."""
    import numpy as np

    return torch.from_numpy(np.asarray(k).transpose(3, 2, 0, 1).copy())


def load_fpn_from_detax(module: TorchFPN, backbone_params) -> None:
    """Copy detax FPN params (params['backbone']['fpn{i}']) into the oracle."""
    import numpy as np

    with torch.no_grad():
        for i in range(len(module.laterals)):
            p = backbone_params[f"fpn{i+1}"]
            module.laterals[i].weight.copy_(_t_kernel(p["lateral"]["conv"]["kernel"]))
            module.laterals[i].bias.copy_(torch.from_numpy(np.asarray(p["lateral"]["conv"]["bias"]).copy()))
            module.outputs[i].weight.copy_(_t_kernel(p["output"]["conv"]["kernel"]))
            module.outputs[i].bias.copy_(torch.from_numpy(np.asarray(p["output"]["conv"]["bias"]).copy()))
    module.eval()


def load_rpn_head_from_detax(module: TorchRPNHead, rpn_params) -> None:
    """Copy detax RPN-head params (params['rpn']['head']) into the oracle."""
    import numpy as np

    with torch.no_grad():
        h = rpn_params
        module.conv.weight.copy_(_t_kernel(h["conv0"]["kernel"]))
        module.conv.bias.copy_(torch.from_numpy(np.asarray(h["conv0"]["bias"]).copy()))
        module.objectness.weight.copy_(_t_kernel(h["objectness_logits"]["kernel"]))
        module.objectness.bias.copy_(torch.from_numpy(np.asarray(h["objectness_logits"]["bias"]).copy()))
        module.deltas.weight.copy_(_t_kernel(h["anchor_deltas"]["kernel"]))
        module.deltas.bias.copy_(torch.from_numpy(np.asarray(h["anchor_deltas"]["bias"]).copy()))
    module.eval()


def load_retina_head_from_detax(module: TorchRetinaHead, head_params) -> None:
    """Copy detax RetinaNet-head params (params['head']) into the oracle."""
    import numpy as np

    with torch.no_grad():
        for i, conv in enumerate(module.cls_tower):
            p = head_params[f"cls_conv{i}"]
            conv.weight.copy_(_t_kernel(p["kernel"]))
            conv.bias.copy_(torch.from_numpy(np.asarray(p["bias"]).copy()))
        for i, conv in enumerate(module.box_tower):
            p = head_params[f"box_conv{i}"]
            conv.weight.copy_(_t_kernel(p["kernel"]))
            conv.bias.copy_(torch.from_numpy(np.asarray(p["bias"]).copy()))
        module.cls_score.weight.copy_(_t_kernel(head_params["cls_score"]["kernel"]))
        module.cls_score.bias.copy_(torch.from_numpy(np.asarray(head_params["cls_score"]["bias"]).copy()))
        module.bbox_pred.weight.copy_(_t_kernel(head_params["bbox_pred"]["kernel"]))
        module.bbox_pred.bias.copy_(torch.from_numpy(np.asarray(head_params["bbox_pred"]["bias"]).copy()))
    module.eval()
