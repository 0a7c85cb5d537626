"""Model-level golden: torch ResNet-34 forward vs our Flax trunk.

Builds the torchvision resnet34 graph in plain torch (BasicBlock topology —
public, fixed architecture; torchvision itself is not installed here), loads
the deterministic synthetic state dict from
geomapnet_tpu.models.torchvision_layout, runs an eval-mode forward on a fixed
input, and records the pooled 512-d features into tests/golden_trunk.py.

tests/test_trunk_golden.py then checks that convert_state_dict + our Flax
ResNet reproduce those features — pinning conv padding/stride semantics,
BatchNorm eps/statistics use and pooling behavior against real torch, which
is what the reference's pretrained-accuracy ultimately depends on
(/root/reference/scripts/train.py:76).

Usage: python tools/capture_trunk_golden.py
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import torch
from torch import nn

from geomapnet_tpu.models.torchvision_layout import (
    synthetic_resnet34_state_dict,
    synthetic_resnet50_state_dict,
)

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests/golden_trunk.py"


class BasicBlock(nn.Module):
    """torchvision BasicBlock topology (conv-bn-relu-conv-bn + projection)."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + identity)


class ResNet34Trunk(nn.Module):
    """torchvision resnet34 minus the classifier fc (trunk features only)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, (blocks, width) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512))
        ):
            layers = []
            for b in range(blocks):
                layers.append(
                    BasicBlock(cin if b == 0 else width, width,
                               2 if (b == 0 and i > 0) else 1)
                )
            setattr(self, f"layer{i + 1}", nn.Sequential(*layers))
            cin = width
        self.avgpool = nn.AdaptiveAvgPool2d(1)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return torch.flatten(self.avgpool(x), 1)



class Bottleneck(nn.Module):
    """torchvision Bottleneck topology (1x1-3x3-1x1, 4x expansion, stride on
    the 3x3; projection downsample on every first block of a stage)."""

    def __init__(self, cin, width, stride):
        super().__init__()
        out = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, 1, 0, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, out, 1, 1, 0, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, out, 1, stride, bias=False),
                nn.BatchNorm2d(out),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


class ResNet50Trunk(nn.Module):
    """torchvision resnet50 minus the classifier fc (trunk features only)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, (blocks, width) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512))
        ):
            layers = []
            for b in range(blocks):
                layers.append(
                    Bottleneck(cin if b == 0 else width * 4, width,
                               2 if (b == 0 and i > 0) else 1)
                )
            setattr(self, f"layer{i + 1}", nn.Sequential(*layers))
            cin = width * 4
        self.avgpool = nn.AdaptiveAvgPool2d(1)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return torch.flatten(self.avgpool(x), 1)


def main() -> None:
    # fixed deterministic input, NCHW for torch
    n = 2 * 3 * 64 * 96
    x = (np.sin(np.arange(n, dtype=np.float64) * 0.31 + 0.5) * 0.8)
    x = x.reshape(2, 3, 64, 96).astype(np.float32)

    def run(model, sd, feat_dim):
        sd = {k: v for k, v in sd.items() if not k.startswith("fc.")}
        model.load_state_dict(sd, strict=True)
        model.eval()
        with torch.no_grad():
            feats = model(torch.from_numpy(x)).numpy()
        assert feats.shape == (2, feat_dim)
        return feats

    def fmt(feats):
        body = np.array2string(feats.astype(np.float64), separator=", ",
                               precision=17, threshold=10**6,
                               max_line_width=76)
        return "\n".join("    " + ln.strip() for ln in body.splitlines())

    f34 = run(ResNet34Trunk(), synthetic_resnet34_state_dict(True), 512)
    f50 = run(ResNet50Trunk(), synthetic_resnet50_state_dict(True), 2048)

    OUT.write_text(
        '"""Pooled trunk features OBSERVED from real torch ResNet-34/50.\n\n'
        "Generated by tools/capture_trunk_golden.py: the exact torchvision\n"
        "graphs built in plain torch, loaded with the deterministic synthetic\n"
        "state dicts (models/torchvision_layout.py), eval-mode forward on the\n"
        "fixed input reconstructed in tests/test_trunk_golden.py.\n"
        '"""\n\nimport numpy as np\n\nTRUNK_FEATURES = np.array(\n'
        + fmt(f34) + "\n)\n\nTRUNK50_FEATURES = np.array(\n"
        + fmt(f50) + "\n)\n"
    )
    print(f"wrote {OUT}: r34 mean {f34.mean():.6f}  r50 mean {f50.mean():.6f}")


if __name__ == "__main__":
    main()
