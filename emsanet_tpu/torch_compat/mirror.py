"""Independent PyTorch EMSANet mirror for whole-model conversion parity.

A faithful torch implementation of the flagship graph (dual NBt1D
ResNet encoders + SE-add fusion + PPM + dense decoders + heads,
reference emsanet/model.py:26-233) whose `state_dict()` keys are exactly
the torch keys produced by `name_map.emsanet_torch_name_map`. Used by
tests/test_torch_parity.py to lock the converter end to end: random
torch weights -> convert -> flax forward must match the torch forward.

torch is CPU-only in this environment; this module is test/tooling-only
and never imported by the JAX runtime path.
"""

from __future__ import annotations

from typing import Dict, Sequence

import torch
import torch.nn as nn
import torch.nn.functional as F


class NBt1D(nn.Module):
    def __init__(self, cin: int, cout: int, stride: int = 1):
        super().__init__()
        self.conv3x1_1 = nn.Conv2d(cin, cout, (3, 1), stride=(stride, 1),
                                   padding=(1, 0))
        self.conv1x3_1 = nn.Conv2d(cout, cout, (1, 3), stride=(1, stride),
                                   padding=(0, 1))
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv3x1_2 = nn.Conv2d(cout, cout, (3, 1), padding=(1, 0))
        self.conv1x3_2 = nn.Conv2d(cout, cout, (1, 3), padding=(0, 1))
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        h = torch.relu(self.conv3x1_1(x))
        h = torch.relu(self.bn1(self.conv1x3_1(h)))
        h = torch.relu(self.conv3x1_2(h))
        h = self.bn2(self.conv1x3_2(h))
        res = x if self.downsample is None else self.downsample(x)
        return torch.relu(h + res)


class Stem(nn.Module):
    def __init__(self, cin: int):
        super().__init__()
        self.conv = nn.Conv2d(cin, 64, 7, stride=2, padding=3, bias=False)
        self.bn = nn.BatchNorm2d(64)

    def forward(self, x):
        x = torch.relu(self.bn(self.conv(x)))
        return F.max_pool2d(x, 3, stride=2, padding=1)


class Backbone(nn.Module):
    features = (64, 128, 256, 512)

    def __init__(self, cin: int, stage_blocks: Sequence[int]):
        super().__init__()
        self.stem = Stem(cin)
        c_prev = 64
        for si, n in enumerate(stage_blocks):
            c = self.features[si]
            stride = 1 if si == 0 else 2
            blocks = []
            for b in range(n):
                blocks.append(NBt1D(c_prev if b == 0 else c, c,
                                    stride if b == 0 else 1))
            setattr(self, f"layer{si + 1}", nn.ModuleList(blocks))
            c_prev = c
        self.n_stages = len(stage_blocks)

    def stage(self, i: int, x):
        for blk in getattr(self, f"layer{i + 1}"):
            x = blk(x)
        return x

    def forward_stem(self, x):
        return self.stem(x)


class SqueezeExcite(nn.Module):
    def __init__(self, c: int, reduction: int = 16):
        super().__init__()
        hidden = max(c // reduction, 1)
        self.fc1 = nn.Linear(c, hidden)
        self.fc2 = nn.Linear(hidden, c)

    def forward(self, x):
        s = x.mean(dim=(2, 3))
        s = torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))
        return x * s[:, :, None, None]


class SEFusion(nn.Module):
    def __init__(self, c: int):
        super().__init__()
        self.se_main = SqueezeExcite(c)
        self.se_other = SqueezeExcite(c)

    def forward(self, main, other):
        return self.se_main(main) + self.se_other(other)


class ConvBNAct(nn.Module):
    def __init__(self, cin: int, cout: int, k: int = 3):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, padding=k // 2, bias=False)
        self.norm = nn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.norm(self.conv(x)))


class LearnedUp(nn.Module):
    """nearest x2 + depthwise 3x3 zero-pad (models/upsampling.py)."""

    def __init__(self, c: int):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1, groups=c, bias=False)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class PPM(nn.Module):
    bins = (1, 5)

    def __init__(self, c: int):
        super().__init__()
        red = c // len(self.bins)
        self.branches = nn.ModuleList(
            [ConvBNAct(c, red, 1) for _ in self.bins]
        )
        self.fuse = ConvBNAct(c + red * len(self.bins), c, 1)

    def forward(self, x):
        h, w = x.shape[2:]
        outs, ctx = [x], []
        for bin_size, branch in zip(self.bins, self.branches):
            p = branch(F.adaptive_avg_pool2d(x, bin_size))
            ctx.append(p)
            outs.append(F.interpolate(p, size=(h, w), mode="bilinear",
                                      align_corners=False))
        return self.fuse(torch.cat(outs, dim=1)), ctx


class DecoderModule(nn.Module):
    def __init__(self, cin: int, cout: int, skip_c: int, side_c: int):
        super().__init__()
        self.conv3x3 = ConvBNAct(cin, cout)
        self.blocks = nn.ModuleList([NBt1D(cout, cout) for _ in range(3)])
        self.side_output = nn.Conv2d(cout, side_c, 1)
        self.upsample = LearnedUp(cout)
        self.skip_fusion = nn.Module()
        self.skip_fusion.conv = nn.Conv2d(skip_c, cout, 1, bias=False)
        self.skip_fusion.norm = nn.BatchNorm2d(cout)

    def forward(self, x, skip, with_side: bool = False):
        x = self.conv3x3(x)
        for b in self.blocks:
            x = b(x)
        side = self.side_output(x) if with_side else None
        x = self.upsample(x)
        x = x + self.skip_fusion.norm(self.skip_fusion.conv(skip))
        return x, side


class DenseDecoderT(nn.Module):
    channels = (512, 256, 128)

    def __init__(self, task: str, cin: int, skips_c: Sequence[int],
                 n_classes: int = 40, with_orientation: bool = True):
        super().__init__()
        self.task = task
        side_c = n_classes if task == "semantic" else (
            5 if with_orientation else 3)
        self.decoder_modules = nn.ModuleList([
            DecoderModule(cin if i == 0 else self.channels[i - 1],
                          self.channels[i], skips_c[i], side_c)
            for i in range(3)
        ])
        self.head = nn.Module()
        if task == "semantic":
            self.head.conv = nn.Conv2d(self.channels[-1], n_classes, 3,
                                       padding=1)
            up_c = n_classes
        else:
            self.n_sub = 3 if with_orientation else 2
            self.head.shared_conv = ConvBNAct(
                self.channels[-1], 32 * self.n_sub)
            self.head.task_convs = nn.ModuleList([
                nn.Conv2d(32, c, 3, padding=1)
                for c in (1, 2, 2)[: self.n_sub]
            ])
            up_c = (1 + 2 + 2) if with_orientation else 3
        self.head.upsampling = nn.ModuleList(
            [LearnedUp(up_c).conv for _ in range(2)]
        )

    def forward(self, x, skips):
        for mod, skip in zip(self.decoder_modules, skips):
            x, _ = mod(x, skip)
        if self.task == "semantic":
            pred = self.head.conv(x)
        else:
            h = self.head.shared_conv(x)
            outs = [conv(h[:, 32 * i: 32 * (i + 1)])
                    for i, conv in enumerate(self.head.task_convs)]
            pred = torch.cat(outs, dim=1)
        for up in self.head.upsampling:
            pred = up(F.interpolate(pred, scale_factor=2, mode="nearest"))
        if self.task == "instance":
            center = torch.sigmoid(pred[:, 0:1])
            offset = torch.tanh(pred[:, 1:3])
            parts = [center, offset]
            if pred.shape[1] > 3:
                parts.append(pred[:, 3:5])
            pred = torch.cat(parts, dim=1)
        return pred


class TorchEMSANet(nn.Module):
    """Flagship mirror: dual NBt1D encoders + SE fusion + PPM + decoders."""

    def __init__(self, stage_blocks: Sequence[int] = (3, 4, 6, 3),
                 n_semantic: int = 40, n_scene: int = 9,
                 with_orientation: bool = True):
        super().__init__()
        self.encoder = nn.Module()
        self.encoder.rgb = Backbone(3, stage_blocks)
        self.encoder.depth = Backbone(1, stage_blocks)
        self.encoder.fusions = nn.ModuleList(
            [SEFusion(c) for c in (64, 64, 128, 256, 512)]
        )
        self.context_module = PPM(512)
        skips_c = (256, 128, 64)  # at 1/16, 1/8, 1/4 (fused rgb branch)
        self.decoders = nn.Module()
        self.decoders.semantic_decoder = DenseDecoderT(
            "semantic", 512, skips_c, n_classes=n_semantic)
        self.decoders.instance_decoder = DenseDecoderT(
            "instance", 512, skips_c, with_orientation=with_orientation)
        self.decoders.scene_decoder = nn.Module()
        self.decoders.scene_decoder.head = nn.Linear(512 // 2, n_scene)

    def forward(self, rgb, depth) -> Dict[str, torch.Tensor]:
        r = self.encoder.rgb.forward_stem(rgb)
        d = self.encoder.depth.forward_stem(depth)
        r = self.encoder.fusions[0](r, d)
        skips = {}
        downscales = (4, 8, 16, 32)
        for i in range(4):
            r = self.encoder.rgb.stage(i, r)
            d = self.encoder.depth.stage(i, d)
            r = self.encoder.fusions[i + 1](r, d)
            skips[downscales[i]] = r
        con, ctx = self.context_module(r)
        dec_skips = [skips[16], skips[8], skips[4]]
        sem = self.decoders.semantic_decoder(con, dec_skips)
        inst = self.decoders.instance_decoder(con, dec_skips)
        scene = self.decoders.scene_decoder.head(ctx[0].flatten(1))
        return {
            "semantic_logits": sem,
            "instance_center": inst[:, 0:1],
            "instance_offset": inst[:, 1:3],
            "instance_orientation": inst[:, 3:5] if inst.shape[1] > 3
            else None,
            "scene_logits": scene,
        }


def randomize_batchnorm_stats(model: nn.Module, seed: int = 0) -> None:
    """Give running stats non-trivial values so conversion tests catch
    mean/var routing mistakes."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5, generator=g)
                mod.running_var.uniform_(0.5, 1.5, generator=g)
