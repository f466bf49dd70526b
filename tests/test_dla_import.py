"""DLASeg (LORE-TSR ctdet) checkpoint import parity vs a torch mirror of
pose_dla_dcn.py. The mirror's DCNs use zero offset/mask weights, where
modulated deform conv reduces to 0.5 * conv + bias (sigmoid(0) mask), which
both sides satisfy exactly — so trunk/neck/head weights, BN running stats,
the DCN offset-channel permutation (structurally), and the learned
transposed-conv up kernels are all covered."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as Fn

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import (
    _dcn_offset_perm, import_dla)
from advancedliteratemachinery_tpu.models.dla import (
    DLAConfig, DLASeg, DLASegConfig)

CH = (4, 8, 16, 32, 64, 128)
LEVELS = (1, 1, 1, 2, 2, 1)
HEADS = (("hm", 2), ("reg", 2))
HEAD_CONV = 8


class TBasicBlock(nn.Module):
    def __init__(self, ci, co, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(ci, co, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(co)
        self.conv2 = nn.Conv2d(co, co, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(co)

    def forward(self, x, residual=None):
        if residual is None:
            residual = x
        out = Fn.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return Fn.relu(out + residual)


class TRoot(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.conv = nn.Conv2d(ci, co, 1, 1, 0, bias=False)
        self.bn = nn.BatchNorm2d(co)

    def forward(self, *x):
        return Fn.relu(self.bn(self.conv(torch.cat(x, 1))))


class TTree(nn.Module):
    def __init__(self, levels, ci, co, stride=1, level_root=False, root_dim=0):
        super().__init__()
        if root_dim == 0:
            root_dim = 2 * co
        if level_root:
            root_dim += ci
        self.levels, self.level_root, self.stride = levels, level_root, stride
        if levels == 1:
            self.tree1 = TBasicBlock(ci, co, stride)
            self.tree2 = TBasicBlock(co, co, 1)
            self.root = TRoot(root_dim, co)
        else:
            self.tree1 = TTree(levels - 1, ci, co, stride)
            self.tree2 = TTree(levels - 1, co, co, root_dim=root_dim + co)
        if ci != co:
            self.project = nn.Sequential(
                nn.Conv2d(ci, co, 1, 1, bias=False), nn.BatchNorm2d(co))
        else:
            self.project = None

    def forward(self, x, residual=None, children=None):
        children = [] if children is None else children
        bottom = Fn.max_pool2d(x, self.stride, self.stride) \
            if self.stride > 1 else x
        residual = self.project(bottom) if self.project else bottom
        if self.level_root:
            children.append(bottom)
        x1 = self.tree1(x, residual)
        if self.levels == 1:
            x2 = self.tree2(x1)
            return self.root(x2, x1, *children)
        children.append(x1)
        return self.tree2(x1, children=children)


class TDLA(nn.Module):
    def __init__(self):
        super().__init__()
        self.base_layer = nn.Sequential(
            nn.Conv2d(3, CH[0], 7, 1, 3, bias=False),
            nn.BatchNorm2d(CH[0]), nn.ReLU())
        self.level0 = nn.Sequential(
            nn.Conv2d(CH[0], CH[0], 3, 1, 1, bias=False),
            nn.BatchNorm2d(CH[0]), nn.ReLU())
        self.level1 = nn.Sequential(
            nn.Conv2d(CH[0], CH[1], 3, 2, 1, bias=False),
            nn.BatchNorm2d(CH[1]), nn.ReLU())
        self.level2 = TTree(LEVELS[2], CH[1], CH[2], 2)
        self.level3 = TTree(LEVELS[3], CH[2], CH[3], 2, level_root=True)
        self.level4 = TTree(LEVELS[4], CH[3], CH[4], 2, level_root=True)
        self.level5 = TTree(LEVELS[5], CH[4], CH[5], 2, level_root=True)

    def forward(self, x):
        x = self.base_layer(x)
        y = []
        for lv in range(6):
            x = getattr(self, f"level{lv}")(x)
            y.append(x)
        return y


class TDCN(nn.Module):
    """DCNv2 with ZERO offset/mask weights: reduces to 0.5 * conv + bias."""

    def __init__(self, ci, co):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(co, ci, 3, 3) * 0.1)
        self.bias = nn.Parameter(torch.randn(co) * 0.1)
        self.conv_offset_mask = nn.Conv2d(ci, 27, 3, 1, 1)
        self.conv_offset_mask.weight.data.zero_()
        self.conv_offset_mask.bias.data.zero_()

    def forward(self, x):
        return 0.5 * Fn.conv2d(x, self.weight, None, 1, 1) + \
            self.bias[None, :, None, None]


class TDeformConv(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.conv = TDCN(ci, co)
        self.actf = nn.Sequential(nn.BatchNorm2d(co), nn.ReLU())

    def forward(self, x):
        return self.actf(self.conv(x))


def fill_up(up):
    w = up.weight.data
    f = math.ceil(w.size(2) / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    for i in range(w.size(2)):
        for j in range(w.size(3)):
            w[0, 0, i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
    for ch in range(1, w.size(0)):
        w[ch, 0] = w[0, 0]


class TIDAUp(nn.Module):
    def __init__(self, o, channels, up_f):
        super().__init__()
        for i in range(1, len(channels)):
            f = int(up_f[i])
            setattr(self, f"proj_{i}", TDeformConv(channels[i], o))
            up = nn.ConvTranspose2d(o, o, f * 2, f, f // 2, groups=o,
                                    bias=False)
            fill_up(up)
            # perturb so the test fails if learned up kernels aren't imported
            up.weight.data *= 1.0 + 0.2 * torch.rand_like(up.weight.data)
            setattr(self, f"up_{i}", up)
            setattr(self, f"node_{i}", TDeformConv(o, o))

    def forward(self, layers, startp, endp):
        for i in range(startp + 1, endp):
            j = i - startp
            layers[i] = getattr(self, f"up_{j}")(
                getattr(self, f"proj_{j}")(layers[i]))
            layers[i] = getattr(self, f"node_{j}")(layers[i] + layers[i - 1])


class TDLAUp(nn.Module):
    def __init__(self, startp, channels, scales):
        super().__init__()
        self.startp = startp
        in_ch = list(channels)
        channels = list(channels)
        scales = np.array(scales, int)
        for i in range(len(channels) - 1):
            j = -i - 2
            setattr(self, f"ida_{i}",
                    TIDAUp(channels[j], in_ch[j:], scales[j:] // scales[j]))
            scales[j + 1:] = scales[j]
            in_ch[j + 1:] = [channels[j] for _ in channels[j + 1:]]

    def forward(self, layers):
        out = [layers[-1]]
        for i in range(len(layers) - self.startp - 1):
            getattr(self, f"ida_{i}")(layers, len(layers) - i - 2, len(layers))
            out.insert(0, layers[-1])
        return out


class TDLASeg(nn.Module):
    def __init__(self):
        super().__init__()
        first, last = 2, 5
        self.base = TDLA()
        scales = [2 ** i for i in range(len(CH[first:]))]
        self.dla_up = TDLAUp(first, CH[first:], scales)
        self.ida_up = TIDAUp(CH[first], CH[first:last],
                             [2 ** i for i in range(last - first)])
        for head, classes in HEADS:
            fc = nn.Sequential(
                nn.Conv2d(CH[first], HEAD_CONV, 3, padding=1, bias=True),
                nn.ReLU(),
                nn.Conv2d(HEAD_CONV, classes, 1, bias=True))
            if head == "hm":
                fc[-1].bias.data.fill_(-2.19)
            setattr(self, head, fc)

    def forward(self, x):
        x = self.base(x)
        x = self.dla_up(x)
        y = [x[i].clone() for i in range(3)]
        self.ida_up(y, 0, len(y))
        return {h: getattr(self, h)(y[-1]) for h, _ in HEADS}


class TestDlaImport:
    def test_offset_perm(self):
        perm = _dcn_offset_perm(9)
        assert perm[:9].tolist() == [0, 2, 4, 6, 8, 10, 12, 14, 16]
        assert perm[9:18].tolist() == [1, 3, 5, 7, 9, 11, 13, 15, 17]
        assert perm[18:].tolist() == list(range(18, 27))

    def test_heads_match(self):
        torch.manual_seed(0)
        tm = TDLASeg().eval()
        cfg = DLASegConfig(dla=DLAConfig(levels=LEVELS, channels=CH),
                           head_conv=HEAD_CONV, heads=HEADS)
        model = DLASeg(cfg, policy=FP32_POLICY)
        x0 = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x0, train=False)
        variables = import_dla(tm.state_dict(), dict(variables))

        img = np.random.default_rng(0).standard_normal(
            (2, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            tout = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        jout = model.apply(variables, jnp.asarray(img), train=False)
        for head, _ in HEADS:
            ours = np.asarray(jout[head])
            theirs = tout[head].numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3,
                                       err_msg=head)
