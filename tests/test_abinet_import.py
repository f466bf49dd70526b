"""ABINetVision (LevOCR BaseVision) checkpoint import parity vs a torch
mirror of OCR/LevOCR/abinet (resnet.py ResNet45, backbone.py ResTranformer,
model_vision.py PositionAttention/BaseVision), scaled to out_dim=128."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as Fn

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import import_abinet_vision
from advancedliteratemachinery_tpu.models.abinet import (
    ABINetVision, ABINetVisionConfig, sincos_positions)

D = 128            # d_model (reference: 512); ResNet45 widths scale as D//16
T = 6              # max_length
NC = 10            # num classes


class TResBlock(nn.Module):
    def __init__(self, ci, co, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(ci, co, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(co)
        self.conv2 = nn.Conv2d(co, co, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(co)
        if stride != 1 or ci != co:
            self.downsample = nn.Sequential(
                nn.Conv2d(ci, co, 1, stride, bias=False), nn.BatchNorm2d(co))
        else:
            self.downsample = None

    def forward(self, x):
        r = self.downsample(x) if self.downsample else x
        out = Fn.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return Fn.relu(out + r)


class TResNet45(nn.Module):
    def __init__(self):
        super().__init__()
        w = D // 16
        self.conv1 = nn.Conv2d(3, w, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(w)
        plan = [(w, 3, 2), (2 * w, 4, 1), (4 * w, 6, 2), (8 * w, 6, 1),
                (16 * w, 3, 1)]
        ci = w
        for s, (planes, blocks, stride) in enumerate(plan):
            blks = [TResBlock(ci, planes, stride)]
            blks += [TResBlock(planes, planes) for _ in range(blocks - 1)]
            setattr(self, f"layer{s + 1}", nn.Sequential(*blks))
            ci = planes

    def forward(self, x):
        x = Fn.relu(self.bn1(self.conv1(x)))
        for s in range(5):
            x = getattr(self, f"layer{s + 1}")(x)
        return x


def enc_layer(ci, co, s):
    return nn.Sequential(nn.Conv2d(ci, co, 3, s, 1), nn.BatchNorm2d(co),
                         nn.ReLU(True))


def dec_layer(ci, co, scale=None, size=None):
    return nn.Sequential(nn.Upsample(size=size, scale_factor=scale,
                                     mode="nearest"),
                         nn.Conv2d(ci, co, 3, 1, 1), nn.BatchNorm2d(co),
                         nn.ReLU(True))


class TPositionAttention(nn.Module):
    def __init__(self, h, w, nch=64):
        super().__init__()
        self.k_encoder = nn.Sequential(
            enc_layer(D, nch, (1, 2)), enc_layer(nch, nch, 2),
            enc_layer(nch, nch, 2), enc_layer(nch, nch, 2))
        self.k_decoder = nn.Sequential(
            dec_layer(nch, nch, scale=2), dec_layer(nch, nch, scale=2),
            dec_layer(nch, nch, scale=2), dec_layer(nch, D, size=(h, w)))
        self.project = nn.Linear(D, D)

    def forward(self, x):
        N, E, H, W = x.shape
        k, v = x, x
        feats = []
        for i in range(4):
            k = self.k_encoder[i](k)
            feats.append(k)
        for i in range(3):
            k = self.k_decoder[i](k)
            k = k + feats[2 - i]
        k = self.k_decoder[3](k)
        q = torch.from_numpy(sincos_positions(T, E))[None].repeat(N, 1, 1)
        q = self.project(q)
        scores = torch.bmm(q, k.flatten(2, 3)) / (E ** 0.5)
        attn = torch.softmax(scores, -1)
        v = v.permute(0, 2, 3, 1).reshape(N, -1, E)
        return torch.bmm(attn, v)


class TBaseVision(nn.Module):
    def __init__(self, h=8, w=16):
        super().__init__()
        self.backbone = nn.Module()
        self.backbone.resnet = TResNet45()
        self.backbone.transformer = nn.Module()
        self.backbone.transformer.layers = nn.ModuleList(
            [nn.TransformerEncoderLayer(D, 8, 256, dropout=0.0,
                                        batch_first=False)
             for _ in range(3)])
        self.attention = TPositionAttention(h, w)
        self.cls = nn.Linear(D, NC)

    def forward(self, x):
        f = self.backbone.resnet(x)
        n, c, h, w = f.shape
        seq = f.flatten(2).permute(2, 0, 1)          # [HW, N, C]
        seq = seq + torch.from_numpy(
            sincos_positions(h * w, c))[:, None, :]
        for layer in self.backbone.transformer.layers:
            seq = layer(seq)
        f = seq.permute(1, 2, 0).reshape(n, c, h, w)
        vecs = self.attention(f)
        return self.cls(vecs)


class TestAbinetImport:
    def test_logits_match(self):
        torch.manual_seed(0)
        tm = TBaseVision().eval()
        cfg = ABINetVisionConfig(max_length=T, num_classes=NC, d_model=D,
                                 ffn=256)
        model = ABINetVision(cfg, policy=FP32_POLICY)
        x0 = jnp.zeros((1, 32, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x0, train=False)
        sd = {"vision." + k: v for k, v in tm.state_dict().items()}
        variables = import_abinet_vision(sd, dict(variables))

        img = np.random.default_rng(0).standard_normal(
            (2, 32, 64, 3)).astype(np.float32)
        with torch.no_grad():
            tout = tm(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
        jout = model.apply(variables, jnp.asarray(img), train=False)
        np.testing.assert_allclose(np.asarray(jout["logits"]), tout,
                                   rtol=2e-3, atol=2e-3)
