"""FocalNet checkpoint import parity vs a torch mirror of the reference
masked FocalNet-lrf (stem, focal modulation, layerscale blocks, (kh,3)
strided downsamples, final norm). Mask = all-ones so MaskedConv ==
plain conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import import_focalnet
from advancedliteratemachinery_tpu.models.focalnet import FocalNet, FocalNetConfig

E = 8
DEPTHS = (1, 1, 1, 1)
LEVELS = 3
MAX_KHS = (7, 3, 3, 1)
STRIDES = (2, 2, 2)


class TStem(nn.Module):
    def __init__(self, e):
        super().__init__()
        self.conv0 = nn.Conv2d(3, 32, 3, 1, 1)
        self.norm0 = nn.LayerNorm(32)
        self.conv1_0 = nn.Conv2d(32, 32, 5, 2, 2, groups=32)
        self.norm_1 = nn.LayerNorm(32)
        self.conv1_1 = nn.Conv2d(32, 64, 1)
        self.conv2_0 = nn.Conv2d(64, 64, 5, 2, 2, groups=64)
        self.norm2 = nn.LayerNorm(64)
        self.conv2_1 = nn.Conv2d(64, e, 1)
        self.conv3 = nn.Linear(e, e)

    def forward(self, x):
        ln = lambda n, t: n(t.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        x = ln(self.norm0, self.conv0(x))
        x = ln(self.norm_1, self.conv1_0(x))
        x = F.gelu(self.conv1_1(x))
        x = ln(self.norm2, self.conv2_0(x))
        x = F.gelu(self.conv2_1(x))
        return self.conv3(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)


class TModulation(nn.Module):
    def __init__(self, dim, max_kh):
        super().__init__()
        self.dim = dim
        self.f = nn.Linear(dim, 2 * dim + LEVELS + 1)
        self.h = nn.Conv2d(dim, dim, 1)
        self.proj = nn.Linear(dim, dim)
        self.focal_layers = nn.ModuleList()
        for k in range(LEVELS):
            ks = 2 * k + 3
            kh = min(ks, max_kh)
            self.focal_layers.append(nn.Sequential(nn.Conv2d(
                dim, dim, (kh, ks), 1, (kh // 2, ks // 2), groups=dim,
                bias=False), nn.GELU()))

    def forward(self, x):  # x: [B,H,W,C]
        C = self.dim
        f = self.f(x).permute(0, 3, 1, 2)
        q, ctx, gates = torch.split(f, (C, C, LEVELS + 1), 1)
        ctx_all = 0
        for l in range(LEVELS):
            ctx = self.focal_layers[l](ctx)
            ctx_all = ctx_all + ctx * gates[:, l:l + 1]
        ctx_g = F.gelu(ctx.mean(dim=(2, 3), keepdim=True))
        ctx_all = ctx_all + ctx_g * gates[:, LEVELS:]
        out = q * self.h(ctx_all)
        return self.proj(out.permute(0, 2, 3, 1))


class TBlock(nn.Module):
    def __init__(self, dim, max_kh):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.modulation = TModulation(dim, max_kh)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.gamma_1 = nn.Parameter(torch.full((dim,), 1e-2))
        self.gamma_2 = nn.Parameter(torch.full((dim,), 1e-2))

    def forward(self, x):  # [B,H,W,C]
        x = x + self.gamma_1 * self.modulation(self.norm1(x))
        x = x + self.gamma_2 * self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x


class TFocalNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = TStem(E)
        self.patch_embed.norm = nn.LayerNorm(E)
        self.layers = nn.ModuleList()
        for s in range(4):
            dim = E * 2 ** s
            stage = nn.Module()
            stage.blocks = nn.ModuleList(
                [TBlock(dim, MAX_KHS[s]) for _ in range(DEPTHS[s])])
            if s < 3:
                kh = MAX_KHS[s] if MAX_KHS[s] > 3 else 2
                kh = min(kh, 3)
                stage.downsample = nn.Module()
                stage.downsample.proj = nn.Conv2d(
                    dim, 2 * dim, (kh, 3), (STRIDES[s], 1),
                    ((kh - 1) // 2, 1))
                stage.downsample.norm = nn.LayerNorm(2 * dim)
            self.layers.append(stage)
        self.norm = nn.LayerNorm(E * 8)

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)   # NHWC
        x = self.patch_embed.norm(x)
        for s, stage in enumerate(self.layers):
            for blk in stage.blocks:
                x = blk(x)
            if hasattr(stage, "downsample"):
                x = stage.downsample.proj(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
                x = stage.downsample.norm(x)
        return self.norm(x)


class TestFocalNetImport:
    def test_features_match(self):
        torch.manual_seed(0)
        tm = TFocalNet().eval()
        cfg = FocalNetConfig(embed_dim=E, depths=DEPTHS, drop_path_rate=0.0,
                             layerscale_value=1e-2)
        model = FocalNet(cfg, policy=FP32_POLICY)
        x0 = jnp.zeros((1, 32, 64, 3))
        params = model.init(jax.random.PRNGKey(0), x0,
                            jnp.ones((1, 32, 64)))["params"]
        sd = {"encoder." + k: v for k, v in tm.state_dict().items()}
        params = import_focalnet(sd, jax.tree.map(np.asarray, params))

        img = np.random.default_rng(0).standard_normal((2, 32, 64, 3)).astype(
            np.float32)
        with torch.no_grad():
            tout = tm(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
        jout, _ = model.apply({"params": params}, jnp.asarray(img),
                              jnp.ones((2, 32, 64)))
        np.testing.assert_allclose(np.asarray(jout), tout, rtol=2e-3, atol=2e-3)
