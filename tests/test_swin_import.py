"""Swin checkpoint import parity: a torch mirror of the reference Swin
(window attention + relative position bias + patch merging + per-stage
norms) vs our flax SwinTransformer after import."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import import_swin
from advancedliteratemachinery_tpu.models.swin import SwinConfig, SwinTransformer

D0, HEADS, WIN = 16, (2, 4), 4
DEPTHS = (2, 2)


class TorchWindowAttention(nn.Module):
    def __init__(self, dim, heads, win):
        super().__init__()
        self.dim, self.heads, self.win = dim, heads, win
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * win - 1) ** 2, heads) * 0.02)
        coords = torch.stack(torch.meshgrid(torch.arange(win), torch.arange(win),
                                            indexing="ij")).flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += win - 1
        rel[:, :, 1] += win - 1
        rel[:, :, 0] *= 2 * win - 1
        self.register_buffer("rpi", rel.sum(-1))

    def forward(self, x, mask=None):
        Bn, N, C = x.shape
        H = self.heads
        qkv = self.qkv(x).reshape(Bn, N, 3, H, C // H).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * ((C // H) ** -0.5)
        bias = self.relative_position_bias_table[self.rpi.view(-1)].view(
            N, N, H).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(Bn // nW, nW, H, N, N) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(Bn, H, N, N)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(Bn, N, C)
        return self.proj(x)


class TorchSwinBlock(nn.Module):
    def __init__(self, dim, heads, win, shift):
        super().__init__()
        self.dim, self.win, self.shift = dim, win, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, heads, win)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)

    def forward(self, x, H, W):
        B, L, C = x.shape
        s = self.shift if min(H, W) > self.win else 0
        h = self.norm1(x).view(B, H, W, C)
        if s:
            h = torch.roll(h, (-s, -s), (1, 2))
        w = self.win
        hw = h.view(B, H // w, w, W // w, w, C).permute(0, 1, 3, 2, 4, 5)
        hw = hw.reshape(-1, w * w, C)
        amask = None
        if s:
            img = torch.zeros(1, H, W, 1)
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -s), slice(-s, None)):
                for ws in (slice(0, -w), slice(-w, -s), slice(-s, None)):
                    img[:, hs, ws, :] = cnt
                    cnt += 1
            mw = img.view(1, H // w, w, W // w, w, 1).permute(0, 1, 3, 2, 4, 5)
            mw = mw.reshape(-1, w * w)
            amask = (mw.unsqueeze(1) - mw.unsqueeze(2))
            amask = amask.masked_fill(amask != 0, -100.0).masked_fill(amask == 0, 0.0)
        hw = self.attn(hw, amask)
        h = hw.view(B, H // w, W // w, w, w, C).permute(0, 1, 3, 2, 4, 5)
        h = h.reshape(B, H, W, C)
        if s:
            h = torch.roll(h, (s, s), (1, 2))
        x = x + h.view(B, L, C)
        x = x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x


class TorchSwin(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, D0, 4, 4)
        self.patch_embed.norm = nn.LayerNorm(D0)
        self.layers = nn.ModuleList()
        for s, depth in enumerate(DEPTHS):
            dim = D0 * (2 ** s)
            stage = nn.Module()
            stage.blocks = nn.ModuleList([
                TorchSwinBlock(dim, HEADS[s], WIN, 0 if b % 2 == 0 else WIN // 2)
                for b in range(depth)])
            if s < len(DEPTHS) - 1:
                stage.downsample = nn.Module()
                stage.downsample.norm = nn.LayerNorm(4 * dim)
                stage.downsample.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
            self.layers.append(stage)
        for s in range(len(DEPTHS)):
            self.add_module(f"norm{s}", nn.LayerNorm(D0 * 2 ** s))

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        H = W = 8  # 32/4
        outs = []
        for s, stage in enumerate(self.layers):
            for blk in stage.blocks:
                x = blk(x, H, W)
            outs.append(getattr(self, f"norm{s}")(x).view(-1, H, W, D0 * 2 ** s))
            if hasattr(stage, "downsample"):
                B, L, C = x.shape
                xv = x.view(B, H, W, C)
                cat = torch.cat([xv[:, 0::2, 0::2], xv[:, 1::2, 0::2],
                                 xv[:, 0::2, 1::2], xv[:, 1::2, 1::2]], -1)
                x = stage.downsample.reduction(
                    stage.downsample.norm(cat.view(B, L // 4, 4 * C)))
                H, W = H // 2, W // 2
        return outs


class TestSwinImport:
    def test_stage_features_match(self):
        torch.manual_seed(0)
        tm = TorchSwin().eval()
        cfg = SwinConfig(embed_dim=D0, depths=DEPTHS, num_heads=HEADS,
                         window_size=WIN, drop_path_rate=0.0)
        model = SwinTransformer(cfg, policy=FP32_POLICY)
        x = jnp.zeros((1, 32, 32, 3))
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        params = import_swin(tm.state_dict(), jax.tree.map(np.asarray, params))

        img = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(
            np.float32)
        with torch.no_grad():
            touts = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        feats, _ = model.apply({"params": params}, jnp.asarray(img))
        for s, (tf, jf) in enumerate(zip(touts, feats)):
            np.testing.assert_allclose(np.asarray(jf), tf.numpy(),
                                       rtol=3e-4, atol=3e-4,
                                       err_msg=f"stage {s}")
