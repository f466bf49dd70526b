"""BEiTBlock parity vs a torch mirror of VGTbeit.py:230 Attention + :361
Block (q/v-only biases, static-window relative-position bias with the 3
cls slots, layerscale), plus the released two-stream shared-rel-pos backbone path."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as Fn

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.models.vgt import (
    BEiTBlock, VGTBackbone, VGTConfig, _beit_rel_pos_index)

D, H = 32, 4
WH, WW = 3, 5   # window (Hp, Wp); N = WH*WW + 1 (cls)


class TBeitBlock(nn.Module):
    def __init__(self):
        super().__init__()
        hd = D // H
        self.norm1 = nn.LayerNorm(D)
        self.qkv = nn.Linear(D, 3 * D, bias=False)
        self.q_bias = nn.Parameter(torch.randn(D) * 0.1)
        self.v_bias = nn.Parameter(torch.randn(D) * 0.1)
        num_rel = (2 * WH - 1) * (2 * WW - 1) + 3
        self.rel_pos_table = nn.Parameter(torch.randn(num_rel, H) * 0.1)
        self.proj = nn.Linear(D, D)
        self.norm2 = nn.LayerNorm(D)
        self.fc1 = nn.Linear(D, 4 * D)
        self.fc2 = nn.Linear(4 * D, D)
        self.gamma_1 = nn.Parameter(torch.full((D,), 0.1))
        self.gamma_2 = nn.Parameter(torch.full((D,), 0.1))
        self.hd = hd

    def forward(self, x):
        B, N, _ = x.shape
        h = self.norm1(x)
        qkv_bias = torch.cat(
            [self.q_bias, torch.zeros_like(self.v_bias), self.v_bias])
        qkv = Fn.linear(h, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(B, N, 3, H, self.hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.hd ** -0.5) @ k.transpose(-2, -1)
        idx = torch.from_numpy(_beit_rel_pos_index(WH, WW).astype(np.int64))
        bias = self.rel_pos_table[idx].view(N, N, H).permute(2, 0, 1)
        attn = attn + bias[None]
        attn = attn.softmax(-1)
        o = (attn @ v).transpose(1, 2).reshape(B, N, D)
        x = x + self.gamma_1 * self.proj(o)
        x = x + self.gamma_2 * self.fc2(Fn.gelu(self.fc1(self.norm2(x))))
        return x


class TestBEiTBlock:
    def test_matches_torch(self):
        torch.manual_seed(0)
        tm = TBeitBlock().eval()
        blk = BEiTBlock(D, H, (WH, WW), layerscale_value=0.1,
                        policy=FP32_POLICY)
        N = WH * WW + 1
        x = np.random.default_rng(0).standard_normal((2, N, D)).astype(
            np.float32)
        params = jax.tree.map(np.asarray, blk.init(
            jax.random.PRNGKey(0), jnp.asarray(x))["params"])
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        attn = params["attn"]
        attn["qkv"]["kernel"] = sd["qkv.weight"].T
        attn["q_bias"] = sd["q_bias"]
        attn["v_bias"] = sd["v_bias"]
        attn["relative_position_bias_table"] = sd["rel_pos_table"]
        attn["proj"]["kernel"] = sd["proj.weight"].T
        attn["proj"]["bias"] = sd["proj.bias"]
        params["mlp"]["fc1"]["kernel"] = sd["fc1.weight"].T
        params["mlp"]["fc1"]["bias"] = sd["fc1.bias"]
        params["mlp"]["fc2"]["kernel"] = sd["fc2.weight"].T
        params["mlp"]["fc2"]["bias"] = sd["fc2.bias"]
        for n in ("norm1", "norm2"):
            params[n]["scale"] = sd[n + ".weight"]
            params[n]["bias"] = sd[n + ".bias"]
        params["gamma_1"] = sd["gamma_1"]
        params["gamma_2"] = sd["gamma_2"]

        mine = blk.apply({"params": jax.tree.map(jnp.asarray, params)},
                         jnp.asarray(x))
        with torch.no_grad():
            theirs = tm(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(np.asarray(mine), theirs,
                                   rtol=2e-3, atol=2e-3)

    def test_backbone_shared_rel_runs(self):
        """Released recipe shape: shared rel-pos table, no abs positions,
        per-stream fpn ops + Sum merge + GridFPN."""
        cfg = VGTConfig(img_size=(64, 64), patch_size=16, embed_dim=32,
                        self_depth=4, cross_depth=0, num_heads=2,
                        grid_embedding_dim=16, vocab_size=50, fpn_dim=16,
                        out_indices=(0, 1, 2, 3))
        model = VGTBackbone(cfg, policy=FP32_POLICY)
        imgs = jnp.zeros((1, 64, 64, 3))
        grids = jnp.zeros((1, 64, 64), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), imgs, grids)
        out = model.apply(variables, imgs, grids)
        assert "blocks_0" in variables["params"]
        assert "relative_position_bias_table" in variables["params"]["rel_pos_bias"]
        assert "pos_embed" not in variables["params"]
        assert all(np.isfinite(np.asarray(v)).all() for v in out.values())
