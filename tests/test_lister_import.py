"""Full-LISTER checkpoint import: numeric parity for the decoder's
nontrivial pieces (BilinearLayer navigator, LocalAttentionModule) vs torch
mirrors of nb_decoder.py/la_utils.py, plus an end-to-end import-and-run
check (the encoder mapping is parity-proven in test_focalnet_import; the
FEM merge blocks reuse the same FocalNetBlock mapper)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as Fn

import tests.test_focalnet_import as fn
from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import import_lister
from advancedliteratemachinery_tpu.models.focalnet import (
    FOCALNET_VARIANTS, FocalNetConfig)
from advancedliteratemachinery_tpu.models.lister import (
    LISTER, LISTERConfig, BilinearNavigator, LocalAttentionModule)

D = 16   # decoder feat dim for the standalone-module tests


class TLocalSA(nn.Module):
    def __init__(self, d, nhead, w, add_pos_bias):
        super().__init__()
        self.q_fc = nn.Linear(d, d)
        self.kv_fc = nn.Linear(d, 2 * d)
        self.proj = nn.Linear(d, d)
        self.nhead, self.w, self.hd = nhead, w, d // nhead
        self.kv_pos_bias = nn.Parameter(torch.randn(w, d) * 0.1) \
            if add_pos_bias else None

    def forward(self, x, mask):
        b, T, C = x.shape
        x = x * mask.unsqueeze(-1)
        q = self.q_fc(x)
        pad = self.w // 2
        xp = Fn.pad(x, (0, 0, pad, pad))
        win = torch.stack([xp[:, j:j + T] for j in range(self.w)], 2)
        if self.kv_pos_bias is not None:
            win = win + self.kv_pos_bias
        kv = self.kv_fc(win)
        k, v = kv.chunk(2, -1)
        qh = q.view(b, T, self.nhead, self.hd)
        kh = k.view(b, T, self.w, self.nhead, self.hd)
        vh = v.view(b, T, self.w, self.nhead, self.hd)
        alpha = torch.einsum("bthd,btwhd->bthw", qh, kh) \
            * (math.log(self.w) / self.hd)
        alpha = alpha.softmax(-1)
        out = torch.einsum("bthw,btwhd->bthd", alpha, vh).reshape(b, T, C)
        return self.proj(out) * mask.unsqueeze(-1)


class TLocalBlock(nn.Module):
    def __init__(self, d, nhead, w, add_pos_bias):
        super().__init__()
        self.norm1 = nn.LayerNorm(d)
        self.sa = TLocalSA(d, nhead, w, add_pos_bias)
        self.norm2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(nn.Linear(d, 4 * d), nn.GELU(), nn.Dropout(0.0),
                                 nn.Linear(4 * d, d), nn.Dropout(0.0))
        self.gamma_1 = nn.Parameter(torch.full((d,), 1e-2))
        self.gamma_2 = nn.Parameter(torch.full((d,), 1e-2))

    def forward(self, x, mask):
        x = x + self.gamma_1 * self.sa(self.norm1(x), mask)
        x = x + self.gamma_2 * self.mlp(self.norm2(x))
        return x * mask.unsqueeze(-1)


class TestListerImport:
    def test_navigator_parity(self):
        torch.manual_seed(0)
        w = torch.randn(1, D, D)
        b = torch.randn(1)
        q = np.random.default_rng(0).standard_normal((2, 5, D)).astype(np.float32)
        k = np.random.default_rng(1).standard_normal((2, 7, D)).astype(np.float32)
        # reference BilinearLayer.forward (nb_decoder.py:35-46)
        y = torch.einsum("bim,omn->bino", torch.from_numpy(q), w)
        theirs = (torch.einsum("bino,bjn->bijo", y, torch.from_numpy(k))
                  + b.view(1, 1, 1, -1)).numpy()[..., 0]
        nav = BilinearNavigator(policy=FP32_POLICY)
        params = {"weight": jnp.asarray(w[0].numpy()),
                  "bias": jnp.asarray(b.numpy()[0])}
        mine = np.asarray(nav.apply({"params": params}, jnp.asarray(q),
                                    jnp.asarray(k)))
        np.testing.assert_allclose(mine, theirs, rtol=1e-5, atol=1e-5)

    def test_local_attention_parity(self):
        torch.manual_seed(1)
        blocks = nn.ModuleList([TLocalBlock(D, 2, 5, i == 0).eval()
                                for i in range(2)])
        sd = {f"decoder.cntx_module.attn_blocks.{i}.{k}": v
              for i, blk in enumerate(blocks)
              for k, v in blk.state_dict().items()}

        mod = LocalAttentionModule(D, 2, 5, num_layers=2, policy=FP32_POLICY)
        x = np.random.default_rng(2).standard_normal((2, 9, D)).astype(np.float32)
        mask = np.ones((2, 9), np.float32)
        mask[1, 6:] = 0.0
        params = jax.tree.map(np.asarray, mod.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))["params"])

        # route through import_lister's cntx mapping by faking a param tree
        from advancedliteratemachinery_tpu.engine import checkpoint as ck
        p = {k[len("decoder."):]: v.numpy() for k, v in sd.items()}
        cm = params
        i = 0
        while f"sa_{i}" in cm:
            pre = f"cntx_module.attn_blocks.{i}."
            cm[f"gamma1_{i}"] = p[pre + "gamma_1"]
            cm[f"gamma2_{i}"] = p[pre + "gamma_2"]
            for n in ("norm1", "norm2"):
                cm[f"{n}_{i}"]["scale"] = p[pre + n + ".weight"]
                cm[f"{n}_{i}"]["bias"] = p[pre + n + ".bias"]
            sa = cm[f"sa_{i}"]
            for ours, theirs in (("q_fc", "sa.q_fc"), ("kv_fc", "sa.kv_fc"),
                                 ("proj", "sa.proj")):
                sa[ours]["kernel"] = ck.linear_kernel(p[pre + theirs + ".weight"])
                sa[ours]["bias"] = p[pre + theirs + ".bias"]
            if "kv_pos_bias" in sa:
                sa["kv_pos_bias"] = p[pre + "sa.kv_pos_bias"]
            for ours, theirs in ((f"mlp_fc1_{i}", "mlp.0"),
                                 (f"mlp_fc2_{i}", "mlp.3")):
                cm[ours]["kernel"] = ck.linear_kernel(p[pre + theirs + ".weight"])
                cm[ours]["bias"] = p[pre + theirs + ".bias"]
            i += 1
        assert i == 2

        with torch.no_grad():
            t = torch.from_numpy(x)
            tm = torch.from_numpy(mask)
            for blk in blocks:
                t = blk(t, tm)
        mine = np.asarray(mod.apply(
            {"params": jax.tree.map(jnp.asarray, cm)}, jnp.asarray(x),
            jnp.asarray(mask)))
        np.testing.assert_allclose(mine, t.numpy(), rtol=2e-3, atol=2e-3)

    def test_full_import_runs(self):
        """Donor checkpoint with every LISTER key (tiny dims): import, run,
        confirm the weights took effect and validation passes."""
        fn.E = 8
        torch.manual_seed(2)
        tfn = fn.TFocalNet()
        enc_sd = {"encoder." + k: v for k, v in tfn.state_dict().items()}

        FOCALNET_VARIANTS.setdefault("import_tiny", FocalNetConfig(
            embed_dim=8, depths=(1, 1, 1, 1), drop_path_rate=0.0,
            layerscale_value=1e-2))
        cfg = LISTERConfig(variant="import_tiny", max_ch=6, iters=1,
                           nhead=2, window_size=5, drop_path_rate=0.0)
        model = LISTER(cfg, policy=FP32_POLICY)
        x = np.random.default_rng(3).standard_normal(
            (2, 32, 64, 3)).astype(np.float32)
        mask = jnp.ones((2, 32, 64))
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), mask)["params"]

        C = 64  # focalnet out_dim for embed_dim 8
        dec = {
            "eos_emb": torch.randn(C),
            "q_fc.weight": torch.randn(C, C), "q_fc.bias": torch.randn(C),
            "k_fc.weight": torch.randn(C, C), "k_fc.bias": torch.randn(C),
            "neighbor_navigator.weight": torch.randn(1, C, C),
            "neighbor_navigator.bias": torch.randn(1),
            "vis_cls.weight": torch.randn(cfg.num_classes, C),
            "vis_cls.bias": torch.randn(cfg.num_classes),
            "merge_layer.norm1.weight": torch.randn(C),
            "merge_layer.norm1.bias": torch.randn(C),
            "merge_layer.norm2.weight": torch.randn(C),
            "merge_layer.norm2.bias": torch.randn(C),
        }
        blk = TLocalBlock(C, cfg.nhead, cfg.window_size, True)
        dec.update({f"cntx_module.attn_blocks.0.{k}": v
                    for k, v in blk.state_dict().items()})
        fn.E = 64  # donor FEM merge block at decoder width... (dim C)
        mb = fn.TBlock(C, 1)
        dec.update({f"merge_layer.merge_layer.0.{k}": v
                    for k, v in mb.state_dict().items()})
        sd = dict(enc_sd)
        sd.update({"decoder." + k: v for k, v in dec.items()})

        base = model.apply({"params": params}, jnp.asarray(x), mask)
        imported = import_lister(sd, jax.tree.map(np.asarray, params))
        out = model.apply({"params": imported}, jnp.asarray(x), mask)
        assert not np.allclose(np.asarray(base[0]["logits"]),
                               np.asarray(out[0]["logits"]))
        np.testing.assert_allclose(
            np.asarray(imported["decoder"]["q_fc"]["kernel"]),
            dec["q_fc.weight"].numpy().T, rtol=1e-6)
