"""Golden-parity test: a torch MGP-STR (mirroring the reference math) and
our flax model must produce identical logits after checkpoint import."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import (
    import_mgp_str,
    load_torch_state_dict,
)
from advancedliteratemachinery_tpu.models.mgp_str import MGPSTR, MGPSTRConfig


D, HEADS, DEPTH, T = 32, 2, 2, 9


class TorchViTBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(D)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(D, 3 * D, bias=True)
        self.attn.proj = nn.Linear(D, D)
        self.norm2 = nn.LayerNorm(D)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(D, 4 * D)
        self.mlp.fc2 = nn.Linear(4 * D, D)

    def forward(self, x):
        B, N, _ = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, HEADS, D // HEADS)
        q, k, v = qkv.unbind(2)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        a = (q @ k.transpose(-1, -2)) * ((D // HEADS) ** -0.5)
        a = a.softmax(-1)
        h = (a @ v).transpose(1, 2).reshape(B, N, D)
        x = x + self.attn.proj(h)
        h = self.norm2(x)
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(h)))
        return x + h


class TorchTokenLearner(nn.Module):
    def __init__(self, out_token):
        super().__init__()
        self.token_norm = nn.LayerNorm(D)
        self.tokenLearner = nn.Sequential(
            nn.Conv2d(D, D, 1, groups=8, bias=False),
            nn.Conv2d(D, out_token, 1, bias=False))
        self.feat = nn.Conv2d(D, D, 1, groups=8, bias=False)
        self.norm = nn.LayerNorm(D)

    def forward(self, x):
        x = self.token_norm(x)
        x = x.transpose(1, 2).unsqueeze(-1)
        sel = self.tokenLearner(x).flatten(2).softmax(-1)   # [B, T, S]
        feat = self.feat(x).flatten(2).transpose(1, 2)      # [B, S, D]
        out = torch.einsum("bts,bsd->btd", sel, feat)
        return self.norm(out)


class TorchMGPSTR(nn.Module):
    def __init__(self, num_class=38, bpe=64, wp=64):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, D, 4, 4)
        self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, 257, D) * 0.02)
        self.blocks = nn.ModuleList([TorchViTBlock() for _ in range(DEPTH)])
        for h in ("char", "bpe", "wp"):
            setattr(self, f"{h}_tokenLearner", TorchTokenLearner(T))
        self.char_head = nn.Linear(D, num_class)
        self.bpe_head = nn.Linear(D, bpe)
        self.wp_head = nn.Linear(D, wp)

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], 1)
        x = x + self.pos_embed
        for b in self.blocks:
            x = b(x)
        out = {}
        for h in ("char", "bpe", "wp"):
            t = getattr(self, f"{h}_tokenLearner")(x)
            out[h] = getattr(self, f"{h}_head")(t)
        return out


@pytest.fixture(scope="module")
def imported():
    torch.manual_seed(0)
    tm = TorchMGPSTR().eval()

    from advancedliteratemachinery_tpu.models.vit import ViTConfig

    cfg = MGPSTRConfig(variant="tiny", batch_max_length=T - 2,
                       bpe_vocab_size=64, wp_vocab_size=64,
                       vit=ViTConfig(embed_dim=D, depth=DEPTH, num_heads=HEADS))
    model = MGPSTR(cfg, policy=FP32_POLICY)
    x = jnp.zeros((1, 32, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    sd = {k: v for k, v in tm.state_dict().items()}
    params = import_mgp_str(sd, jax.tree.map(np.asarray, params))
    return tm, model, params


class TestTorchImportParity:
    def test_logits_match(self, imported):
        tm, model, params = imported
        rng = np.random.default_rng(0)
        img = rng.standard_normal((2, 32, 128, 3)).astype(np.float32)

        with torch.no_grad():
            tout = tm(torch.from_numpy(img.transpose(0, 3, 1, 2)))
        jout = model.apply({"params": params}, jnp.asarray(img))

        for h in ("char", "bpe", "wp"):
            got = np.asarray(jout[h])
            want = tout[h].numpy()
            np.testing.assert_allclose(got[..., : want.shape[-1]], want,
                                       rtol=2e-4, atol=2e-4)

    def test_padded_vocab_never_wins(self, imported):
        tm, model, params = imported
        rng = np.random.default_rng(1)
        img = rng.standard_normal((2, 32, 128, 3)).astype(np.float32)
        jout = model.apply({"params": params}, jnp.asarray(img))
        pred = np.asarray(jnp.argmax(jout["bpe"], -1))
        assert pred.max() < 64  # true vocab size

    def test_load_torch_state_dict_strips_ddp(self, tmp_path, imported):
        tm, *_ = imported
        sd = {"module." + k: v for k, v in tm.state_dict().items()}
        p = str(tmp_path / "ckpt.pth")
        torch.save({"model": sd}, p)
        loaded = load_torch_state_dict(p)
        assert "cls_token" in loaded
        assert not any(k.startswith("module.") for k in loaded)


class TestCheckpointFormats:
    def test_safetensors_roundtrip(self, tmp_path):
        from safetensors import numpy as st

        from advancedliteratemachinery_tpu.engine.checkpoint import (
            load_torch_state_dict,
        )

        sd = {"module.layer.weight": np.ones((3, 4), np.float32),
              "module.layer.bias": np.zeros(4, np.float32)}
        p = str(tmp_path / "m.safetensors")
        st.save_file(sd, p)
        loaded = load_torch_state_dict(p)
        assert set(loaded) == {"layer.weight", "layer.bias"}
        np.testing.assert_array_equal(loaded["layer.weight"],
                                      np.ones((3, 4)))

    def test_sharded_index_merges(self, tmp_path):
        import json

        from safetensors import numpy as st

        from advancedliteratemachinery_tpu.engine.checkpoint import (
            load_torch_state_dict,
        )

        st.save_file({"a.weight": np.ones(2, np.float32)},
                     str(tmp_path / "model-00001-of-00002.safetensors"))
        st.save_file({"b.weight": np.full(3, 2.0, np.float32)},
                     str(tmp_path / "model-00002-of-00002.safetensors"))
        index = {"weight_map": {
            "a.weight": "model-00001-of-00002.safetensors",
            "b.weight": "model-00002-of-00002.safetensors"}}
        p = str(tmp_path / "model.safetensors.index.json")
        with open(p, "w") as f:
            json.dump(index, f)
        loaded = load_torch_state_dict(p)
        assert set(loaded) == {"a.weight", "b.weight"}
        np.testing.assert_array_equal(loaded["b.weight"], [2.0, 2.0, 2.0])
