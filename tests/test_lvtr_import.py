"""LVTR released-checkpoint import: parity vs a torch mirror of the
modified dalle2-pytorch Unet.

The mirror below reproduces the vendored Unet's math at the cfgs_lvtr.py
feature set (reference AIGC/SceneVTG/LVTR/dalle2_pytorch/dalle2_pytorch.py
:1281 — CrossEmbed init conv over x|removal|masks, time/image tokens,
text cross-attention, pixel-unshuffle down / pixel-shuffle up, bottleneck
self-attention with dalle2's double-scaled queries, learned-variance
output) with the exact state-dict key names the Decoder saves
(train_lvtr.py:350-360, `unets.0.` prefix). Sliced dims: 2 stages / tiny
channels — per-layer parity at scale-invariant math.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import import_lvtr
from advancedliteratemachinery_tpu.models.lvtr import (
    DalleUnetConfig,
    LVTRDalleUnet,
)

DIM, COND, IMGE, TXTE = 16, 16, 24, 20
MULTS = (1, 2)
GROUPS = 4
MAXTXT = 6
H, W = 16, 32


class MLayerNorm(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.g = nn.Parameter(torch.ones(d))

    def forward(self, x):
        var = torch.var(x, dim=-1, unbiased=False, keepdim=True)
        mean = torch.mean(x, dim=-1, keepdim=True)
        return (x - mean) * (var + 1e-5).rsqrt() * self.g


class MBlock(nn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.project = nn.Conv2d(din, dout, 3, padding=1)
        self.norm = nn.GroupNorm(GROUPS, dout)

    def forward(self, x, scale_shift=None):
        x = self.norm(self.project(x))
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return F.silu(x)


class MCrossAttention(nn.Module):
    def __init__(self, dim, ctx, heads=2, dim_head=8):
        super().__init__()
        self.heads, self.dim_head = heads, dim_head
        inner = heads * dim_head
        self.norm = MLayerNorm(dim)
        self.null_kv = nn.Parameter(torch.randn(2, dim_head))
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(ctx, inner * 2, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim, bias=False),
                                    MLayerNorm(dim))

    def forward(self, x, context):
        b = x.shape[0]
        scale = self.dim_head ** -0.5
        x = self.norm(x)
        q = self.to_q(x)
        k, v = self.to_kv(context).chunk(2, dim=-1)
        q, k, v = (t.reshape(b, -1, self.heads, self.dim_head)
                   .transpose(1, 2) for t in (q, k, v))
        nk = self.null_kv[0].expand(b, self.heads, 1, -1)
        nv = self.null_kv[1].expand(b, self.heads, 1, -1)
        k = torch.cat((nk, k), dim=-2)
        v = torch.cat((nv, v), dim=-2)
        q, k = q * math.sqrt(scale), k * math.sqrt(scale)
        sim = torch.einsum("bhid,bhjd->bhij", q, k)
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(1, 2).reshape(b, -1,
                                          self.heads * self.dim_head)
        return self.to_out(out)


class MSelfAttention(nn.Module):
    """dalle2 Attention: kv shared across heads, q scaled twice."""

    def __init__(self, dim, heads=2, dim_head=8):
        super().__init__()
        self.heads, self.dim_head = heads, dim_head
        inner = heads * dim_head
        self.norm = MLayerNorm(dim)
        self.null_kv = nn.Parameter(torch.randn(2, dim_head))
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim, dim_head * 2, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim, bias=False),
                                    MLayerNorm(dim))

    def forward(self, x):
        b, n, _ = x.shape
        scale = self.dim_head ** -0.5
        h = self.norm(x)
        q = self.to_q(h).reshape(b, n, self.heads,
                                 self.dim_head).transpose(1, 2)
        k, v = self.to_kv(h).chunk(2, dim=-1)
        q = q * scale
        nk = self.null_kv[0].expand(b, 1, -1)
        nv = self.null_kv[1].expand(b, 1, -1)
        k = torch.cat((nk, k), dim=-2)
        v = torch.cat((nv, v), dim=-2)
        q, k = q * math.sqrt(scale), k * math.sqrt(scale)
        sim = torch.einsum("bhid,bjd->bhij", q, k)
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhij,bjd->bhid", attn, v)
        out = out.transpose(1, 2).reshape(b, n, self.heads * self.dim_head)
        return self.to_out(out)


class MResnetBlock(nn.Module):
    def __init__(self, din, dout, cond=False, time_cond=DIM * 4):
        super().__init__()
        self.time_mlp = nn.Sequential(nn.SiLU(),
                                      nn.Linear(time_cond, dout * 2))
        self.cross_attn = MCrossAttention(dout, COND) if cond else None
        self.block1 = MBlock(din, dout)
        self.block2 = MBlock(dout, dout)
        self.res_conv = (nn.Conv2d(din, dout, 1) if din != dout
                         else nn.Identity())

    def forward(self, x, t, c=None):
        te = self.time_mlp(t)[:, :, None, None]
        h = self.block1(x, scale_shift=te.chunk(2, dim=1))
        if self.cross_attn is not None:
            b, ch, hh, ww = h.shape
            hs = h.permute(0, 2, 3, 1).reshape(b, hh * ww, ch)
            hs = self.cross_attn(hs, c) + hs
            h = hs.reshape(b, hh, ww, ch).permute(0, 3, 1, 2)
        h = self.block2(h)
        return h + self.res_conv(x)


class MUnet(nn.Module):
    """Key-name-exact mirror at sliced dims (2 stages, 2 res blocks)."""

    def __init__(self):
        super().__init__()
        init_ch = 3 + 3 + 1 + 1
        ks = (3, 7, 15)
        dim_scales = [DIM // 2, DIM // 4, DIM - DIM // 2 - DIM // 4]
        self.init_conv = nn.Module()
        self.init_conv.convs = nn.ModuleList(
            [nn.Conv2d(init_ch, d, k, padding=k // 2)
             for k, d in zip(ks, dim_scales)])
        tc = DIM * 4
        self.to_time_hiddens = nn.Sequential(nn.Identity(),
                                             nn.Linear(DIM, tc), nn.GELU())
        self.to_time_tokens = nn.Sequential(nn.Linear(tc, COND * 2),
                                            nn.Identity())
        self.to_time_cond = nn.Sequential(nn.Linear(tc, tc))
        self.image_to_tokens = nn.Sequential(nn.Linear(IMGE, COND * 4),
                                             nn.Identity())
        self.to_image_hiddens = nn.Sequential(nn.Linear(IMGE, tc),
                                              nn.GELU())
        self.norm_cond = nn.LayerNorm(COND)
        self.norm_mid_cond = nn.LayerNorm(COND)
        self.text_to_cond = nn.Linear(TXTE, COND)
        self.null_text_embed = nn.Parameter(torch.randn(1, MAXTXT, COND))
        self.null_image_embed = nn.Parameter(torch.randn(1, 4, COND))
        self.null_image_hiddens = nn.Parameter(torch.randn(1, tc))
        self.null_imagestyle_embed = nn.Parameter(torch.randn(1, 4, COND))
        self.word_embedding = nn.Embedding(16, 8)

        dims = [DIM] + [DIM * m for m in MULTS]
        in_out = list(zip(dims[:-1], dims[1:]))
        self.downs = nn.ModuleList()
        for ind, (di, do) in enumerate(in_out):
            is_first, is_last = ind == 0, ind == len(in_out) - 1
            post = (nn.Conv2d(di, do, 1) if is_last else
                    nn.Sequential(nn.Identity(), nn.Conv2d(di * 4, do, 1)))
            self.downs.append(nn.ModuleList([
                nn.Identity(),
                MResnetBlock(di, di),
                nn.ModuleList([MResnetBlock(di, di, cond=not is_first)
                               for _ in range(2)]),
                nn.Identity(),
                post]))
        mid = dims[-1]
        self.mid_block1 = MResnetBlock(mid, mid, cond=True)
        self.mid_attn = nn.Module()
        self.mid_attn.fn = nn.Module()
        self.mid_attn.fn.fn = MSelfAttention(mid)
        self.mid_block2 = MResnetBlock(mid, mid, cond=True)
        self.ups = nn.ModuleList()
        skip_dims = [di for di, _ in in_out]
        for ind, (di, do) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            sk = skip_dims.pop()
            up = nn.Module()
            up.net = nn.Sequential(nn.Conv2d(do, di * 4, 1), nn.SiLU())
            self.ups.append(nn.ModuleList([
                MResnetBlock(do + sk, do, cond=not is_last),
                nn.ModuleList([MResnetBlock(do + sk, do, cond=not is_last)
                               for _ in range(2)]),
                nn.Identity(),
                up if not is_last else nn.Identity()]))
        self.final_resnet_block = MResnetBlock(DIM * 2, DIM)
        self.to_out = nn.Conv2d(DIM, 6, 1)

    def forward(self, x, t, image_embed, text_encodings, conditions):
        b = x.shape[0]
        x = torch.cat([x,
                       conditions["images_removal"] * 2 - 1,
                       conditions["line_poly_mask"] * 2 - 1,
                       conditions["word_poly_mask"] * 2 - 1], dim=1)
        x = torch.cat([conv(x) for conv in self.init_conv.convs], dim=1)
        r = x.clone()

        half = DIM // 2
        emb = torch.exp(torch.arange(half).float()
                        * -(math.log(10000) / (half - 1)))
        ang = t.float()[:, None] * emb[None]
        sin_emb = torch.cat((ang.sin(), ang.cos()), dim=-1)
        time_hiddens = self.to_time_hiddens[2](
            self.to_time_hiddens[1](sin_emb))
        time_tokens = self.to_time_tokens[0](time_hiddens).reshape(
            b, 2, COND)
        tcond = self.to_time_cond(time_hiddens)
        tcond = tcond + self.to_image_hiddens(image_embed)
        image_tokens = self.image_to_tokens[0](image_embed).reshape(
            b, 4, COND)

        text_tokens = self.text_to_cond(text_encodings)[:, :MAXTXT]
        mask = torch.any(text_encodings != 0.0, dim=-1)[:, :MAXTXT]
        rem = MAXTXT - text_tokens.shape[1]
        if rem > 0:
            text_tokens = F.pad(text_tokens, (0, 0, 0, rem))
            mask = F.pad(mask, (0, rem), value=False)
        text_tokens = torch.where(mask[..., None], text_tokens,
                                  self.null_text_embed)

        c = torch.cat((time_tokens, image_tokens), dim=-2)
        mid_c = torch.cat((c, text_tokens), dim=-2)
        c = self.norm_cond(c)
        mid_c = self.norm_mid_cond(mid_c)

        hiddens = []
        for _, init_block, blocks, _, post in self.downs:
            x = init_block(x, tcond)
            for blk in blocks:
                x = blk(x, tcond, c)
                hiddens.append(x)
            hiddens.append(x)
            if isinstance(post, nn.Sequential):   # unshuffle + 1x1
                bb, cc, hh, ww = x.shape
                x = (x.reshape(bb, cc, hh // 2, 2, ww // 2, 2)
                     .permute(0, 1, 3, 5, 2, 4)
                     .reshape(bb, cc * 4, hh // 2, ww // 2))
                x = post[1](x)
            else:
                x = post(x)

        x = self.mid_block1(x, tcond, mid_c)
        bb, cc, hh, ww = x.shape
        xs = x.permute(0, 2, 3, 1).reshape(bb, hh * ww, cc)
        xs = self.mid_attn.fn.fn(xs) + xs
        x = xs.reshape(bb, hh, ww, cc).permute(0, 3, 1, 2)
        x = self.mid_block2(x, tcond, mid_c)

        for init_block, blocks, _, up in self.ups:
            x = torch.cat((x, hiddens.pop()), dim=1)
            x = init_block(x, tcond, c)
            for blk in blocks:
                x = torch.cat((x, hiddens.pop()), dim=1)
                x = blk(x, tcond, c)
            if not isinstance(up, nn.Identity):
                x = F.pixel_shuffle(up.net[1](up.net[0](x)), 2)

        x = torch.cat((x, r), dim=1)
        x = self.final_resnet_block(x, tcond)
        return self.to_out(x)


def _cfg():
    return DalleUnetConfig(dim=DIM, cond_dim=COND, image_embed_dim=IMGE,
                           text_embed_dim=TXTE, dim_mults=MULTS,
                           num_resnet_blocks=2, num_time_tokens=2,
                           num_image_tokens=4, max_text_len=MAXTXT,
                           attn_heads=2, attn_dim_head=8, cross_heads=2,
                           cross_dim_head=8, groups=GROUPS,
                           learned_variance=True)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": rng.standard_normal((2, H, W, 3)).astype(np.float32),
        "t": np.asarray([3.0, 17.0], np.float32),
        "image_embed": rng.standard_normal((2, IMGE)).astype(np.float32),
        # a couple of zero rows exercise the null-text substitution
        "text": np.concatenate([
            rng.standard_normal((2, 4, TXTE)),
            np.zeros((2, 2, TXTE))], axis=1).astype(np.float32),
        "conditions": {
            "images_removal": rng.random((2, H, W, 3)).astype(np.float32),
            "line_poly_mask": rng.random((2, H, W, 1)).astype(np.float32),
            "word_poly_mask": rng.random((2, H, W, 1)).astype(np.float32),
        },
    }


@pytest.fixture(scope="module")
def imported():
    torch.manual_seed(0)
    tm = MUnet().eval()
    model = LVTRDalleUnet(_cfg(), policy=FP32_POLICY)
    iv = _inputs()
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(iv["x"]), jnp.asarray(iv["t"]),
        jnp.asarray(iv["image_embed"]), jnp.asarray(iv["text"]),
        {k: jnp.asarray(v) for k, v in iv["conditions"].items()})["params"]
    sd = {"unets.0." + k: v for k, v in tm.state_dict().items()}
    params = import_lvtr(sd, jax.tree.map(np.asarray, params))
    return tm, model, params


def _torch_fwd(tm, iv, x=None, t=None):
    cond_t = {k: torch.from_numpy(np.ascontiguousarray(
        v.transpose(0, 3, 1, 2))) for k, v in iv["conditions"].items()}
    with torch.no_grad():
        out = tm(torch.from_numpy((iv["x"] if x is None else x)
                                  .transpose(0, 3, 1, 2)),
                 torch.from_numpy(iv["t"] if t is None else t),
                 torch.from_numpy(iv["image_embed"]),
                 torch.from_numpy(iv["text"]), cond_t)
    return out.numpy().transpose(0, 2, 3, 1)


class TestLvtrImport:
    def test_eps_prediction_parity(self, imported):
        tm, model, params = imported
        iv = _inputs(1)
        want = _torch_fwd(tm, iv)
        got = np.asarray(model.apply(
            {"params": params}, jnp.asarray(iv["x"]), jnp.asarray(iv["t"]),
            jnp.asarray(iv["image_embed"]), jnp.asarray(iv["text"]),
            {k: jnp.asarray(v) for k, v in iv["conditions"].items()}))
        assert got.shape == (2, H, W, 6)       # learned variance: eps + var
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_ddim_sample_parity(self, imported):
        """A 5-step DDIM loop (eta=0, shared cosine schedule, fixed noise)
        must land on the same image through both models — multi-step
        accumulation catches small per-step import errors."""
        from advancedliteratemachinery_tpu.models.lvtr import cosine_betas

        tm, model, params = imported
        iv = _inputs(2)
        T = 20
        betas = cosine_betas(T)
        a_bar = np.cumprod(1.0 - betas)
        steps = [19, 15, 10, 5, 0]
        rng = np.random.default_rng(3)
        x0_np = rng.standard_normal((2, H, W, 3)).astype(np.float32)

        def ddim(eps_fn):
            x = x0_np.copy()
            for i, ti in enumerate(steps):
                eps = eps_fn(x, np.full((2,), float(ti), np.float32))[..., :3]
                ab = a_bar[ti]
                x0 = (x - math.sqrt(1 - ab) * eps) / math.sqrt(ab)
                ab_prev = a_bar[steps[i + 1]] if i + 1 < len(steps) else 1.0
                x = (math.sqrt(ab_prev) * x0
                     + math.sqrt(1 - ab_prev) * eps).astype(np.float32)
            return x

        def torch_eps(x, t):
            return _torch_fwd(tm, iv, x=x, t=t)

        @jax.jit
        def _jax_eps(x, t):
            return model.apply(
                {"params": params}, x, t, jnp.asarray(iv["image_embed"]),
                jnp.asarray(iv["text"]),
                {k: jnp.asarray(v) for k, v in iv["conditions"].items()})

        def jax_eps(x, t):
            return np.asarray(_jax_eps(jnp.asarray(x), jnp.asarray(t)))

        np.testing.assert_allclose(ddim(jax_eps), ddim(torch_eps),
                                   rtol=5e-3, atol=5e-3)

    def test_decoder_extras_consumed_without_warning(self, imported):
        """Decoder-level keys from the real save (recognizer copy, attn
        poolers, text pos table, scheduler buffers) must be consumed
        deliberately — no 'not mapped' warning."""
        import warnings

        tm, model, params = imported
        sd = {"unets.0." + k: v for k, v in tm.state_dict().items()}
        sd.update({
            "abs_pos_emb_text.weight": np.zeros((8, 16)),
            "attn_pooling.positional_embedding": np.zeros((9, 16)),
            "attn_pooling_style.positional_embedding": np.zeros((9, 16)),
            "recognizer.cnn.0.weight": np.zeros((4, 3, 3, 3)),
            "noise_schedulers.0.betas": np.zeros(20),
            "vaes.0.dummy": np.zeros(1),
        })
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            import_lvtr(sd, jax.tree.map(np.asarray, params))
        msgs = [str(w.message) for w in caught
                if "not mapped" in str(w.message)]
        assert not msgs, msgs
