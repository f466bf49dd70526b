"""VLPT-STD checkpoint import parity vs a torch mirror of
models/VLPT.py + models/encoders.py (ResNet50 trunk, FPN, pre-norm
blocks with separate q/k/v, BertEmbeddings, cross blocks, MLM head)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import import_vlpt
from advancedliteratemachinery_tpu.models.vlpt import VLPT, VLPTConfig

D, HEADS = 16, 2
VOCAB, TLEN = 60, 8
BASE = 4
IMG = 64


class TBottleneck(nn.Module):
    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        return F.relu(self.bn3(self.conv3(out)) + idt)


class TResNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, BASE, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(BASE)
        cin = BASE
        for li in range(1, 5):
            planes = BASE * 2 ** (li - 1)
            stride = 1 if li == 1 else 2
            setattr(self, f"layer{li}",
                    nn.Sequential(TBottleneck(cin, planes, stride)))
            cin = planes * 4

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        feats = [None]
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
            feats.append(x)
        return feats


class TFPN(nn.Module):
    def __init__(self):
        super().__init__()
        nin = [BASE * 4, BASE * 8, BASE * 16, BASE * 32]
        nd = BASE * 4
        self.ndim = nd
        self.fpn_in = nn.ModuleList([nn.Conv2d(nin[-1], nd, 1, bias=False),
                                     nn.Conv2d(nin[-2], nd, 1, bias=False),
                                     nn.Conv2d(nin[-3], nd, 1, bias=False),
                                     nn.Conv2d(nin[-4], nd, 1, bias=False)])

    def forward(self, fl):
        _, c2, c3, c4, c5 = fl
        p5 = self.fpn_in[0](c5)
        p4 = self.fpn_in[1](c4) + F.interpolate(p5, scale_factor=2,
                                                mode="nearest")
        p3 = self.fpn_in[2](c3) + F.interpolate(p4, scale_factor=2,
                                                mode="nearest")
        p2 = self.fpn_in[3](c2) + F.interpolate(p3, scale_factor=2,
                                                mode="nearest")
        sz = c3.size()[2:]
        p2 = F.interpolate(p2, size=sz, mode="bilinear", align_corners=False)
        p4 = F.interpolate(p4, size=sz, mode="bilinear", align_corners=False)
        p5 = F.interpolate(p5, size=sz, mode="bilinear", align_corners=False)
        return torch.cat((p2, p3, p4, p5), dim=1)


class TAttention(nn.Module):
    def __init__(self):
        super().__init__()
        self.q_proj = nn.Linear(D, D, bias=True)
        self.k_proj = nn.Linear(D, D, bias=True)
        self.v_proj = nn.Linear(D, D, bias=True)
        self.proj = nn.Linear(D, D)

    def forward(self, q, m, mask=None):
        B, N1, C = q.shape
        N2 = m.shape[1]
        hd = C // HEADS
        qq = self.q_proj(q).reshape(B, N1, HEADS, hd).permute(0, 2, 1, 3)
        kk = self.k_proj(m).reshape(B, N2, HEADS, hd).permute(0, 2, 1, 3)
        vv = self.v_proj(m).reshape(B, N2, HEADS, hd).permute(0, 2, 1, 3)
        a = (qq @ kk.transpose(-2, -1)) * hd ** -0.5
        if mask is not None:
            a = a.masked_fill(~mask.bool()[:, None, None, :], float("-inf"))
        a = a.softmax(-1)
        return self.proj((a @ vv).transpose(1, 2).reshape(B, N1, C))


class TMlp(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = nn.Linear(D, 4 * D)
        self.fc2 = nn.Linear(4 * D, D)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(D, eps=1e-6)
        self.attn = TAttention()
        self.norm2 = nn.LayerNorm(D, eps=1e-6)
        self.mlp = TMlp()

    def forward(self, x, mask=None):
        h = self.norm1(x)
        x = x + self.attn(h, h, mask)
        return x + self.mlp(self.norm2(x))


class TCrossBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = TAttention()
        self.cross_attn = TAttention()
        self.norm1 = nn.LayerNorm(D, eps=1e-6)
        self.norm2 = nn.LayerNorm(D, eps=1e-6)
        self.norm3 = nn.LayerNorm(D, eps=1e-6)
        self.mlp = TMlp()

    def forward(self, x, memory, mask=None):
        x = x + self.self_attn(self.norm1(x), self.norm1(x), mask)
        x = x + self.cross_attn(self.norm2(x), self.norm2(memory))
        return x + self.mlp(self.norm3(x))


class TVLPT(nn.Module):
    def __init__(self):
        super().__init__()

        class IE(nn.Module):
            def __init__(self):
                super().__init__()
                self.backbone = TResNet()
                self.fpn = TFPN()
                self.proj = nn.Sequential(
                    nn.Conv2d(BASE * 16, D, 1, stride=2))
                n = (IMG // 16) ** 2
                self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
                self.pos_embed = nn.Parameter(torch.randn(1, n + 1, D) * 0.02)
                self.blocks = nn.ModuleList([TBlock()])
                self.norm = nn.LayerNorm(D, eps=1e-6)

            def forward(self, x):
                x = self.proj(self.fpn(self.backbone(x)))
                x = x.flatten(2).transpose(1, 2)
                B = x.shape[0]
                x = torch.cat([self.cls_token.expand(B, -1, -1), x], 1)
                x = x + self.pos_embed
                for b in self.blocks:
                    x = b(x)
                return self.norm(x)

        class TE(nn.Module):
            def __init__(self):
                super().__init__()

                class Emb(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.word_embeddings = nn.Embedding(VOCAB, D)
                        self.position_embeddings = nn.Embedding(TLEN, D)
                        self.token_type_embeddings = nn.Embedding(2, D)
                        self.LayerNorm = nn.LayerNorm(D, eps=1e-12)

                    def forward(self, ids):
                        T = ids.shape[1]
                        e = self.word_embeddings(ids) \
                            + self.position_embeddings(
                                torch.arange(T))[None] \
                            + self.token_type_embeddings(
                                torch.zeros_like(ids))
                        return self.LayerNorm(e)

                self.text_embeddings = Emb()
                self.blocks = nn.ModuleList([TBlock()])
                self.norm = nn.LayerNorm(D, eps=1e-6)

            def forward(self, ids, mask):
                x = self.text_embeddings(ids)
                for b in self.blocks:
                    x = b(x, mask)
                return self.norm(x)

        class CO(nn.Module):
            def __init__(self):
                super().__init__()
                self.blocks = nn.ModuleList([TCrossBlock()])
                self.norm = nn.LayerNorm(D, eps=1e-6)

            def forward(self, x, y, mask):
                for b in self.blocks:
                    x = b(x, y, mask)
                return self.norm(x)

        self.image_encoder = IE()
        self.text_encoder = TE()
        self.co_encoder = CO()
        self.token_type_embeddings = nn.Embedding(2, D)
        self.image_proj = nn.Linear(D, D)
        self.text_proj = nn.Linear(D, D)
        self.image_proj_wip = nn.Linear(D, D)
        self.text_proj_wip = nn.Linear(D, D)
        self.logit_scale = nn.Parameter(torch.ones([]) * math.log(1 / 0.07))
        self.logit_scale_wip = nn.Parameter(
            torch.ones([]) * math.log(1 / 0.07))

        class MLM(nn.Module):
            def __init__(self, weight):
                super().__init__()

                class Tr(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.dense = nn.Linear(D, D)
                        self.LayerNorm = nn.LayerNorm(D, eps=1e-12)

                    def forward(self, x):
                        return self.LayerNorm(F.gelu(self.dense(x)))

                self.transform = Tr()
                self.decoder = nn.Linear(D, VOCAB, bias=False)
                self.decoder.weight = weight
                self.bias = nn.Parameter(torch.zeros(VOCAB))

            def forward(self, x):
                return self.decoder(self.transform(x)) + self.bias

        self.mlm_score = MLM(
            self.text_encoder.text_embeddings.word_embeddings.weight)

    def forward(self, images, ids_mlm, masks):
        text = self.text_encoder(ids_mlm, masks)
        image = self.image_encoder(images)
        text = text + self.token_type_embeddings(
            torch.zeros_like(masks.long()))
        image = image + self.token_type_embeddings(
            torch.ones(image.shape[:2], dtype=torch.long))
        co = self.co_encoder(text, image, masks)
        return {
            "mlm_logits": self.mlm_score(co),
            "text_feats": F.normalize(self.text_proj(text[:, 0]), dim=-1),
            "image_feats": F.normalize(self.image_proj(image[:, 0]), dim=-1),
        }


@pytest.mark.model
class TestVLPTImport:
    def test_full_import_parity(self):
        torch.manual_seed(0)
        tm = TVLPT().eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        cfg = VLPTConfig(embed_dim=D, vocab_size=VOCAB, max_text_len=TLEN,
                         image_size=IMG, image_depth=1, text_depth=1,
                         co_depth=1, heads=HEADS, fpn_dim=BASE * 4,
                         resnet_base=BASE, resnet_blocks=(1, 1, 1, 1),
                         false_text_length=4)
        model = VLPT(cfg, policy=FP32_POLICY)
        rng = np.random.default_rng(0)
        ids = rng.integers(4, VOCAB, (2, TLEN))
        batch = {
            "image": jnp.asarray(rng.standard_normal((2, IMG, IMG, 3)),
                                 jnp.float32),
            "text_ids": jnp.asarray(ids, jnp.int32),
            "text_ids_mlm": jnp.asarray(ids, jnp.int32),
            "text_labels_mlm": jnp.full((2, TLEN), -100, jnp.int32),
            "text_masks": jnp.ones((2, TLEN), jnp.int32),
        }
        variables = model.init(jax.random.PRNGKey(0), batch)
        variables = import_vlpt(sd, jax.tree.map(np.asarray, variables))

        with torch.no_grad():
            want = tm(torch.from_numpy(
                np.asarray(batch["image"]).transpose(0, 3, 1, 2)),
                torch.from_numpy(ids), torch.ones(2, TLEN))
        got = model.apply(variables, batch)
        np.testing.assert_allclose(np.asarray(got["mlm_logits"]),
                                   want["mlm_logits"].numpy(),
                                   rtol=5e-3, atol=5e-3)
        np.testing.assert_allclose(np.asarray(got["text_feats"]),
                                   want["text_feats"].numpy(),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got["image_feats"]),
                                   want["image_feats"].numpy(),
                                   rtol=2e-3, atol=2e-3)
