"""GeoLayoutLM backbone import parity vs torch mirrors of
bros/modeling_bros.py (BrosModel: concatenated spatial embeddings, crel
relative-bbox attention), bros/vision_model.py (ConvNeXt + FPN), and
bros/transformer_local.py (cross-modal decoder layers), scaled down.
roi_align is weight-free (exact op tested in test_roi_align.py),
so the three weight-bearing stages cover every imported tensor."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as Fn

from advancedliteratemachinery_tpu.core.precision import FP32_POLICY
from advancedliteratemachinery_tpu.engine.checkpoint import (
    import_geolayoutlm_backbone)
from advancedliteratemachinery_tpu.models.bros import BrosConfig, BrosTextEncoder
from advancedliteratemachinery_tpu.models.convnext import ConvNeXtConfig
from advancedliteratemachinery_tpu.models.geolayoutlm import (
    GeoLayoutLM, GeoLayoutLMConfig, VisionFPN, CrossModalLayer)

H = 64          # bros hidden (H//4//8 must be even, like the real config)
NH = 2          # heads
BROS = BrosConfig(vocab_size=60, hidden_size=H, num_hidden_layers=2,
                  num_attention_heads=NH, intermediate_size=64,
                  max_position_embeddings=24, coordinate_size=12, shape_size=8)
CNX = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 16, 32, 64))
CFG = GeoLayoutLMConfig(bros=BROS, convnext=CNX, n_classes=5, vis_channels=16)


def sinusoid_1d_t(pos, demb):
    inv = 1.0 / (10000 ** (torch.arange(0, demb, 2).float() / demb))
    inp = pos.unsqueeze(-1) * inv
    return torch.cat([inp.sin(), inp.cos()], -1)


class TBrosEmbeddings(nn.Module):
    def __init__(self):
        super().__init__()
        c = BROS
        self.word_embeddings = nn.Embedding(c.vocab_size, H)
        self.position_embeddings = nn.Embedding(c.max_position_embeddings, H)
        self.token_type_embeddings = nn.Embedding(2, H)
        self.x_position_embeddings = nn.Embedding(
            c.max_2d_position_embeddings, c.coordinate_size)
        self.y_position_embeddings = nn.Embedding(
            c.max_2d_position_embeddings, c.coordinate_size)
        self.h_position_embeddings = nn.Embedding(
            c.max_2d_position_embeddings, c.shape_size)
        self.w_position_embeddings = nn.Embedding(
            c.max_2d_position_embeddings, c.shape_size)
        self.LayerNorm = nn.LayerNorm(H, eps=1e-12)
        self.bbox_projection = nn.Linear(H // 4, H // NH, bias=False)

    def forward(self, ids, line_bbox):
        S = ids.shape[1]
        e = (self.word_embeddings(ids)
             + self.position_embeddings(torch.arange(S)[None])
             + self.token_type_embeddings(torch.zeros_like(ids)))
        lb = line_bbox
        spatial = torch.cat([
            self.x_position_embeddings(lb[:, :, 0]),
            self.y_position_embeddings(lb[:, :, 1]),
            self.x_position_embeddings(lb[:, :, 2]),
            self.y_position_embeddings(lb[:, :, 3]),
            self.h_position_embeddings(lb[:, :, 3] - lb[:, :, 1]),
            self.w_position_embeddings(lb[:, :, 2] - lb[:, :, 0])], -1)
        return self.LayerNorm(e + spatial)

    def calc_bbox_pos_emb(self, bbox):   # bbox [B,S,8] floats
        bt = bbox.transpose(0, 1)                      # [S,B,8]
        diff = bt[None, :, :, :] - bt[:, None, :, :]   # [S,S,B,8]
        per = (H // 4) // 8
        parts = [sinusoid_1d_t(diff[..., i], per) for i in range(8)]
        return self.bbox_projection(torch.cat(parts, -1))  # [S,S,B,hd]


class TBrosLayer(nn.Module):
    def __init__(self):
        super().__init__()
        hd = H // NH
        att = nn.Module()
        att.self = nn.Module()
        att.self.query = nn.Linear(H, H)
        att.self.key = nn.Linear(H, H)
        att.self.value = nn.Linear(H, H)
        att.output = nn.Module()
        att.output.dense = nn.Linear(H, H)
        att.output.LayerNorm = nn.LayerNorm(H, eps=1e-12)
        self.attention = att
        self.intermediate = nn.Module()
        self.intermediate.dense = nn.Linear(H, 64)
        self.output = nn.Module()
        self.output.dense = nn.Linear(64, H)
        self.output.LayerNorm = nn.LayerNorm(H, eps=1e-12)
        self.hd = hd

    def forward(self, x, rel, attn_bias):
        B, S, _ = x.shape
        sf = self.attention.self
        q = sf.query(x).view(B, S, NH, self.hd).permute(0, 2, 1, 3)
        k = sf.key(x).view(B, S, NH, self.hd).permute(0, 2, 1, 3)
        v = sf.value(x).view(B, S, NH, self.hd).permute(0, 2, 1, 3)
        scores = q @ k.transpose(-1, -2)
        # crel: rel [S,S,B,hd] → [B,i,j,hd]; shared across heads
        r = rel.permute(2, 0, 1, 3)
        scores = scores + torch.einsum("bnid,bijd->bnij", q, r)
        scores = scores / (self.hd ** 0.5) + attn_bias
        a = scores.softmax(-1)
        o = (a @ v).permute(0, 2, 1, 3).reshape(B, S, H)
        x = self.attention.output.LayerNorm(x + self.attention.output.dense(o))
        h = self.output.dense(Fn.gelu(self.intermediate.dense(x)))
        return self.output.LayerNorm(x + h)


class TBrosModel(nn.Module):
    def __init__(self):
        super().__init__()
        self.embeddings = TBrosEmbeddings()
        self.encoder = nn.Module()
        self.encoder.layer = nn.ModuleList([TBrosLayer() for _ in range(2)])
        self.pooler = nn.Module()
        self.pooler.dense = nn.Linear(H, H)

    def forward(self, ids, bbox8, line_bbox, mask):
        x = self.embeddings(ids, line_bbox)
        rel = self.embeddings.calc_bbox_pos_emb(bbox8)
        bias = (1.0 - mask[:, None, None, :]) * -1e9
        for layer in self.encoder.layer:
            x = layer(x, rel, bias)
        return x


class TConvNeXtBlock(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.dwconv = nn.Conv2d(d, d, 7, padding=3, groups=d)
        self.norm = nn.LayerNorm(d, eps=1e-6)
        self.pwconv1 = nn.Linear(d, 4 * d)
        self.pwconv2 = nn.Linear(4 * d, d)
        self.gamma = nn.Parameter(torch.full((d,), 1e-6))

    def forward(self, x):  # NCHW
        h = self.dwconv(x).permute(0, 2, 3, 1)
        h = self.pwconv2(Fn.gelu(self.pwconv1(self.norm(h)))) * self.gamma
        return x + h.permute(0, 3, 1, 2)


class TVisionModel(nn.Module):
    def __init__(self, img_hw=(64, 64)):
        super().__init__()
        dims = CNX.dims
        c = CFG.vis_channels
        self.cnn = nn.Module()
        dls = [nn.Sequential(nn.Conv2d(3, dims[0], 4, 4), LN2d(dims[0]))]
        for s in range(1, 4):
            dls.append(nn.Sequential(LN2d(dims[s - 1]),
                                     nn.Conv2d(dims[s - 1], dims[s], 2, 2)))
        self.cnn.downsample_layers = nn.ModuleList(dls)
        self.cnn.stages = nn.ModuleList(
            [nn.Sequential(TConvNeXtBlock(d)) for d in dims])
        for n, d in (("in5", dims[3]), ("in4", dims[2]), ("in3", dims[1]),
                     ("in2", dims[0])):
            setattr(self, n, nn.Conv2d(d, c, 1, bias=False))
        for n in ("out5", "out4", "out3"):
            setattr(self, n, nn.Sequential(
                nn.Conv2d(c, c // 4, 3, padding=1, bias=False)))
        self.out2 = nn.Conv2d(c, c // 4, 3, padding=1, bias=False)
        self.pos_emb1 = nn.Parameter(
            torch.randn(c, img_hw[0] // 32, img_hw[1] // 32) * 0.02)
        self.aggr = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        x = x / 255.0
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        x = (x - mean) / std
        feats = []
        for s in range(4):
            x = self.cnn.downsample_layers[s](x)
            x = self.cnn.stages[s](x)
            feats.append(x)
        c2, c3, c4, c5 = feats
        in5, in4 = self.in5(c5), self.in4(c4)
        in3, in2 = self.in3(c3), self.in2(c2)
        in5 = self.aggr(in5 + self.pos_emb1[None])
        up = lambda t: Fn.interpolate(t, scale_factor=2, mode="nearest")
        out4 = up(in5) + in4
        out3 = up(out4) + in3
        out2 = up(out3) + in2
        p5 = Fn.interpolate(self.out5(in5), scale_factor=8, mode="nearest")
        p4 = Fn.interpolate(self.out4(out4), scale_factor=4, mode="nearest")
        p3 = Fn.interpolate(self.out3(out3), scale_factor=2, mode="nearest")
        p2 = self.out2(out2)
        return torch.cat((p5, p4, p3, p2), 1)


class LN2d(nn.Module):
    """channels_first LayerNorm with BERT-style keys (weight/bias)."""

    def __init__(self, d):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(d))
        self.bias = nn.Parameter(torch.zeros(d))

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + 1e-6)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class TCrossModalLayer(nn.Module):
    def __init__(self, self_attn=True):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(H, NH) if self_attn else None
        if self_attn:
            self.norm1 = nn.LayerNorm(H)
        self.multihead_attn = nn.MultiheadAttention(H, NH)
        self.linear1 = nn.Linear(H, 64)
        self.linear2 = nn.Linear(64, H)
        self.norm2 = nn.LayerNorm(H)
        self.norm3 = nn.LayerNorm(H)

    def forward(self, tgt, memory, tgt_kpm, mem_kpm):
        # [T,B,C] convention like the reference
        if self.self_attn is not None:
            t2, _ = self.self_attn(tgt, tgt, tgt, key_padding_mask=tgt_kpm)
            tgt = self.norm1(tgt + t2)
        t2, _ = self.multihead_attn(tgt, memory, memory,
                                    key_padding_mask=mem_kpm)
        tgt = self.norm2(tgt + t2)
        t2 = self.linear2(Fn.relu(self.linear1(tgt)))
        return self.norm3(tgt + t2)


class TBackbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.text_encoder = TBrosModel()
        self.visual_encoder = TVisionModel()
        self.vis_linear = nn.Linear(CFG.vis_channels, H)
        self.cross_modal_text = nn.Module()
        self.cross_modal_text.layers = nn.ModuleList([TCrossModalLayer(True)])
        self.cross_modal_visual = nn.Module()
        self.cross_modal_visual.layers = nn.ModuleList([TCrossModalLayer(True)])


class TestGeoLayoutLMImport:
    def _setup(self):
        torch.manual_seed(0)
        tm = TBackbone().eval()
        model = GeoLayoutLM(CFG, policy=FP32_POLICY)
        rng = np.random.default_rng(0)
        B, S, N = 2, 12, 3
        batch = dict(
            input_ids=jnp.asarray(rng.integers(0, 60, (B, S), np.int32)),
            image=jnp.asarray(rng.integers(0, 255, (B, 64, 64, 3))
                              .astype(np.float32)),
            bbox_4p_normalized=jnp.asarray(rng.random((B, S, 8), np.float32)),
            # [x0,y0,x1,y1] with x0<=x1, y0<=y1 (h/w lookups must be >= 0)
            bbox=jnp.asarray(np.sort(
                rng.integers(0, 500, (B, S, 2, 2), np.int32), axis=3)
                .transpose(0, 1, 3, 2).reshape(B, S, 4)),
            attention_mask=jnp.ones((B, S), np.float32),
            first_token_idxes=jnp.asarray(rng.integers(0, S, (B, N), np.int32)),
            block_mask=jnp.ones((B, N), np.float32),
        )
        variables = model.init(jax.random.PRNGKey(0), batch)
        params = import_geolayoutlm_backbone(
            {"geolayoutlm_model." + k: v for k, v in tm.state_dict().items()},
            jax.tree.map(np.asarray, dict(variables)["params"]))
        return tm, model, params, batch

    def test_text_encoder_match(self):
        tm, model, params, b = self._setup()
        enc = BrosTextEncoder(BROS, policy=FP32_POLICY)
        mine, _ = enc.apply({"params": params["text_encoder"]},
                            b["input_ids"], b["bbox_4p_normalized"], b["attention_mask"],
                            line_bbox=b["bbox"])
        with torch.no_grad():
            theirs = tm.text_encoder(
                torch.from_numpy(np.asarray(b["input_ids"]).astype(np.int64)),
                torch.from_numpy(np.asarray(b["bbox_4p_normalized"])),
                torch.from_numpy(np.asarray(b["bbox"]).astype(np.int64)),
                torch.from_numpy(np.asarray(b["attention_mask"]))).numpy()
        np.testing.assert_allclose(np.asarray(mine), theirs,
                                   rtol=2e-3, atol=2e-3)

    def test_vision_fpn_match(self):
        tm, model, params, b = self._setup()
        fpn = VisionFPN(CFG, policy=FP32_POLICY)
        mine = fpn.apply({"params": params["visual_encoder"]}, b["image"])
        with torch.no_grad():
            theirs = tm.visual_encoder(torch.from_numpy(
                np.asarray(b["image"]).transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(np.asarray(mine),
                                   theirs.transpose(0, 2, 3, 1),
                                   rtol=2e-3, atol=2e-3)

    def test_cross_modal_match(self):
        tm, model, params, b = self._setup()
        rng = np.random.default_rng(1)
        tgt = rng.standard_normal((2, 12, H)).astype(np.float32)
        mem = rng.standard_normal((2, 4, H)).astype(np.float32)
        tmask = np.ones((2, 12), np.float32)
        mmask = np.ones((2, 4), np.float32)
        mmask[1, 2:] = 0.0
        cm = CrossModalLayer(H, NH, 64, self_attn=True, policy=FP32_POLICY)
        mine = cm.apply({"params": params["cross_modal_text"]},
                        jnp.asarray(tgt), jnp.asarray(mem),
                        jnp.asarray(tmask), jnp.asarray(mmask))
        with torch.no_grad():
            layer = tm.cross_modal_text.layers[0]
            theirs = layer(torch.from_numpy(tgt).transpose(0, 1),
                           torch.from_numpy(mem).transpose(0, 1),
                           torch.from_numpy(1 - tmask).bool(),
                           torch.from_numpy(1 - mmask).bool()
                           ).transpose(0, 1).numpy()
        np.testing.assert_allclose(np.asarray(mine), theirs,
                                   rtol=2e-3, atol=2e-3)


class TVIE(nn.Module):
    """Full VIE model mirror: backbone + heads (geolayoutlm_vie.py:22)."""

    def __init__(self):
        super().__init__()
        self.geolayoutlm_model = TBackbone()
        self.bio_classifier = nn.Linear(H, 5)
        self.pair_geometric_head = nn.Module()
        self.pair_geometric_head.bilinear = nn.Module()
        self.pair_geometric_head.bilinear.weight = nn.Parameter(
            torch.randn(1, H, H) * 0.1)
        self.pair_geometric_head.bilinear.bias = nn.Parameter(torch.zeros(1))
        mp = nn.Module()
        mp.rel_layer = nn.Linear(2 * H, H)
        mp.trenc = nn.Module()
        mp.trenc.layers = nn.ModuleList(
            [nn.TransformerEncoderLayer(H, NH, H, dropout=0.0)])
        mp.trdec = nn.Module()
        mp.trdec.layers = nn.ModuleList([TCrossModalLayer(self_attn=False)])
        mp.fc = nn.Linear(H, 1)
        self.multi_pairs_geometric_head = mp


class TestGeoLayoutLMVieImport:
    def test_vie_heads_import_and_match(self):
        from advancedliteratemachinery_tpu.engine.checkpoint import (
            import_geolayoutlm_vie)
        from advancedliteratemachinery_tpu.models.geolayoutlm import (
            SelfEncoderLayer)

        torch.manual_seed(3)
        tm = TVIE().eval()
        model = GeoLayoutLM(CFG, policy=FP32_POLICY)
        rng = np.random.default_rng(0)
        B, S, N = 2, 12, 3
        batch = dict(
            input_ids=jnp.asarray(rng.integers(0, 60, (B, S), np.int32)),
            image=jnp.asarray(rng.integers(0, 255, (B, 64, 64, 3))
                              .astype(np.float32)),
            bbox_4p_normalized=jnp.asarray(rng.random((B, S, 8), np.float32)),
            bbox=jnp.asarray(np.sort(
                rng.integers(0, 500, (B, S, 2, 2), np.int32), axis=3)
                .transpose(0, 1, 3, 2).reshape(B, S, 4)),
            attention_mask=jnp.ones((B, S), np.float32),
            first_token_idxes=jnp.asarray(rng.integers(0, S, (B, N), np.int32)),
            block_mask=jnp.ones((B, N), np.float32))
        variables = model.init(jax.random.PRNGKey(0), batch)
        params = import_geolayoutlm_vie(
            tm.state_dict(), jax.tree.map(np.asarray, dict(variables)["params"]))

        # full forward runs on imported weights
        out = model.apply({"params": params}, batch)
        assert np.isfinite(np.asarray(out["logits4labeling"])).all()
        assert np.isfinite(np.asarray(out["logits4linking_list"][1])).all()

        # mp_enc parity vs the stock torch encoder layer
        x = np.random.default_rng(4).standard_normal((2, 5, H)).astype(np.float32)
        enc = SelfEncoderLayer(H, NH, H, policy=FP32_POLICY)
        mine = enc.apply({"params": params["mp_enc"]}, jnp.asarray(x),
                         jnp.ones((2, 5)))
        with torch.no_grad():
            theirs = tm.multi_pairs_geometric_head.trenc.layers[0](
                torch.from_numpy(x).transpose(0, 1)).transpose(0, 1).numpy()
        np.testing.assert_allclose(np.asarray(mine), theirs,
                                   rtol=2e-3, atol=2e-3)

        # pair bilinear parity
        m = np.random.default_rng(5).standard_normal((2, 4, H)).astype(np.float32)
        w = tm.pair_geometric_head.bilinear.weight.detach().numpy()[0]
        theirs = np.einsum("bic,cd,bjd->bij", m, w, m)
        mine = np.einsum("bic,cd,bjd->bij", m,
                         np.asarray(params["pair_bilinear"]), m)
        np.testing.assert_allclose(mine, theirs, rtol=1e-5, atol=1e-5)
